#!/bin/bash
# Round-3 256^2 production-shape fidelity run (VERDICT round-2 item 1).
#
# Trains the production-config ResDiff UNet (inner_channel=32, 256^2) on
# recoverable-texture phantoms THROUGH THE AXON RELAY, then evaluates the
# serving profiles (exact vs kv_pool 2/4/8 vs site-selective 4/8) over 64
# held-out images x 2 sampler seeds with paired per-image deltas + 95% CIs
# (the decision-grade statistics of VERDICT item 7).
#
# Relay hygiene (CLAUDE.md / PERF.md round-8): 250-step dispatch chunks stay
# well under the ~60-90 s relay limit at 256^2; dropped compile RPCs and
# worker crashes are survived by the retry loop + atomic checkpoint resume
# (params + EMA + full optimizer state, so the cosine LR does not restart).
cd /root/repo || exit 1
CKPT=/root/repo/ckpt_256_r3.msgpack
OUT=/root/repo/PARITY_r07_256.json
for i in $(seq 1 40); do
  RESUME=""
  [ -f "$CKPT" ] && RESUME="--resume-ckpt $CKPT"
  python -m mrisr_tpu.cli parity --skip-mnist \
    --resolution 256 --n-train 384 --batch 8 \
    --phantom-steps 2000 --resdiff-steps 60000 \
    --lr-schedule cosine --inner-channel 32 --ema-decay 0.999 \
    --eval-every 2500 --chunk-steps 250 \
    --n-test 64 --sample-seeds 2,3 --sample-steps 10,50,250 \
    --ckpt "$CKPT" $RESUME --out "$OUT" \
    && break
  echo "[wrapper] attempt $i failed rc=$?; retrying in 30s" >&2
  sleep 30
done
