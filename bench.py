"""Headline benchmark: ResDiff SR throughput, 50-step DDIM chain at 256x256.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline: BASELINE.json target of 20 slices/sec/chip (the reference itself
publishes no throughput numbers — SURVEY.md §6).

The whole two-stage pipeline (SimpleCNN + ResDiff UNet x 50 steps) runs as
one jitted lax.scan program in bfloat16 on the available accelerator.

The DEFAULT configuration is the production serving profile: kv-pooled
HF-CA (``--fast 8``) with 8 chains per dispatch (``--chains 8`` — the
volume-serving dispatch pattern; a 128-slice volume is 16 bs=8 chains).
This is the configuration that meets BASELINE.json's combined target
(>20 slices/s/chip AND PSNR within 0.1 dB): the kv-pooled profile is
measured fidelity-equivalent to exact reference semantics AT THE
PRODUCTION 256^2 SHAPE — where BOTH CA sites (incl. the dominant
16384-token res-128 site) pool — on a 60k-step trained checkpoint over
n=128 paired samples (64 held-out images x 2 sampler seeds):
kv_pool=8 paired PSNR delta +0.056 dB mean, 95% CI (+0.046, +0.067),
``within_0p1db: true`` (PARITY_r07_256.json ``profiles_50step``; the
128^2 evidence trail is PARITY_r05/r06_128.json).  'fast' approximates
only the attention KV spatial resolution, never the trained weights or
the sampler math.  Exact reference semantics remain the LIBRARY default
(``ResDiffUNet(ca_kv_pool=0)``) and are benchable with ``--fast 0``;
they saturate at ~11.0-11.1 slices/s/chip (BENCH_SWEEP_r08.jsonl, the
measured sum-of-named-parts asymptote — PERF.md round-5/8).

Measurement rules (PERF.md "Environment caveat"): the axon relay memoizes
identical (program, input-values) executions ACROSS sessions, so every
input here is host-entropy-seeded (``os.urandom``) and fresh per
repetition — no value the relay can ever have seen before — and device_put
+ blocked before timing so uploads don't count.  The headline is the mean
of R blocked chain wall-times (the relay does not pipeline un-drained
async dispatches, so blocked chains are both honest and fastest); the
per-rep list and stdev ship in the JSON as evidence.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--repeats", type=int, default=6)
    ap.add_argument("--cpu-smoke", action="store_true", help="tiny CPU smoke run")
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    ap.add_argument("--profile", default=None, help="write a jax.profiler trace here")
    ap.add_argument(
        "--fast", type=int, default=8,
        help="serving profile: K/V pool factor at the big HF-CA sites "
        "(default 8 = the fidelity-proven serving profile, the headline; "
        "0 = exact reference semantics, the library default)",
    )
    ap.add_argument(
        "--fast-min-tokens", type=int, default=4096,
        help="minimum CA-site token count (res^2) for K/V pooling; 8192 = "
        "the SITE-SELECTIVE middle profile (only the dominant 16384-token "
        "res-128 site pools, the 4096-token site stays exact)",
    )
    ap.add_argument(
        "--int8", action="store_true",
        help="EXPERIMENTAL (measured NET NEGATIVE, PERF.md round-9: "
        "19.6-19.8 vs 20.3-20.6 slices/s with --fast 8, and no fidelity "
        "leg): dynamic int8 ResnetBlock 3x3 convs (ops/quant.py). Kept "
        "for future shapes; NOT a serving-profile peer of --fast",
    )
    ap.add_argument(
        "--chains", type=int, default=8,
        help="chains per dispatch: G>1 scans G sequential bs-sized chains "
        "inside ONE jitted program (the volume-serving dispatch pattern), "
        "amortizing per-dispatch host/RPC overhead G-fold",
    )
    ap.add_argument(
        "--no-precompute-cond", action="store_true",
        help="latent pipeline A/B: embed the ControlNet condition image "
        "INSIDE every scan step instead of once per chain (PERF.md "
        "round-13 hoist; default = hoisted)",
    )
    fuse_group = ap.add_mutually_exclusive_group()
    fuse_group.add_argument(
        "--fused", action="store_true",
        help="latent pipeline: force the fused (vmapped stacked-weight) "
        "UNet+ControlNet encoder program — already the default when the "
        "configs match; measured +30%% (PERF.md round-13)",
    )
    fuse_group.add_argument(
        "--no-fused", action="store_true",
        help="latent pipeline A/B: force the sequential ControlNet->UNet "
        "program (the pre-round-13 baseline)",
    )
    ap.add_argument(
        "--pipeline", default="resdiff", choices=["resdiff", "latent"],
        help="'resdiff' = the flagship headline; 'latent' = the 20-step "
        "ControlNet+SDUNet+VAE chain (BASELINE configs 2-3, reference "
        "src/adapters/res_srdiff.py:36-105) at SD1.5 production shapes "
        "with random weights — throughput evidence for the latent path",
    )
    args = ap.parse_args()

    import jax

    if args.cpu_smoke:
        jax.config.update("jax_platforms", "cpu")
        args.batch, args.size, args.steps, args.repeats = 1, 64, 4, 1
        args.chains = 1

    if args.pipeline == "latent":
        return bench_latent(args)

    import jax.numpy as jnp

    from mrisr_tpu.diffusion.schedules import resdiff_schedule
    from mrisr_tpu.models.resdiff_unet import ResDiffUNet
    from mrisr_tpu.models.simple_cnn import SimpleCNN
    from mrisr_tpu.pipelines.resdiff import ResDiffPipeline

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rng = np.random.default_rng(int.from_bytes(os.urandom(8), "little"))
    key = jax.random.PRNGKey(0)

    cnn = SimpleCNN()
    unet = ResDiffUNet(
        image_size=args.size, ca_kv_pool=args.fast, conv_int8=args.int8,
        ca_kv_pool_min_tokens=args.fast_min_tokens,
    )
    sched = resdiff_schedule(1000)

    shape = (args.batch, args.size, args.size, 1)
    cnn_params = cnn.init(key, jnp.zeros(shape, dtype))
    unet_params = unet.init(
        jax.random.PRNGKey(1), jnp.zeros((1, args.size, args.size, 2), dtype), jnp.array([0.5])
    )
    cast = lambda t: jax.tree_util.tree_map(lambda x: x.astype(dtype), t)
    pipe = ResDiffPipeline(cnn, unet, sched, cast(cnn_params), cast(unet_params))

    G = max(args.chains, 1)

    def fresh():
        """Host-entropy LR input + PRNG key(s) the relay has never seen.

        Inputs are device_put and BLOCKED before use, so timed regions
        measure chain execution, not host->device upload through the
        relay tunnel."""
        if G > 1:
            lr = jax.device_put(jnp.asarray(rng.standard_normal((G,) + shape), dtype))
            k = jax.vmap(jax.random.PRNGKey)(rng.integers(2**62, size=G))
        else:
            lr = jax.device_put(jnp.asarray(rng.standard_normal(shape), dtype))
            k = jax.random.PRNGKey(int(rng.integers(2**62)))
        lr.block_until_ready()
        k.block_until_ready()
        return lr, k

    def run(lr, k):
        if G > 1:
            return pipe.super_resolve_many(
                pipe.cnn_params, pipe.unet_params, lr, k, num_steps=args.steps
            )
        return pipe.super_resolve(lr, k, num_steps=args.steps)

    # Warmup / compile
    lr, k = fresh()
    out = run(lr, k)
    out.block_until_ready()

    if args.profile:
        from mrisr_tpu.utils.profiling import trace

        lr, k = fresh()
        with trace(args.profile):
            out = run(lr, k)
            out.block_until_ready()

    # Headline: blocked per-repetition chains over fresh pre-staged inputs.
    # (An async-dispatch aggregate was measured 3-4x SLOWER through the
    # relay than blocked calls — the relay does not pipeline un-drained
    # dispatches — so blocked chains are both the honest and the faster
    # measurement; round-4's async-aggregate "validation" was flattered by
    # relay memoization of its session-invariant inputs.)
    per_rep_ms = []
    for lr, k in (fresh() for _ in range(args.repeats)):
        t1 = time.perf_counter()
        out = run(lr, k)
        out.block_until_ready()
        per_rep_ms.append((time.perf_counter() - t1) * 1e3)

    n_chips = jax.local_device_count()
    elapsed = sum(per_rep_ms) / 1e3
    slices_per_sec_per_chip = args.batch * G * args.repeats / elapsed / n_chips
    print(
        json.dumps(
            {
                "metric": (
                    f"ResDiff SR slices/sec/chip ({args.steps}-step DDIM "
                    f"{args.size}x{args.size}, bs={args.batch}, {args.dtype}"
                    + (f", fast kv_pool={args.fast}" if args.fast > 1 else "")
                    + (
                        f", site-selective min_tokens={args.fast_min_tokens}"
                        if args.fast > 1 and args.fast_min_tokens != 4096
                        else ""
                    )
                    + (", int8 convs" if args.int8 else "")
                    + (f", {G} chains/dispatch" if G > 1 else "")
                    + ")"
                ),
                "value": round(float(slices_per_sec_per_chip), 3),
                "unit": "slices/sec/chip",
                "vs_baseline": round(float(slices_per_sec_per_chip) / 20.0, 3),
                "per_rep_blocked_ms": [round(t, 1) for t in per_rep_ms],
                "per_rep_stdev_ms": round(float(np.std(per_rep_ms)), 2),
                # Cross-references (pointers, not measurements): the headline
                # serving profile's fidelity equivalence vs exact reference
                # semantics is pinned at the production 256^2 shape on a
                # trained checkpoint with paired per-image deltas + 95% CI
                # (kv_pool=8: +0.056 dB mean, CI upper +0.067 < 0.1);
                # exact semantics (--fast 0, the library default) saturate
                # at ~11.0-11.1 slices/s/chip.
                "fidelity_evidence": (
                    "PARITY_r07_256.json profiles_50step (256^2, n=128 paired,"
                    " kv_pool_8 dPSNR +0.056 dB, CI95 (+0.046,+0.067),"
                    " within_0p1db=true; trail: PARITY_r05/r06_128.json)"
                    if args.fast > 1
                    else None
                ),
                "exact_profile_see": (
                    "BENCH_SWEEP_r08.jsonl (~11.0-11.1 slices/s/chip)"
                    if args.fast > 1 and not args.cpu_smoke
                    else None
                ),
            }
        )
    )


def bench_latent(args):
    """Latent-path throughput (VERDICT round-2 item 5): the full 20-step
    ``LatentSRPipeline.super_resolve`` — VAE encode + per-step
    ControlNet->SDUNet eps + Res-SRDiff reverse anchoring + VAE decode —
    as ONE jitted program at the reference shapes (512^2 condition image,
    64^2x4 latents, 77x768 prompt context; src/adapters/res_srdiff.py:36-105).
    Weights are random (no SD1.5 checkpoint exists in the zero-egress
    image): throughput is weight-value-independent, fidelity is NOT claimed
    here.  Same measurement rules as the headline (host-entropy inputs,
    device_put + blocked before timing, blocked per-rep chains)."""
    import jax
    import jax.numpy as jnp

    from mrisr_tpu.diffusion.schedules import sd15_schedule
    from mrisr_tpu.models.controlnet import ControlNet
    from mrisr_tpu.models.sd_unet import SDUNet
    from mrisr_tpu.models.vae import AutoencoderKL
    from mrisr_tpu.pipelines.latent import LatentSRPipeline

    if args.cpu_smoke:
        size, bs, steps, repeats = 64, 1, 2, 1
        unet = SDUNet(block_out_channels=(8, 16, 16, 16), heads=2, context_dim=16)
        cn = ControlNet(block_out_channels=(8, 16, 16, 16), heads=2, context_dim=16)
        vae = AutoencoderKL(block_out_channels=(8, 8, 16, 16))
        ctx_shape = (1, 7, 16)
    else:
        # Reference shapes: 512^2 pixel condition -> 64^2 latents, SD1.5
        # widths, CLIP-ViT-L 77x768 prompt embedding, 20 PEFT steps.
        size, bs, steps, repeats = 512, args.batch, 20, args.repeats
        unet = SDUNet()
        cn = ControlNet()
        vae = AutoencoderKL()
        ctx_shape = (1, 77, 768)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rng = np.random.default_rng(int.from_bytes(os.urandom(8), "little"))

    f = size // 8
    lat = jnp.zeros((1, f, f, 4), dtype)
    t = jnp.array([1])
    ctx = jnp.zeros(ctx_shape, dtype)
    img3 = jnp.zeros((1, size, size, 3), dtype)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    cast = lambda tr: jax.tree_util.tree_map(lambda x: x.astype(dtype), tr)
    unet_params = cast(unet.init(k1, lat, t, ctx))
    cn_params = cast(cn.init(k2, lat, t, ctx, img3))
    vae_params = cast(vae.init(k3, img3))
    prompt = jnp.asarray(rng.standard_normal(ctx_shape), dtype)
    sched = sd15_schedule()
    fused = True if args.fused else (False if args.no_fused else None)
    pipe = LatentSRPipeline(
        unet, cn, vae, sched, unet_params, cn_params, vae_params, prompt,
        precompute_cond=not args.no_precompute_cond,
        fused_towers=fused,
    )
    if args.no_precompute_cond and pipe.fused_towers:
        import sys

        print(
            "# note: fused towers always hoist the condition embedding; "
            "add --no-fused to actually measure the per-step embedding",
            file=sys.stderr,
        )

    def fresh():
        lr = jax.device_put(
            jnp.asarray(rng.standard_normal((bs, size, size, 1)), dtype)
        )
        k = jax.random.PRNGKey(int(rng.integers(2**62)))
        lr.block_until_ready()
        k.block_until_ready()
        return lr, k

    lr, k = fresh()
    out = pipe.super_resolve(lr, k, num_inference_steps=steps)
    out.block_until_ready()

    per_rep_ms = []
    for lr, k in (fresh() for _ in range(repeats)):
        t1 = time.perf_counter()
        out = pipe.super_resolve(lr, k, num_inference_steps=steps)
        out.block_until_ready()
        per_rep_ms.append((time.perf_counter() - t1) * 1e3)

    n_chips = jax.local_device_count()
    elapsed = sum(per_rep_ms) / 1e3
    sps = bs * repeats / elapsed / n_chips
    print(
        json.dumps(
            {
                "metric": (
                    f"Latent SR slices/sec/chip ({steps}-step ControlNet+"
                    f"SDUNet+VAE, {size}x{size} cond, {f}x{f} latents, "
                    f"bs={bs}, {args.dtype})"
                ),
                "value": round(float(sps), 3),
                "unit": "slices/sec/chip",
                # BASELINE.json configs 2-3 publish no throughput number;
                # the 20-slices/s target applies to the ResDiff headline.
                "vs_baseline": None,
                "per_rep_blocked_ms": [round(x, 1) for x in per_rep_ms],
                "per_rep_stdev_ms": round(float(np.std(per_rep_ms)), 2),
                "weights": "random (no SD1.5 checkpoint in image; "
                           "throughput-only evidence)",
                # Label derives from the PIPELINE's actual state, not the
                # flag: with fused towers on, the condition embedding is
                # always hoisted regardless of --no-precompute-cond
                # (pipelines/latent.py:162) — ADVICE round-4 #2.
                "cond_embedding": (
                    "hoisted once/chain"
                    if (pipe.precompute_cond or pipe.fused_towers)
                    else "per-step (A/B)"
                ),
                "towers": (
                    "fused (vmapped stacked-weight encoder)" if pipe.fused_towers
                    else "sequential ControlNet->UNet"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
