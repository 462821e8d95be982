"""Latent-path (configs 2-3) knock-out decomposition vs hardware floor.

VERDICT round-4 next #7: the ResDiff pipeline has a named-parts budget
(PERF.md round-5); the latent path has one fused win (+30%) and no
decomposition.  This tool times WHOLE 20-step chains (the only trustworthy
measurement through the axon relay — PERF.md "Environment caveat") for a
set of knock-out program variants at SD1.5 production shapes
(512^2 condition, 64^2 x 4 latents, 77x768 context, bs=8 bf16, reference
loop src/adapters/res_srdiff.py:63-78) and derives the budget by
differences:

  full20        the production fused chain (bench.py --pipeline latent)
  seq20         sequential ControlNet->UNet (the fused A/B)
  nocn20        UNet-only eps (ControlNet knocked out)
  nodec20       full chain, VAE decode knocked out (returns latents)
  noenc20       full chain, VAE encode knocked out (anchor latents given)
  full1         1-step chain (fixed-cost intercept)

Derived:
  per-step cost      (full20 - full1) / 19
  ControlNet share   (full20 - nocn20) / 20 per step
  VAE decode         full20 - nodec20
  VAE encode         full20 - noenc20
  fixed overhead     full1 - per_step - decode - encode (dispatch + misc)

Each variant runs R blocked repetitions on fresh host-entropy inputs
(device_put + blocked before the timed region).  Run on TPU:
    PYTHONPATH=/root/repo python tools/perf_latent_decomp.py [R]
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

RNG = np.random.default_rng(int.from_bytes(os.urandom(8), "little"))


def main():
    from mrisr_tpu.diffusion.schedules import sd15_schedule
    from mrisr_tpu.models.controlnet import ControlNet, embed_condition
    from mrisr_tpu.models.fused import fused_eps, stack_tower_params
    from mrisr_tpu.models.sd_unet import SDUNet
    from mrisr_tpu.models.vae import AutoencoderKL
    from mrisr_tpu.pipelines.sampler import res_shift_sample

    R = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    print(f"backend={jax.default_backend()} R={R}", flush=True)

    dtype = jnp.bfloat16
    size, bs = 512, 8
    f = size // 8
    unet, cn, vae = SDUNet(), ControlNet(), AutoencoderKL()
    sched = sd15_schedule()
    lat0 = jnp.zeros((1, f, f, 4), dtype)
    t0_ = jnp.array([1])
    ctx0 = jnp.zeros((1, 77, 768), dtype)
    img0 = jnp.zeros((1, size, size, 3), dtype)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    cast = lambda tr: jax.tree_util.tree_map(lambda x: x.astype(dtype), tr)
    up = cast(unet.init(k1, lat0, t0_, ctx0))
    cp = cast(cn.init(k2, lat0, t0_, ctx0, img0))
    vp = cast(vae.init(k3, img0))
    prompt = jnp.asarray(RNG.standard_normal((1, 77, 768)), dtype)
    stacked = stack_tower_params(up, cp)
    scaling = vae.scaling_factor

    def mk_chain(steps: int, mode: str):
        """One jitted program: [B,H,W,1] lr (+key) -> output per `mode`."""

        def run(lr, key):
            B = lr.shape[0]
            lr_rgb = jnp.repeat(lr, 3, axis=-1)
            ctx = jnp.broadcast_to(prompt[:1], (B,) + prompt.shape[1:])
            key, k_enc = jax.random.split(key)
            if mode == "noenc":
                # anchor latents passed in as the "lr" operand directly
                anchor = lr
                cond_image = jnp.repeat(
                    jnp.zeros((B, size, size, 1), dtype), 3, axis=-1
                )
            else:
                anchor = (
                    vae.apply(vp, lr_rgb, k_enc, method=vae.encode) * scaling
                )
                cond_image = lr_rgb

            if mode == "nocn":
                def eps_fn(x_t, t):
                    return unet.apply(up, x_t, t, ctx)
            elif mode == "seq":
                cond_emb = embed_condition(cn, cp, cond_image)

                def eps_fn(x_t, t):
                    dr, mr = cn.apply(
                        cp, x_t, t, ctx, cond_image, cond_embedding=cond_emb
                    )
                    return unet.apply(
                        up, x_t, t, ctx,
                        down_block_additional_residuals=dr,
                        mid_block_additional_residual=mr,
                    )
            else:  # full / nodec / noenc: fused production program
                cond_emb = embed_condition(cn, cp, cond_image)

                def eps_fn(x_t, t):
                    return fused_eps(
                        unet, cn, up, cp, stacked, x_t, t, ctx, cond_emb
                    )

            latents = res_shift_sample(
                sched, eps_fn, anchor, key, num_steps=steps
            )
            if mode == "nodec":
                return latents
            return vae.apply(vp, latents / scaling, method=vae.decode)

        return jax.jit(run)

    variants = [
        ("full20", mk_chain(20, "full"), "pix"),
        ("full1", mk_chain(1, "full"), "pix"),
        ("seq20", mk_chain(20, "seq"), "pix"),
        ("nocn20", mk_chain(20, "nocn"), "pix"),
        ("nodec20", mk_chain(20, "nodec"), "pix"),
        ("noenc20", mk_chain(20, "noenc"), "lat"),
    ]

    def fresh(kind):
        shape = (bs, size, size, 1) if kind == "pix" else (bs, f, f, 4)
        lr = jax.device_put(jnp.asarray(RNG.standard_normal(shape), dtype))
        k = jax.random.PRNGKey(int(RNG.integers(2**62)))
        lr.block_until_ready(); k.block_until_ready()
        return lr, k

    results = {}
    for name, fn, kind in variants:
        lr, k = fresh(kind)
        out = fn(lr, k); out.block_until_ready()  # compile
        times = []
        for _ in range(R):
            lr, k = fresh(kind)
            t1 = time.perf_counter()
            out = fn(lr, k); out.block_until_ready()
            times.append((time.perf_counter() - t1) * 1e3)
        results[name] = {
            "mean_ms": round(float(np.mean(times)), 1),
            "per_rep_ms": [round(x, 1) for x in times],
        }
        print(f"[{name}] {results[name]['mean_ms']} ms {times}", flush=True)

    m = {k: v["mean_ms"] for k, v in results.items()}
    derived = {
        "per_step_ms": round((m["full20"] - m["full1"]) / 19, 2),
        "cn_share_per_step_ms": round((m["full20"] - m["nocn20"]) / 20, 2),
        "vae_decode_ms": round(m["full20"] - m["nodec20"], 1),
        "vae_encode_ms": round(m["full20"] - m["noenc20"], 1),
        "fused_vs_seq_ms": round(m["seq20"] - m["full20"], 1),
        "slices_per_s_full20": round(bs / (m["full20"] / 1e3), 3),
    }
    print(json.dumps(derived), flush=True)
    out_json = os.environ.get("MRISR_LATENT_DECOMP_JSON")
    if out_json:
        Path(out_json).write_text(json.dumps(
            {
                "metric": "latent 20-step chain knock-out decomposition "
                          "(512^2 cond, 64^2x4 latents, bs=8 bf16, SD1.5 "
                          "shapes, fresh host-entropy inputs, blocked chains)",
                "backend": jax.default_backend(),
                "variants": results,
                "derived": derived,
            }, indent=1) + "\n")


if __name__ == "__main__":
    main()
