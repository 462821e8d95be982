"""End-to-end volume-inference throughput (the production serving path).

Builds a synthetic 128-slice NIfTI volume, runs
pipelines/volume.py::super_resolve_volume on the real pipeline (50-step
DDIM, 256^2, bf16) and reports whole-volume wall clock including host
slicing, async batch dispatch (window=4), restack and NIfTI write —
i.e. how much of bench.py's steady-state slices/sec survives the full
NIfTI -> slices -> SR -> restack -> NIfTI path.

Run: PYTHONPATH=/root/repo python tools/perf_volume.py
"""
from __future__ import annotations

import tempfile
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

RNG = np.random.default_rng(time.time_ns() % 2**31)


def _latent_pipeline(dtype):
    """SD1.5-shape latent serving pipeline (configs 2-3), random weights —
    throughput only (reference src/adapters/res_srdiff.py:36-105; same
    construction as bench.py --pipeline latent)."""
    from mrisr_tpu.diffusion.schedules import sd15_schedule
    from mrisr_tpu.models.controlnet import ControlNet
    from mrisr_tpu.models.sd_unet import SDUNet
    from mrisr_tpu.models.vae import AutoencoderKL
    from mrisr_tpu.pipelines.latent import LatentSRPipeline

    unet, cn, vae = SDUNet(), ControlNet(), AutoencoderKL()
    size = 512
    lat = jnp.zeros((1, size // 8, size // 8, 4), dtype)
    t = jnp.array([1])
    ctx = jnp.zeros((1, 77, 768), dtype)
    img3 = jnp.zeros((1, size, size, 3), dtype)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    cast = lambda tr: jax.tree_util.tree_map(lambda x: x.astype(dtype), tr)
    prompt = jnp.asarray(RNG.standard_normal((1, 77, 768)), dtype)
    return LatentSRPipeline(
        unet, cn, vae, sd15_schedule(), cast(unet.init(k1, lat, t, ctx)),
        cast(cn.init(k2, lat, t, ctx, img3)), cast(vae.init(k3, img3)), prompt,
    )


def main():
    from mrisr_tpu.data.nifti import write_nifti
    from mrisr_tpu.diffusion.schedules import resdiff_schedule
    from mrisr_tpu.models.resdiff_unet import ResDiffUNet
    from mrisr_tpu.models.simple_cnn import SimpleCNN
    from mrisr_tpu.pipelines.resdiff import ResDiffPipeline
    from mrisr_tpu.pipelines.volume import super_resolve_volume

    import os
    import sys

    print(f"backend={jax.default_backend()}", flush=True)
    dtype = jnp.bfloat16
    latent_mode = "--latent" in sys.argv
    if latent_mode:
        # Latent volume serving (VERDICT round-4 next #6): 20-step
        # ControlNet chains at the reference 512^2 condition shape; the
        # volume pads 440^2 slices to the model's 512^2 like the
        # reference SliceDataset (mri_datasets.py:162-188 pad to 512).
        pipe = _latent_pipeline(dtype)
        fast_pipes = {}
        n_slices, vol_hw, resolution, num_steps = 128, 440, 512, 20
    else:
        cnn, unet = SimpleCNN(), ResDiffUNet(image_size=256)
        lr0 = jnp.zeros((8, 256, 256, 1), dtype)
        cnn_params = cnn.init(jax.random.PRNGKey(0), lr0)
        unet_params = unet.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 256, 256, 2), dtype), jnp.array([0.5])
        )
        cast = lambda t: jax.tree_util.tree_map(lambda x: x.astype(dtype), t)
        sched = resdiff_schedule(1000)
        pipe = ResDiffPipeline(cnn, unet, sched, cast(cnn_params), cast(unet_params))
        # Fast serving profiles: same param tree, kv-pooled HF-CA (fidelity
        # pinned at the production 256^2 shape — PARITY_r07_256.json; pool 8
        # is bench.py's headline profile).
        mk_fast = lambda p: ResDiffPipeline(
            cnn, ResDiffUNet(image_size=256, ca_kv_pool=p), sched,
            pipe.cnn_params, pipe.unet_params,
        )
        fast_pipes = {"fast4": mk_fast(4), "fast8": mk_fast(8)}
        n_slices, vol_hw, resolution, num_steps = 128, 220, 256, 50

    # Mode A/B in ONE process (the relay compile cache is per-process, so
    # separate processes would pay the ~14 min compile per variant): warm
    # once, then time each dispatch mode on a FRESH random volume (the
    # relay memoizes repeated identical values).  ``*_ov`` modes overlap
    # the post-drain download of group i with chain i+1
    # (MRISR_VOLUME_OVERLAP — differs from the round-6 threaded negative,
    # which overlapped UPLOADS with the in-flight chain).
    all_modes = [("serial", {}), ("chains4", {"MRISR_VOLUME_CHAINS": "4"}),
                 ("chains8", {"MRISR_VOLUME_CHAINS": "8"}),
                 ("fast4_chains8", {"MRISR_VOLUME_CHAINS": "8"}),
                 ("fast8_chains8", {"MRISR_VOLUME_CHAINS": "8"}),
                 ("fast8_chains16", {"MRISR_VOLUME_CHAINS": "16"}),
                 ("fast8_chains8_ov",
                  {"MRISR_VOLUME_CHAINS": "8", "MRISR_VOLUME_OVERLAP": "1"}),
                 ("fast8_chains16_ov",
                  {"MRISR_VOLUME_CHAINS": "16", "MRISR_VOLUME_OVERLAP": "1"}),
                 ("chains4_ov",
                  {"MRISR_VOLUME_CHAINS": "4", "MRISR_VOLUME_OVERLAP": "1"})]
    wanted = [a for a in sys.argv[1:] if not a.startswith("--")]
    modes = [m for m in all_modes if not wanted or m[0] in wanted]
    if os.environ.get("MRISR_PERF_VOLUME_LEGACY", "0") == "1":
        # Threaded/async variants measured NET NEGATIVE through the relay
        # (PERF.md round 6); kept for A/B on direct-attached deployments.
        modes += [("threads", {"MRISR_VOLUME_THREADS": "1"}),
                  ("async4", {"MRISR_VOLUME_ASYNC_WINDOW": "4"})]
    import json

    from mrisr_tpu.pipelines import volume as volmod

    out_json = os.environ.get("MRISR_PERF_VOLUME_JSON")
    results = []
    with tempfile.TemporaryDirectory() as td:
        def run_once(tag, env, p=None):
            for k, v in env.items():
                os.environ[k] = v
            try:
                vol = (RNG.random((vol_hw, vol_hw, n_slices)) * 800).astype(np.float32)
                src = Path(td) / f"{tag}.nii"
                write_nifti(src, vol, np.eye(4))
                t0 = time.perf_counter()
                super_resolve_volume(
                    p or pipe, src, Path(td) / f"{tag}_sr.nii",
                    resolution=resolution, num_steps=num_steps,
                )
                return time.perf_counter() - t0
            finally:
                for k in env:
                    os.environ.pop(k, None)

        for name, env in modes:
            p = fast_pipes[name.split("_")[0]] if name.startswith("fast") else pipe
            # Each chain-group size compiles its own program, so every mode
            # needs its own warm pass (compile through the relay is minutes;
            # folding it into the timed run would swamp the comparison).
            run_once(f"warm_{name}", env, p)
            dt = run_once(name, env, p)
            phases = volmod.LAST_TRACE
            print(
                f"volume[{name}]: {n_slices} slices {resolution}^2, "
                f"{num_steps}-step -> "
                f"{dt:6.2f} s ({n_slices/dt:6.3f} slices/s end-to-end incl. NIfTI IO)",
                flush=True,
            )
            results.append(
                {
                    "mode": name,
                    "slices": n_slices,
                    "wall_s": round(dt, 3),
                    "slices_per_s_end_to_end": round(n_slices / dt, 3),
                    "phases_s": (
                        {k: round(v, 3) for k, v in phases.items()} if phases else None
                    ),
                }
            )
            if out_json:
                Path(out_json).write_text(
                    json.dumps(
                        {
                            "metric": (
                                f"volume end-to-end slices/s (NIfTI->slices->"
                                f"{num_steps}-step {'latent ControlNet' if latent_mode else 'DDIM'} "
                                f"{resolution}^2 bf16->restack->NIfTI, "
                                f"{vol_hw}^2x{n_slices} volume, fresh "
                                f"host-entropy data per run)"
                            ),
                            "backend": jax.default_backend(),
                            "modes": results,
                        },
                        indent=1,
                    )
                    + "\n"
                )


if __name__ == "__main__":
    main()
