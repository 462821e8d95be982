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


def main():
    from mrisr_tpu.data.nifti import write_nifti
    from mrisr_tpu.diffusion.schedules import resdiff_schedule
    from mrisr_tpu.models.resdiff_unet import ResDiffUNet
    from mrisr_tpu.models.simple_cnn import SimpleCNN
    from mrisr_tpu.pipelines.resdiff import ResDiffPipeline
    from mrisr_tpu.pipelines.volume import super_resolve_volume

    print(f"backend={jax.default_backend()}", flush=True)
    dtype = jnp.bfloat16
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

    import os
    import sys

    n_slices = 128
    # Mode A/B in ONE process (the relay compile cache is per-process, so
    # separate processes would pay the ~14 min compile per variant): warm
    # once, then time each dispatch mode on a FRESH random volume (the
    # relay memoizes repeated identical values).
    all_modes = [("serial", {}), ("chains4", {"MRISR_VOLUME_CHAINS": "4"}),
                 ("chains8", {"MRISR_VOLUME_CHAINS": "8"}),
                 ("fast4_chains8", {"MRISR_VOLUME_CHAINS": "8"}),
                 ("fast8_chains8", {"MRISR_VOLUME_CHAINS": "8"}),
                 ("fast8_chains16", {"MRISR_VOLUME_CHAINS": "16"})]
    wanted = sys.argv[1:]  # e.g. perf_volume.py fast8_chains8 chains8
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
                vol = (RNG.random((220, 220, n_slices)) * 800).astype(np.float32)
                src = Path(td) / f"{tag}.nii"
                write_nifti(src, vol, np.eye(4))
                t0 = time.perf_counter()
                super_resolve_volume(
                    p or pipe, src, Path(td) / f"{tag}_sr.nii", num_steps=50
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
                f"volume[{name}]: {n_slices} slices 256^2, 50-step DDIM -> "
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
                            "metric": "volume end-to-end slices/s (NIfTI->slices->"
                            "50-step DDIM 256^2 bf16->restack->NIfTI, 220^2x128 "
                            "volume, fresh host-entropy data per run)",
                            "backend": jax.default_backend(),
                            "modes": results,
                        },
                        indent=1,
                    )
                    + "\n"
                )


if __name__ == "__main__":
    main()
