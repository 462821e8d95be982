"""Full-chain throughput A/B for ResDiffUNet configuration knobs.

Bench.py pattern (PERF.md round-4 measurement rules): fresh host-random
inputs per call, R back-to-back calls, block + tiny drain at the end.
Usage: python tools/perf_chain_ab.py [knob=value ...]
Each knob=value pair builds one variant, e.g.:
    python tools/perf_chain_ab.py ca_s2d=True ca_s2d=False
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from mrisr_tpu.diffusion.schedules import resdiff_schedule
from mrisr_tpu.models.resdiff_unet import ResDiffUNet
from mrisr_tpu.models.simple_cnn import SimpleCNN
from mrisr_tpu.pipelines.resdiff import ResDiffPipeline

rng = np.random.default_rng(time.time_ns() % 2**31)
dtype = jnp.bfloat16


def build(**kw):
    cnn, unet = SimpleCNN(), ResDiffUNet(image_size=256, **kw)
    lr0 = jnp.asarray(rng.standard_normal((8, 256, 256, 1)), dtype)
    cnn_params = cnn.init(jax.random.PRNGKey(0), lr0)
    unet_params = unet.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 256, 256, 2), dtype), jnp.array([0.5])
    )
    cast = lambda t: jax.tree_util.tree_map(lambda x: x.astype(dtype), t)
    return ResDiffPipeline(cnn, unet, resdiff_schedule(1000), cast(cnn_params), cast(unet_params))


def fresh():
    return (jnp.asarray(rng.standard_normal((8, 256, 256, 1)), dtype),
            jax.random.PRNGKey(int(rng.integers(2**30))))


def measure(label, pipe, trials=2, R=6):
    lr, k = fresh()
    out = pipe.super_resolve(lr, k, num_steps=50)
    out.block_until_ready()
    np.asarray(out[0, 0, 0, 0])
    for _ in range(trials):
        ins = [fresh() for _ in range(R)]
        t0 = time.perf_counter()
        for lr, k in ins:
            out = pipe.super_resolve(lr, k, num_steps=50)
        out.block_until_ready()
        np.asarray(out[0, 0, 0, 0])
        dt = time.perf_counter() - t0
        print(f"{label:<24s} R={R}: {dt*1e3:9.1f} ms -> {8*R/dt:6.3f} slices/s "
              f"({dt/R/50*1e3:5.2f} ms/step)", flush=True)


def parse(v):
    return {"True": True, "False": False}.get(v, int(v) if v.isdigit() else v)


variants = [a.split("=") for a in sys.argv[1:]] or [["ca_s2d", "True"], ["ca_s2d", "False"]]
for knob, val in variants:
    measure(f"{knob}={val}", build(**{knob: parse(val)}))
