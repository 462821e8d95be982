"""Fused GN+SiLU kernel on REAL TPU hardware (opt-in).

Interpret-mode numerics are pinned by tests/test_groupnorm_fused.py; this
proves the Pallas kernel compiles and matches the exact composition on the
actual chip AT THE SHAPE THE SAMPLER USES IT — the c-major s2d level-0
tensor (B, 128, 128, 4C), where plain group g is a contiguous lane range
(models/layers.py::SGroupNorm fuse_silu).  Runs in a fresh subprocess with
the TPU platform restored (the suite conftest pins pytest to CPU).  Opt in
with ``MRISR_TPU_TESTS=1``.
"""
import os
import subprocess
import sys

import pytest

requires_tpu = pytest.mark.skipif(
    os.environ.get("MRISR_TPU_TESTS") != "1",
    reason="real-TPU test; set MRISR_TPU_TESTS=1 on a TPU host",
)

_PROBE = r"""
import numpy as np
import jax, jax.numpy as jnp
assert jax.default_backend() == "tpu", jax.default_backend()
from mrisr_tpu.ops.groupnorm import (
    _gn_silu_forward, _use_kernel, group_norm_silu_reference,
)

# The s2d level-0 shape of the 256^2 bench: C=32 plain -> 4C=128 lanes,
# 16 groups -> 8-lane contiguous groups.  bf16 like the serving path.
b, h, w, c, groups = 4, 128, 128, 128, 16
key = jax.random.PRNGKey(0)
x = (jax.random.normal(key, (b, h, w, c), jnp.float32) * 2 + 0.3).astype(jnp.bfloat16)
scale = jax.random.normal(jax.random.fold_in(key, 1), (c,)) * 0.2 + 1.0
bias = jax.random.normal(jax.random.fold_in(key, 2), (c,)) * 0.1
assert _use_kernel(x, groups), "VMEM gate must accept the s2d shape"
got = np.asarray(_gn_silu_forward(x, scale, bias, groups, 1e-5).astype(jnp.float32))
want = np.asarray(group_norm_silu_reference(x, scale, bias, groups, 1e-5).astype(jnp.float32))
err = np.abs(got - want).max()
# Outputs are bf16 (storage dtype): activations reach |y|~8 where one bf16
# ulp is 0.0625, so kernel-vs-XLA rounding legitimately differs by 1 ulp
# (observed 0.03125 = ulp at |y|~4 on chip, 2026-08-19).  Gate at 1 ulp of
# the observed activation range, not an absolute fp32-ish epsilon.
assert err <= 0.0625, f"fused GN+SiLU vs reference mismatch on TPU: {err}"
print("fused GN+SiLU on-chip ok, max err", err)
"""


@requires_tpu
def test_fused_gn_silu_matches_reference_on_tpu():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, "-c", _PROBE],
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stdout + out.stderr
