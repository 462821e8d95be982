"""Flash-attention kernel on REAL TPU hardware (opt-in).

The interpreter-mode tests (tests/test_flash_attention.py) pin numerics;
this one proves the Pallas kernel compiles and matches the exact chunked
implementation on the actual chip.  The suite's conftest pins pytest to the
CPU backend, so the check runs in a fresh subprocess with the TPU platform
restored.  Opt in with ``MRISR_TPU_TESTS=1`` (skipped otherwise — CI images
have no TPU).
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
from mrisr_tpu.ops.attention import chunked_attention
from mrisr_tpu.ops.flash_attention import flash_attention_tpu, flash_available

n, d = 2048, 32
assert flash_available(n, n), "flash gate must accept the bench shapes"
k = jax.random.PRNGKey(0)
q, kk, v = (jax.random.normal(jax.random.fold_in(k, i), (2, n, d), jnp.bfloat16) for i in range(3))
out_flash = np.asarray(flash_attention_tpu(q, kk, v, d ** -0.5).astype(jnp.float32))
out_exact = np.asarray(chunked_attention(q, kk, v, d ** -0.5).astype(jnp.float32))
err = np.abs(out_flash - out_exact).max()
assert err < 0.05, f"flash vs exact mismatch on TPU: {err}"

# Pallas backward kernels vs the exact chunked VJP, on chip
def loss_flash(q_, k_, v_):
    return jnp.sum(flash_attention_tpu(q_, k_, v_, d ** -0.5).astype(jnp.float32) ** 2)

def loss_exact(q_, k_, v_):
    return jnp.sum(chunked_attention(q_, k_, v_, d ** -0.5).astype(jnp.float32) ** 2)

gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, kk, v)
ge = jax.grad(loss_exact, argnums=(0, 1, 2))(q, kk, v)
for name, a, b in zip("q k v".split(), gf, ge):
    gerr = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max()
    rel = gerr / (np.abs(np.asarray(b, np.float32)).max() + 1e-6)
    assert rel < 0.05, f"d{name} mismatch on TPU: rel={rel}"
print(f"FLASH_TPU_OK err={err:.5f}")
"""


@requires_tpu
def test_flash_kernel_matches_exact_on_tpu():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # conftest pinned the pytest process to CPU
    env.pop("MRISR_TPU_TESTS", None)
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = flags.replace("--xla_force_host_platform_device_count=8", "").strip()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _PROBE], cwd=repo, env=env,
        capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "FLASH_TPU_OK" in proc.stdout
