"""Flash-attention kernel correctness (forward + Pallas backward).

On the CPU test backend the Pallas kernels run in interpreter mode; the
same kernels compile natively on TPU (tests/test_flash_tpu.py).
Equivalence is checked against the dense reference implementation.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrisr_tpu.ops.attention import dense_attention, chunked_attention
from mrisr_tpu.ops.flash_attention import (
    _flash_backward,
    _flash_fwd_impl,
)


@pytest.mark.parametrize("n,d,bq,bk", [(256, 32, 128, 128), (512, 64, 128, 256)])
def test_flash_kernel_matches_dense(key, n, d, bq, bk):
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (2, n, d))
    k = jax.random.normal(k2, (2, n, d))
    v = jax.random.normal(k3, (2, n, d))
    scale = 1.0 / np.sqrt(d)
    ref = dense_attention(q, k, v, scale)
    got, lse = _flash_fwd_impl(q, k, v, scale, bq, bk, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
    # logsumexp output matches the dense computation
    logits = jnp.einsum("bnd,bmd->bnm", q, k) * scale
    want_lse = jax.nn.logsumexp(logits, axis=-1)
    np.testing.assert_allclose(np.asarray(lse[:, 0]), np.asarray(want_lse), atol=2e-5)


@pytest.mark.parametrize("n,d,block", [(256, 32, 128), (512, 16, 256)])
def test_flash_backward_matches_dense_vjp(key, n, d, block):
    """The Pallas dq/dkv kernels vs jax.vjp through dense attention."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    q = jax.random.normal(k1, (2, n, d))
    k = jax.random.normal(k2, (2, n, d))
    v = jax.random.normal(k3, (2, n, d))
    g = jax.random.normal(k4, (2, n, d))
    scale = 1.0 / np.sqrt(d)

    ref, vjp = jax.vjp(lambda q_, k_, v_: dense_attention(q_, k_, v_, scale), q, k, v)
    dq_ref, dk_ref, dv_ref = vjp(g)

    out, lse = _flash_fwd_impl(q, k, v, scale, block, block, interpret=True)
    dq, dk, dv = _flash_backward(q, k, v, out, lse, g, scale, block, interpret=True)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref), atol=5e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref), atol=5e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), atol=5e-4)


def test_chunked_matches_dense(key):
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (1, 1024, 16))
    k = jax.random.normal(k2, (1, 1024, 16))
    v = jax.random.normal(k3, (1, 1024, 16))
    ref = dense_attention(q, k, v, 0.25)
    got = chunked_attention(q, k, v, 0.25, chunk=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_chunked_gradients_match_dense(key):
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (1, 512, 8))
    k = jax.random.normal(k2, (1, 512, 8))
    v = jax.random.normal(k3, (1, 512, 8))

    def loss_dense(q_):
        return jnp.sum(dense_attention(q_, k, v, 0.35) ** 2)

    def loss_chunked(q_):
        return jnp.sum(chunked_attention(q_, k, v, 0.35, chunk=128) ** 2)

    gd = jax.grad(loss_dense)(q)
    gc = jax.grad(loss_chunked)(q)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gd), atol=3e-4)


def test_flash_available_gate_matches_kernel_clamping(monkeypatch):
    """The dispatch gate must reject shapes the clamped blocks cannot tile
    (a non-divisible KV length would silently truncate the KV loop)."""
    import mrisr_tpu.ops.flash_attention as fa

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(fa, "DEFAULT_BLOCK_Q", 2048)
    monkeypatch.setattr(fa, "DEFAULT_BLOCK_K", 1024)
    assert fa.flash_available(16384, 16384)
    assert fa.flash_available(4096, 4096)
    # n=1536 clamps block_q to 1536 (divides), but m=1536 % 1024 != 0:
    # the clamped KV block cannot tile the keys -> must be rejected
    assert not fa.flash_available(1536, 1536)


def test_effective_blocks_fp32_vmem_clamp():
    """fp32 inputs must halve block_q to stay inside the 16MB scoped VMEM
    (score + fp32 probability tiles; observed compile OOM on v5e otherwise)."""
    from mrisr_tpu.ops.flash_attention import _effective_blocks

    # bf16: defaults pass through
    assert _effective_blocks(16384, 16384, 2, 2048, 1024) == (2048, 1024)
    # fp32: block_q halved
    assert _effective_blocks(16384, 16384, 4, 2048, 1024) == (1024, 1024)
    # clamping to short sequences still applies
    assert _effective_blocks(512, 512, 4, 2048, 1024) == (512, 512)
    # divisibility preserved (n % 2048 == 0 -> n % 1024 == 0)
    assert 16384 % _effective_blocks(16384, 16384, 4, 2048, 1024)[0] == 0
