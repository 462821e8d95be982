"""Flash-attention kernel correctness.

On the CPU test backend the Pallas kernel runs in interpreter mode; the same
kernel compiles natively on TPU.  Equivalence is checked against the dense
reference implementation.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrisr_tpu.ops.attention import dense_attention, chunked_attention


def _pallas_interpret(q, k, v, scale, block_q, block_k):
    """Run the flash kernel in interpreter mode (CPU-safe)."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mrisr_tpu.ops.flash_attention import _flash_kernel, _pad_d

    qp, d = _pad_d(q)
    kp, _ = _pad_d(k)
    vp, _ = _pad_d(v)
    b, n, dp = qp.shape
    m = kp.shape[1]
    kv_steps = m // block_k
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_steps=kv_steps),
        out_shape=jax.ShapeDtypeStruct((b, n, dp), qp.dtype),
        grid=(b, n // block_q, kv_steps),
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_k, dp), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_k, dp), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, dp), lambda b, qi, ki: (b, qi, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, dp), jnp.float32),
        ],
        interpret=True,
    )(qp, kp, vp)
    return out[..., :d]


@pytest.mark.parametrize("n,d,bq,bk", [(256, 32, 128, 128), (512, 64, 128, 256)])
def test_flash_kernel_matches_dense(key, n, d, bq, bk):
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (2, n, d))
    k = jax.random.normal(k2, (2, n, d))
    v = jax.random.normal(k3, (2, n, d))
    scale = 1.0 / np.sqrt(d)
    ref = dense_attention(q, k, v, scale)
    got = _pallas_interpret(q, k, v, scale, bq, bk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


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
