"""Dynamic int8 conv serving profile (ops/quant.py, layers int8=True).

Reference counterpart: none — the reference serves fp16 through torch CUDA
kernels; int8 MXU execution is the TPU-native serving-precision equivalent
(SURVEY.md §2 "Native/C++/CUDA components" row).  Fidelity of the full
profile is validated through the parity harness (eval/parity.py); these
tests pin the op's numerics and the param-tree invariants.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrisr_tpu.models.layers import PlainConvInt8, SpaceConv
from mrisr_tpu.models.resdiff_unet import ResDiffUNet
from mrisr_tpu.ops.quant import int8_conv, quantize_per_out_channel, quantize_per_tensor
from mrisr_tpu.ops.space_to_depth import depth_to_space, space_to_depth


def test_quantize_roundtrip_bounds():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 8))
    q, s = quantize_per_tensor(x)
    assert q.dtype == jnp.int8
    # Max |error| is half a quantization step.
    err = np.abs(np.asarray(q, np.float32) * float(s) - np.asarray(x))
    assert err.max() <= float(s) / 2 + 1e-6

    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 16))
    qw, sw = quantize_per_out_channel(w)
    assert qw.shape == w.shape and sw.shape == (16,)
    errw = np.abs(np.asarray(qw, np.float32) * np.asarray(sw) - np.asarray(w))
    assert errw.max() <= float(sw.max()) / 2 + 1e-6


def test_int8_conv_close_to_exact():
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (2, 32, 32, 16), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 16, 32)) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(4), (32,)) * 0.05
    exact = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b
    got = int8_conv(x, w, b)
    rel = np.linalg.norm(np.asarray(got - exact)) / np.linalg.norm(np.asarray(exact))
    # Per-tensor 8-bit activations + per-channel 8-bit weights on Gaussian
    # data: relative L2 error well under 2%.
    assert rel < 2e-2, rel


def test_s2d_int8_conv_bit_matches_plain_int8():
    """s2d int8 conv == plain int8 conv EXACTLY (not just approximately).

    The s2d kernel rearrangement inserts exact zeros and reorders the same
    products; int32 accumulation is associative, the per-tensor activation
    scale sees the same value set, and the rearranged kernel's
    per-out-channel amax equals the tiled plain amax — so the integer sums
    are bit-identical and the fp32 dequant produces equal values.
    """
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (2, 16, 16, 8), jnp.float32)
    conv = PlainConvInt8(12, 3)
    params = conv.init(jax.random.PRNGKey(6), x)
    plain = conv.apply(params, x)

    sconv = SpaceConv(12, 3, int8=True)
    # SpaceConv declares the identical plain kernel shape/names.
    s2d_out = sconv.apply(params, space_to_depth(x))
    np.testing.assert_array_equal(np.asarray(depth_to_space(s2d_out)), np.asarray(plain))


def test_unet_int8_profile_same_tree_and_close_output():
    kwargs = dict(
        image_size=32, inner_channel=8, channel_mults=(1, 2), norm_groups=4,
        attn_res=(8,),
    )
    exact = ResDiffUNet(**kwargs)
    quant = ResDiffUNet(conv_int8=True, **kwargs)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 32, 32, 2), jnp.float32)
    g = jnp.array([0.5, 0.9])
    params = exact.init(jax.random.PRNGKey(8), x, g)
    params_q = quant.init(jax.random.PRNGKey(8), x, g)
    # Identical param tree: one checkpoint serves both profiles.
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_q)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params_q)):
        assert a.shape == b.shape and a.dtype == b.dtype

    y = exact.apply(params, x, g)
    yq = quant.apply(params, x, g)
    assert y.shape == yq.shape
    rel = np.linalg.norm(np.asarray(yq - y)) / max(np.linalg.norm(np.asarray(y)), 1e-9)
    # Loose end-to-end bound on an untrained net; trained-checkpoint
    # fidelity is measured through the parity harness.
    assert rel < 0.25, rel
    # And the profile must actually change something (int8 executed).
    assert rel > 0.0


def test_int8_profile_jits_inside_scan():
    """The int8 convs must be trace-safe inside the sampler's lax.scan."""
    unet = ResDiffUNet(
        image_size=16, inner_channel=8, channel_mults=(1, 2), norm_groups=4,
        attn_res=(4,), conv_int8=True,
    )
    x = jnp.zeros((1, 16, 16, 2), jnp.float32)
    g = jnp.array([0.5])
    params = unet.init(jax.random.PRNGKey(0), x, g)

    def body(carry, _):
        eps = unet.apply(params, carry, g)
        return jnp.concatenate([carry[..., :1], eps], axis=-1), None

    out, _ = jax.jit(lambda c: jax.lax.scan(body, c, None, length=3))(x)
    assert np.all(np.isfinite(np.asarray(out)))
