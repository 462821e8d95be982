"""Space-to-depth level-0 stage: exactness vs the plain path.

The s2d rewrite (ops/space_to_depth.py, PERF.md round 3) must be a pure
execution-layout change: identical param trees, identical init values, and
outputs/gradients equal to the plain path up to float rounding.
"""
import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import pytest

from mrisr_tpu.ops.space_to_depth import (
    concat_s2d,
    depth_to_space,
    s2d_conv,
    s2d_conv_v2,
    s2d_downsample_conv,
    s2d_phase_shift,
    s2d_to_s2d_downsample_conv,
    space_to_depth,
    tile4,
)


def _conv(x, w, strides=(1, 1), padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, strides, padding, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


class TestOps:
    def test_roundtrip(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 12, 3))
        assert jnp.allclose(depth_to_space(space_to_depth(x)), x)

    def test_concat_preserves_standard_order(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 12, 3))
        y = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 12, 5))
        got = concat_s2d(space_to_depth(x), space_to_depth(y))
        want = space_to_depth(jnp.concatenate([x, y], axis=-1))
        assert jnp.allclose(got, want)

    def test_tile4_is_s2d_of_nearest_up2(self):
        from mrisr_tpu.models.layers import nearest_up2

        z = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 6, 3))
        assert jnp.allclose(tile4(z), space_to_depth(nearest_up2(z)))

    @pytest.mark.parametrize("ks", [1, 3, 5])
    def test_stride1_conv(self, ks):
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 12, 3))
        w = jax.random.normal(jax.random.PRNGKey(4), (ks, ks, 3, 7))
        b = jax.random.normal(jax.random.PRNGKey(5), (7,))
        want = _conv(x, w) + b
        got = depth_to_space(s2d_conv(space_to_depth(x), w, b))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_phase_shift_contains_each_pixel_once(self):
        x = jax.random.normal(jax.random.PRNGKey(9), (2, 8, 12, 3))
        z = s2d_phase_shift(space_to_depth(x))
        b, h3, w3, c4 = z.shape
        assert (h3, w3, c4) == (5, 7, 12)
        # z[i, j, (c, u, v)] = x[2i-1+u, 2j-1+v] (zero at the borders)
        zr = np.asarray(z).reshape(2, h3, w3, 3, 2, 2)
        xn = np.asarray(x)
        for i in range(h3):
            for u in (0, 1):
                p = 2 * i - 1 + u
                for j in range(w3):
                    for v in (0, 1):
                        q = 2 * j - 1 + v
                        want = (
                            xn[:, p, q]
                            if 0 <= p < 8 and 0 <= q < 12
                            else np.zeros((2, 3), np.float32)
                        )
                        np.testing.assert_allclose(zr[:, i, j, :, u, v], want)

    @pytest.mark.parametrize("cin,cout", [(3, 7), (8, 8), (5, 1)])
    def test_stride1_conv_v2(self, cin, cout):
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 12, cin))
        w = jax.random.normal(jax.random.PRNGKey(4), (3, 3, cin, cout))
        b = jax.random.normal(jax.random.PRNGKey(5), (cout,))
        want = _conv(x, w) + b
        got = depth_to_space(s2d_conv_v2(space_to_depth(x), w, b))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_stride1_conv_v2_gradients(self):
        x = jax.random.normal(jax.random.PRNGKey(6), (1, 8, 8, 3))
        w = jax.random.normal(jax.random.PRNGKey(7), (3, 3, 3, 5))

        def f_plain(w_, x_):
            return jnp.sum(_conv(x_, w_) ** 2)

        def f_v2(w_, x_):
            return jnp.sum(depth_to_space(s2d_conv_v2(space_to_depth(x_), w_)) ** 2)

        gw_p, gx_p = jax.grad(f_plain, argnums=(0, 1))(w, x)
        gw_v, gx_v = jax.grad(f_v2, argnums=(0, 1))(w, x)
        np.testing.assert_allclose(gw_v, gw_p, atol=1e-4)
        np.testing.assert_allclose(gx_v, gx_p, atol=1e-4)

    def test_downsample_conv_exits_to_normal_space(self):
        x = jax.random.normal(jax.random.PRNGKey(6), (2, 8, 12, 3))
        w = jax.random.normal(jax.random.PRNGKey(7), (3, 3, 3, 7))
        b = jax.random.normal(jax.random.PRNGKey(8), (7,))
        want = _conv(x, w, strides=(2, 2), padding=((1, 1), (1, 1))) + b
        got = s2d_downsample_conv(space_to_depth(x), w, b)
        assert got.shape == (2, 4, 6, 7)
        np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.fixture(scope="module")
def tiny_unet_pair():
    from mrisr_tpu.models.resdiff_unet import ResDiffUNet

    kw = dict(image_size=16, inner_channel=8, channel_mults=(1, 2),
              norm_groups=4, attn_res=())
    plain = ResDiffUNet(s2d_level0=False, **kw)
    s2d = ResDiffUNet(s2d_level0=True, **kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 2))
    gamma = jnp.array([0.3, 0.8])
    params = plain.init(jax.random.PRNGKey(1), x, gamma)
    return plain, s2d, params, x, gamma


class TestUNetParity:
    def test_param_trees_and_init_identical(self, tiny_unet_pair):
        plain, s2d, params, x, gamma = tiny_unet_pair
        p2 = s2d.init(jax.random.PRNGKey(1), x, gamma)
        k1 = {jtu.keystr(kp): v for kp, v in jtu.tree_leaves_with_path(params)}
        k2 = {jtu.keystr(kp): v for kp, v in jtu.tree_leaves_with_path(p2)}
        assert set(k1) == set(k2)
        for name in k1:
            np.testing.assert_array_equal(k1[name], k2[name], err_msg=name)

    def test_forward_matches(self, tiny_unet_pair):
        plain, s2d, params, x, gamma = tiny_unet_pair
        o1 = plain.apply(params, x, gamma)
        o2 = s2d.apply(params, x, gamma)
        np.testing.assert_allclose(o1, o2, atol=5e-5)

    def test_forward_matches_conv_v2(self, tiny_unet_pair, monkeypatch):
        import mrisr_tpu.models.layers as layers_mod

        plain, s2d, params, x, gamma = tiny_unet_pair
        o1 = plain.apply(params, x, gamma)
        monkeypatch.setattr(layers_mod, "S2D_CONV_V2", True)
        o2 = s2d.apply(params, x, gamma)
        np.testing.assert_allclose(o1, o2, atol=5e-5)

    def test_gradients_match(self, tiny_unet_pair):
        plain, s2d, params, x, gamma = tiny_unet_pair

        def loss(model):
            def f(p):
                return jnp.sum(model.apply(p, x, gamma) ** 2)

            return f

        g1 = jax.grad(loss(plain))(params)
        g2 = jax.grad(loss(s2d))(params)
        for (kp, a), (_, b) in zip(
            jtu.tree_leaves_with_path(g1), jtu.tree_leaves_with_path(g2)
        ):
            np.testing.assert_allclose(
                a, b, atol=1e-3, rtol=1e-3, err_msg=jtu.keystr(kp)
            )

    def test_io_s2d_eps_matches_plain(self, tiny_unet_pair):
        """The sampler fast path (s2d I/O, s2d static) is the same function."""
        plain, s2d, params, x, gamma = tiny_unet_pair
        cnn_sr, x_t = x[..., 0:1], x[..., 1:2]
        (x_lf, x_hf), dwt = plain.apply(params, cnn_sr, method="compute_static")

        ref = plain.apply(params, x, gamma, static=((x_lf, x_hf), dwt))
        inp = concat_s2d(space_to_depth(cnn_sr), space_to_depth(x_t))
        got = s2d.apply(
            params, inp, gamma,
            static=((space_to_depth(x_lf), space_to_depth(x_hf)), dwt),
            io_s2d=True,
        )
        np.testing.assert_allclose(depth_to_space(got), ref, atol=5e-5)

    def test_pipeline_uses_s2d_chain(self, tiny_unet_pair):
        """super_resolve runs end-to-end through the io_s2d fast path."""
        from mrisr_tpu.diffusion.schedules import resdiff_schedule
        from mrisr_tpu.models.simple_cnn import SimpleCNN
        from mrisr_tpu.pipelines.resdiff import ResDiffPipeline

        plain, s2d, params, x, gamma = tiny_unet_pair
        cnn = SimpleCNN()
        lr = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 1))
        cnn_params = cnn.init(jax.random.PRNGKey(4), lr)
        pipe = ResDiffPipeline(cnn, s2d, resdiff_schedule(64), cnn_params, params)
        out = pipe.super_resolve(lr, jax.random.PRNGKey(5), num_steps=4)
        assert out.shape == (1, 16, 16, 1)
        assert np.isfinite(np.asarray(out)).all()

    def test_odd_size_falls_back_to_plain(self):
        from mrisr_tpu.models.resdiff_unet import ResDiffUNet

        m = ResDiffUNet(image_size=18, inner_channel=8, channel_mults=(1, 2),
                        norm_groups=4, attn_res=(), s2d_level0=True)
        # 18 is even but 18//2=9 is odd only at deeper levels (not s2d'd);
        # a genuinely odd input must not crash:
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 15, 15, 2))
        m_odd = ResDiffUNet(image_size=15, inner_channel=8, channel_mults=(1,),
                            norm_groups=4, attn_res=(), s2d_level0=True)
        params = m_odd.init(jax.random.PRNGKey(1), x, jnp.array([0.5]))
        out = m_odd.apply(params, x, jnp.array([0.5]))
        assert out.shape == (1, 15, 15, 1)


class TestCrossAttentionS2d:
    """HF-guided CA with s2d projections is exact vs the plain path."""

    def test_layer_matches_plain(self):
        from mrisr_tpu.models.layers import HFGuidedCrossAttention

        ca = HFGuidedCrossAttention(groups=4)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 8))
        qm = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 1))
        params = ca.init(jax.random.PRNGKey(2), x, qm)
        p2 = ca.init(jax.random.PRNGKey(2), x, qm, s2d=True)
        # identical param tree both ways (names pinned to the plain scheme)
        k1 = {jtu.keystr(kp): v.shape for kp, v in jtu.tree_leaves_with_path(params)}
        k2 = {jtu.keystr(kp): v.shape for kp, v in jtu.tree_leaves_with_path(p2)}
        assert k1 == k2
        o_plain = ca.apply(params, x, qm)
        o_s2d = ca.apply(params, x, qm, s2d=True)
        np.testing.assert_allclose(o_plain, o_s2d, atol=5e-5)

    def test_unet_ca_s2d_matches(self, tiny_unet_pair):
        from mrisr_tpu.models.resdiff_unet import ResDiffUNet

        plain, s2d, params, x, gamma = tiny_unet_pair
        kw = dict(image_size=16, inner_channel=8, channel_mults=(1, 2),
                  norm_groups=4, attn_res=())
        on = ResDiffUNet(s2d_level0=True, ca_s2d=True, **kw)
        o_on = on.apply(params, x, gamma)
        o_off = s2d.apply(params, x, gamma)  # ca_s2d defaults False
        np.testing.assert_allclose(o_on, o_off, atol=5e-5)


class TestS2dToS2dDownsample:
    def test_matches_stride2_conv(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 12, 3))
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 7)) * 0.2
        b = jax.random.normal(jax.random.PRNGKey(2), (7,)) * 0.1
        want = _conv(x, w, strides=(2, 2), padding=((1, 1), (1, 1))) + b
        got = s2d_to_s2d_downsample_conv(space_to_depth(x), w, b)
        assert got.shape == (2, 2, 3, 28)
        np.testing.assert_allclose(depth_to_space(got), want, atol=1e-5)


class TestLevel1S2d:
    """s2d_depth=2: level 1 also runs in s2d space, exactly."""

    @pytest.fixture(scope="class")
    def deep_unet(self):
        from mrisr_tpu.models.resdiff_unet import ResDiffUNet

        kw = dict(image_size=32, inner_channel=8, channel_mults=(1, 2, 4),
                  norm_groups=4, attn_res=(8,))
        plain = ResDiffUNet(s2d_level0=False, **kw)
        d1 = ResDiffUNet(s2d_level0=True, s2d_depth=1, **kw)
        d2 = ResDiffUNet(s2d_level0=True, s2d_depth=2, **kw)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 2))
        gamma = jnp.array([0.3, 0.8])
        params = plain.init(jax.random.PRNGKey(1), x, gamma)
        return plain, d1, d2, params, x, gamma

    def test_param_tree_identical(self, deep_unet):
        plain, d1, d2, params, x, gamma = deep_unet
        p2 = d2.init(jax.random.PRNGKey(1), x, gamma)
        k1 = {jtu.keystr(kp): v for kp, v in jtu.tree_leaves_with_path(params)}
        k2 = {jtu.keystr(kp): v for kp, v in jtu.tree_leaves_with_path(p2)}
        assert set(k1) == set(k2)
        for name in k1:
            np.testing.assert_array_equal(k1[name], k2[name], err_msg=name)

    def test_forward_matches(self, deep_unet):
        plain, d1, d2, params, x, gamma = deep_unet
        o0 = plain.apply(params, x, gamma)
        o1 = d1.apply(params, x, gamma)
        o2 = d2.apply(params, x, gamma)
        np.testing.assert_allclose(o0, o1, atol=5e-5)
        np.testing.assert_allclose(o0, o2, atol=5e-5)

    def test_gradients_match(self, deep_unet):
        plain, d1, d2, params, x, gamma = deep_unet

        def loss(model):
            def f(p):
                return jnp.mean(model.apply(p, x, gamma) ** 2)
            return jax.grad(f)(params)

        g0 = loss(plain)
        g2 = loss(d2)
        for (kp, a), (_, b) in zip(
            jtu.tree_leaves_with_path(g0), jtu.tree_leaves_with_path(g2)
        ):
            np.testing.assert_allclose(a, b, atol=2e-4, err_msg=jtu.keystr(kp))

    def test_io_s2d_chain(self, deep_unet):
        """The sampler fast path works with s2d_depth=2."""
        plain, d1, d2, params, x, gamma = deep_unet
        cnn_sr, x_t = x[..., 0:1], x[..., 1:2]
        (x_lf, x_hf), dwt = plain.apply(params, cnn_sr, method="compute_static")
        ref = plain.apply(params, x, gamma, static=((x_lf, x_hf), dwt))
        inp = concat_s2d(space_to_depth(cnn_sr), space_to_depth(x_t))
        got = d2.apply(
            params, inp, gamma,
            static=((space_to_depth(x_lf), space_to_depth(x_hf)), dwt),
            io_s2d=True,
        )
        np.testing.assert_allclose(depth_to_space(got), ref, atol=5e-5)
