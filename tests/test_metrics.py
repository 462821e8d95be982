import jax.numpy as jnp
import numpy as np
import pytest

from mrisr_tpu.eval.metrics import (
    psnr,
    ssim,
    nmse,
    hfen_laplacian,
    hfen_log,
    compute_mri_metrics,
    MRIEvaluator,
)


def test_psnr_known_value():
    target = jnp.zeros((1, 1, 16, 16))
    pred = jnp.full((1, 1, 16, 16), 0.1)
    # mse = 0.01 -> psnr = 10*log10(1/0.01) = 20
    np.testing.assert_allclose(float(psnr(pred, target)), 20.0, rtol=1e-4)


def test_ssim_identical_is_one(rng):
    x = jnp.asarray(rng.random((1, 1, 32, 32), dtype=np.float32))
    assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)


def test_ssim_constant_images_closed_form():
    c1v, c2v = 0.3, 0.7
    p = jnp.full((1, 1, 32, 32), c1v)
    t = jnp.full((1, 1, 32, 32), c2v)
    C1 = 0.01**2
    C2 = 0.03**2
    expected = ((2 * c1v * c2v + C1) * C2) / ((c1v**2 + c2v**2 + C1) * C2)
    np.testing.assert_allclose(float(ssim(p, t)), expected, rtol=1e-4)


def test_ssim_decreases_with_noise(rng):
    x = jnp.asarray(rng.random((1, 1, 64, 64), dtype=np.float32))
    y = x + jnp.asarray(rng.normal(0, 0.1, (1, 1, 64, 64)).astype(np.float32))
    s = float(ssim(jnp.clip(y, 0, 1), x))
    assert 0.0 < s < 0.95


def test_nmse_both_variants():
    t = jnp.ones((1, 1, 8, 8))
    p = jnp.full((1, 1, 8, 8), 0.9)
    np.testing.assert_allclose(float(nmse(p, t)), 0.1, rtol=1e-5)
    np.testing.assert_allclose(float(nmse(p, t, squared=True)), 0.01, rtol=1e-4)


def test_hfen_laplacian_matches_scipy(rng):
    """Golden check of the 3x3-Laplacian HFEN against scipy convolution."""
    from scipy.ndimage import convolve

    p = rng.random((24, 24)).astype(np.float32)
    t = rng.random((24, 24)).astype(np.float32)
    k = np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], np.float32)
    lp = convolve(p, k, mode="constant")
    lt = convolve(t, k, mode="constant")
    expected = np.linalg.norm(lt - lp) / np.linalg.norm(lt)
    got = float(hfen_laplacian(jnp.asarray(p)[None, None], jnp.asarray(t)[None, None]))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_hfen_log_zero_for_identical(rng):
    x = rng.random((32, 32)).astype(np.float32)
    assert hfen_log(x, x) == pytest.approx(0.0, abs=1e-7)
    y = x + rng.normal(0, 0.05, (32, 32)).astype(np.float32)
    assert hfen_log(y, x) > 0.01


def test_compute_mri_metrics_shapes(rng):
    p = jnp.asarray(rng.random((2, 1, 32, 32), dtype=np.float32))
    t = jnp.asarray(rng.random((2, 1, 32, 32), dtype=np.float32))
    m = compute_mri_metrics(p, t)
    assert len(m) == 4
    for v in m:
        assert np.isfinite(float(v))


def test_folder_evaluator_counts_correctly(tmp_path, rng):
    """The reference's count+=13 bug must NOT be replicated (eval.py:91)."""
    from PIL import Image

    gen = tmp_path / "gen"
    gt = tmp_path / "gt"
    gen.mkdir()
    gt.mkdir()
    for i in range(3):
        arr = (rng.random((16, 16)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(gt / f"{i}.png")
        Image.fromarray(arr).save(gen / f"{i}.png")
    res = MRIEvaluator(verbose=False).evaluate_folders(str(gen), str(gt))
    assert res["count"] == 3
    assert res["PSNR"] > 40  # identical images
    assert res["SSIM"] == pytest.approx(1.0, abs=1e-4)
    assert res["NMSE"] == pytest.approx(0.0, abs=1e-6)


def test_ssim_bounded_on_near_flat_images():
    """fp32 cancellation in the one-pass variance form produced SSIM > 1 on
    near-flat images (round-4 parity run); the mean-shifted computation must
    stay <= 1 + tiny eps."""
    import jax.numpy as jnp

    from mrisr_tpu.eval.metrics import ssim

    rng = np.random.default_rng(1)
    worst = 0.0
    for trial in range(20):
        img = np.full((128, 128), rng.uniform(0, 1), np.float32)
        if trial % 3 == 0:
            img[:, :64] += rng.uniform(-0.2, 0.2)
        img = np.clip(img, 0, 1)
        scale = 10 ** rng.uniform(-4, -2)
        pred = np.clip(img * (1 + rng.normal(0, scale, img.shape)), 0, 1).astype(np.float32)
        v = float(ssim(jnp.asarray(pred)[None, None], jnp.asarray(img)[None, None]))
        worst = max(worst, v)
    assert worst <= 1.0 + 1e-5, worst
