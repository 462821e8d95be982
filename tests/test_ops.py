import numpy as np
import jax.numpy as jnp
import pytest

from mrisr_tpu.ops.resize import (
    resize2d,
    interpolate_like_torch,
    pil_resize_like,
    gaussian_blur,
    pixel_shuffle,
    pixel_unshuffle,
)
from mrisr_tpu.ops.wavelets import haar_dwt_level, haar_dwt_highpass_sum
from mrisr_tpu.ops.fourier import gaussian_highpass_split


def test_bicubic_matches_torch_interpolate(rng):
    """Golden parity with torch F.interpolate bicubic align_corners=False."""
    import torch
    import torch.nn.functional as F

    x = rng.random((2, 1, 32, 32)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=(17, 23), mode="bicubic", align_corners=False)
    got = interpolate_like_torch(jnp.asarray(x), (17, 23))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-5)


def test_bicubic_upsample_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    x = rng.random((1, 1, 14, 14)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=(28, 28), mode="bicubic", align_corners=False)
    got = interpolate_like_torch(jnp.asarray(x), (28, 28))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-5)


def test_bilinear_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    x = rng.random((1, 3, 20, 20)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=(40, 40), mode="bilinear", align_corners=False)
    got = interpolate_like_torch(jnp.asarray(x), (40, 40), mode="bilinear")
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-5)


@pytest.mark.parametrize("filt,pil_name", [("lanczos", "LANCZOS"), ("bicubic", "BICUBIC")])
def test_pil_resize_parity(rng, filt, pil_name):
    """Golden parity with PIL downscale (the FastMRI degradation path)."""
    from PIL import Image

    x = (rng.random((64, 64)) * 255).astype(np.float32)
    pil = Image.fromarray(x).resize((16, 16), resample=getattr(Image, pil_name))
    ref = np.asarray(pil)
    got = np.asarray(pil_resize_like(jnp.asarray(x), (16, 16), filt=filt))
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=1e-4)


def test_gaussian_blur_matches_scipy(rng):
    from scipy.ndimage import gaussian_filter

    x = rng.random((48, 48)).astype(np.float32)
    ref = gaussian_filter(x, sigma=2.0)
    got = np.asarray(gaussian_blur(jnp.asarray(x), 2.0))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_pixel_shuffle_roundtrip_matches_torch(rng):
    import torch

    x = rng.random((2, 8, 4, 4)).astype(np.float32)
    ref = torch.nn.functional.pixel_shuffle(torch.from_numpy(x), 2).numpy()
    got = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    np.testing.assert_allclose(got, ref)
    back = np.asarray(pixel_unshuffle(jnp.asarray(got), 2))
    np.testing.assert_allclose(back, x)


def test_pixel_unshuffle_matches_torch(rng):
    import torch

    x = rng.random((1, 3, 16, 16)).astype(np.float32)
    ref = torch.nn.functional.pixel_unshuffle(torch.from_numpy(x), 8).numpy()
    got = np.asarray(pixel_unshuffle(jnp.asarray(x), 8))
    np.testing.assert_allclose(got, ref)


def test_haar_dwt_energy_preservation(rng):
    """Orthonormal transform: total energy preserved at one level."""
    x = jnp.asarray(rng.random((1, 1, 16, 16)).astype(np.float32))
    ll, (lh, hl, hh) = haar_dwt_level(x)
    e_in = float(jnp.sum(x**2))
    e_out = float(jnp.sum(ll**2) + jnp.sum(lh**2) + jnp.sum(hl**2) + jnp.sum(hh**2))
    np.testing.assert_allclose(e_in, e_out, rtol=1e-5)


def test_haar_dwt_constant_image_has_no_detail():
    x = jnp.full((1, 1, 8, 8), 3.0)
    ll, (lh, hl, hh) = haar_dwt_level(x)
    np.testing.assert_allclose(np.asarray(ll), 6.0, rtol=1e-6)  # 2x gain per level
    for band in (lh, hl, hh):
        np.testing.assert_allclose(np.asarray(band), 0.0, atol=1e-6)


def test_haar_highpass_sum_levels(rng):
    x = jnp.asarray(rng.random((2, 1, 32, 32)).astype(np.float32))
    maps = haar_dwt_highpass_sum(x, 3)
    assert [m.shape for m in maps] == [(2, 1, 16, 16), (2, 1, 8, 8), (2, 1, 4, 4)]


def test_gaussian_highpass_split_large_sigma_passes_little(rng):
    x = jnp.asarray(rng.random((1, 1, 16, 16)).astype(np.float32))
    # tiny sigma -> H ~= 1 almost everywhere -> hf ~= |x| reconstruction
    _, hf = gaussian_highpass_split(x, jnp.array([[0.01]]))
    np.testing.assert_allclose(np.asarray(hf), np.abs(np.asarray(x)), atol=5e-3)
    # huge sigma -> H ~= 0 -> hf ~= 0
    _, hf0 = gaussian_highpass_split(x, jnp.array([[1e6]]))
    assert float(jnp.max(hf0)) < 1e-3
