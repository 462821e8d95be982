"""Native N4-style bias correction vs synthetic multiplicative fields
(reference: SimpleITK N4 at src/datasets/mri_datasets.py:45-52)."""
import numpy as np
import pytest

from mrisr_tpu.data.bias_correction import n4_bias_correction


def _phantom(shape=(64, 64)):
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0 : shape[0], 0 : shape[1]].astype(np.float64)
    img = np.zeros(shape)
    for _ in range(8):
        cy, cx = rng.uniform(10, shape[0] - 10, 2)
        a, b = rng.uniform(3, 12, 2)
        img += rng.uniform(0.3, 1.0) * np.exp(-(((yy - cy) / a) ** 2 + ((xx - cx) / b) ** 2))
    return np.clip(img, 0, 1.5) * 500 + 100  # positive MRI-ish intensities


def _bias_field(shape=(64, 64), strength=0.6):
    yy, xx = np.mgrid[0 : shape[0], 0 : shape[1]].astype(np.float64)
    f = 1.0 + strength * (
        0.6 * np.sin(yy / shape[0] * np.pi) + 0.4 * (xx / shape[1] - 0.5)
    )
    return f / f.mean()


def test_n4_recovers_smooth_bias_field():
    img = _phantom()
    field = _bias_field()
    corrupted = img * field

    corrected, est = n4_bias_correction(corrupted, return_field=True)
    # estimated field correlates strongly with the true field
    corr = np.corrcoef(est.ravel(), field.ravel())[0, 1]
    assert corr > 0.9, f"field correlation too low: {corr:.3f}"
    # corrected image is closer to the truth than the corrupted input
    err_before = np.abs(corrupted / corrupted.mean() - img / img.mean()).mean()
    err_after = np.abs(corrected / corrected.mean() - img / img.mean()).mean()
    assert err_after < 0.5 * err_before


def test_n4_near_identity_on_unbiased_input():
    img = _phantom()
    corrected = n4_bias_correction(img)
    rel = np.abs(corrected - img) / img.mean()
    assert float(rel.mean()) < 0.05


def test_n4_3d_and_empty_mask():
    vol = np.stack([_phantom((32, 32))] * 8, axis=-1)
    out = n4_bias_correction(vol * _bias_field((32, 32))[..., None])
    assert out.shape == vol.shape and np.isfinite(out).all()
    zero = np.zeros((8, 8))
    np.testing.assert_array_equal(n4_bias_correction(zero), zero)


def test_slice_dataset_do_n4(tmp_path):
    """SliceDataset(do_n4=True) runs the native N4 before slicing
    (reference do_n4 flag at src/datasets/mri_datasets.py:192)."""
    from mrisr_tpu.data.datasets import SliceDataset
    from mrisr_tpu.data.nifti import write_nifti

    rng = np.random.default_rng(0)
    vol = (rng.random((24, 24, 120)) * 500 + 100).astype(np.float32)
    p = tmp_path / "vol.nii.gz"
    write_nifti(p, vol)
    pairs = [{"hr": str(p), "lr": str(p), "subject_id": "sub-01", "txt": "t"}]
    ds = SliceDataset(
        pairs, cache_dir=tmp_path / "c1", do_n4=True, crop_start=2, crop_end_margin=2
    )
    ds0 = SliceDataset(
        pairs, cache_dir=tmp_path / "c2", do_n4=False, crop_start=2, crop_end_margin=2
    )
    a, b = ds[0]["hr"], ds0[0]["hr"]
    assert a.shape == b.shape and np.isfinite(a).all()
    assert np.abs(a - b).max() > 0  # correction actually applied
