import json

import numpy as np
import pytest

from mrisr_tpu.data.nifti import read_nifti, write_nifti, to_ras
from mrisr_tpu.data.dicom import read_dicom, write_dicom_minimal
from mrisr_tpu.data.datasets import (
    FastMRISliceDataset,
    MNISTSRDataset,
    SliceDataset,
    SlicedPairDataset,
    build_patient_index,
    patient_split,
    random_split_lengths,
    synthetic_digits,
)
from mrisr_tpu.data.loader import Loader
from mrisr_tpu.data.export import export_png_dataset, normalize_to_uint8
from mrisr_tpu.data.slices import (
    pad_or_center_crop,
    crop_slab,
    clip_to_unit_interval,
    scale_intensity_range,
    volume_to_slices,
)


# ------------------------- NIfTI -------------------------

def test_nifti_roundtrip(tmp_path, rng):
    vol = rng.random((8, 10, 12)).astype(np.float32)
    aff = np.diag([2.0, 2.0, 3.0, 1.0])
    p = tmp_path / "vol.nii.gz"
    write_nifti(p, vol, aff)
    img = read_nifti(p)
    np.testing.assert_allclose(img.data, vol, rtol=1e-6)
    np.testing.assert_allclose(img.affine, aff, rtol=1e-6)


def test_nifti_ras_reorientation(tmp_path, rng):
    """A volume written in LPS must flip to RAS with matching affine."""
    vol = rng.random((6, 7, 8)).astype(np.float32)
    lps = np.diag([-1.0, -1.0, 1.0, 1.0])  # x: L, y: P, z: S
    p = tmp_path / "lps.nii"
    write_nifti(p, vol, lps)
    img = to_ras(read_nifti(p))
    # data flipped on first two axes
    np.testing.assert_allclose(img.data, vol[::-1, ::-1, :], rtol=1e-6)
    # resulting affine must be RAS+ (positive diagonal)
    assert np.all(np.diag(img.affine)[:3] > 0)


def test_nifti_scaling_applied(tmp_path):
    import struct

    vol = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
    p = tmp_path / "scaled.nii"
    write_nifti(p, vol)
    raw = bytearray(p.read_bytes())
    struct.pack_into("<2f", raw, 112, 2.0, 1.0)  # scl_slope=2, inter=1
    p.write_bytes(bytes(raw))
    img = read_nifti(p)
    np.testing.assert_allclose(img.data, vol.astype(np.float32) * 2 + 1)


# ------------------------- DICOM -------------------------

def test_dicom_roundtrip(tmp_path, rng):
    px = (rng.random((16, 20)) * 1000).astype(np.uint16)
    p = tmp_path / "slice.dcm"
    write_dicom_minimal(p, px, patient_id="p01", field_strength="3.0", series_desc="AX T2", instance_number=5)
    d = read_dicom(p)
    np.testing.assert_allclose(d.pixel_array, px.astype(np.float32))
    from mrisr_tpu.data.dicom import TAG_PATIENT_ID, TAG_SERIES_DESC, TAG_INSTANCE_NUMBER

    assert d.get(TAG_PATIENT_ID) == "p01"
    assert "T2" in d.get(TAG_SERIES_DESC)
    assert int(d.get(TAG_INSTANCE_NUMBER)) == 5


def _make_dicom_tree(tmp_path, rng, n_patients=5, slices_each=3):
    root = tmp_path / "dicoms"
    root.mkdir()
    for i in range(n_patients):
        pdir = root / f"pat{i:02d}"
        pdir.mkdir()
        for s in range(slices_each):
            px = (rng.random((32, 32)) * 500).astype(np.uint16)
            write_dicom_minimal(
                pdir / f"s{s}.dcm",
                px,
                patient_id=f"pat{i:02d}",
                field_strength="3.0",
                series_desc="AX T2 FSE",
                instance_number=s + 1,
            )
    return root


def test_patient_index_and_dataset(tmp_path, rng):
    root = _make_dicom_tree(tmp_path, rng)
    idx = build_patient_index(root, tmp_path / "index.json")
    assert len(idx) == 5
    assert all("3.0T" in v and "T2" in v["3.0T"] for v in idx.values())
    # index JSON round-trips
    loaded = json.loads((tmp_path / "index.json").read_text())
    assert len(loaded) == 5

    ds = FastMRISliceDataset(index=idx, mode="train", target_size=(64, 64), fractions=(0.6, 0.2, 0.2))
    assert len(ds) == 3 * 3  # 3 train patients x 3 slices
    item = ds[0]
    assert item["hr"].shape == (64, 64, 1)
    assert item["lr"].shape == (64, 64, 1)
    # LANCZOS ringing can overshoot [0,1] slightly (PIL parity behaviour)
    assert -0.3 <= item["hr"].min() and item["hr"].max() <= 1.3


def test_patient_split_matches_torch_random_split():
    """Bit-exact parity with torch.utils.data.random_split(seed=42)."""
    import torch
    from torch.utils.data import random_split

    items = [f"subj{i}" for i in range(23)]
    ours = patient_split(items, (0.8, 0.1, 0.1), seed=42)
    g = torch.Generator().manual_seed(42)
    tr, va, te = random_split(items, [0.8, 0.1, 0.1], generator=g)
    assert ours["train"] == [items[i] for i in tr.indices]
    assert ours["val"] == [items[i] for i in va.indices]
    assert ours["test"] == [items[i] for i in te.indices]


def test_random_split_lengths():
    assert random_split_lengths(10, (0.8, 0.1, 0.1)) == [8, 1, 1]
    assert sum(random_split_lengths(23, (0.8, 0.1, 0.1))) == 23


# ------------------------- slices / windows -------------------------

def test_pad_or_center_crop_all_cases():
    big = np.ones((600, 700), np.float32)
    out = pad_or_center_crop(big, (512, 512))
    assert out.shape == (512, 512)
    small = np.ones((100, 50), np.float32)
    out = pad_or_center_crop(small, (512, 512), pad_value=-1.0)
    assert out.shape == (512, 512)
    assert out[0, 0] == -1.0 and out[256, 256] == 1.0


def test_crop_slab():
    v = np.zeros((4, 5, 200))
    out = crop_slab(v, 2, 80, 30)
    assert out.shape == (4, 5, 90)
    tiny = np.zeros((4, 5, 50))
    assert crop_slab(tiny, 2).shape == (4, 5, 50)  # too small: no-op


def test_intensity_windows():
    x = np.array([-100, 0, 500, 1000, 2000], np.float32)
    y = scale_intensity_range(x, 0, 1000)
    np.testing.assert_allclose(y, [0, 0, 0.5, 1.0, 1.0])
    z = clip_to_unit_interval(x, (0, 2000))
    np.testing.assert_allclose(z, [0, 0, 0.25, 0.5, 1.0])


def test_volume_to_slices_scale_indexing():
    lr = np.zeros((4, 4, 8))
    hr = np.zeros((4, 4, 32))
    for i in range(32):
        hr[..., i] = i
    pairs = volume_to_slices(lr, hr, axis=2)
    assert len(pairs) == 8
    assert pairs[3][1][0, 0] == 12  # i * scale(=4)


# ------------------------- BIDS SliceDataset -------------------------

def test_slice_dataset_cache_and_getitem(tmp_path, rng):
    from mrisr_tpu.data.nifti import write_nifti

    # two fake subjects, one skipped (sub-15)
    pairs = []
    for sid in ("sub-01", "sub-15"):
        vol = (rng.random((40, 44, 150)) * 900).astype(np.float32)
        p = tmp_path / f"{sid}.nii.gz"
        write_nifti(p, vol)
        pairs.append({"lr": str(p), "hr": str(p), "txt": "t", "subject_id": sid})

    ds = SliceDataset(pairs, slice_axis=2, cache_dir=tmp_path / "cache")
    # sub-15 skipped; 150 - 80 - 30 = 40 slices
    assert len(ds) == 40
    item = ds[0]
    assert item["hr"].shape == (512, 512, 1)
    assert item["hr"].min() >= -1.0 and item["hr"].max() <= 1.0
    # cache file exists and a second init is served from it
    assert (tmp_path / "cache" / "sub-01_resampled.npz").exists()
    ds2 = SliceDataset(pairs, slice_axis=2, cache_dir=tmp_path / "cache")
    assert len(ds2) == 40


# ------------------------- MNIST -------------------------

def test_mnist_synthetic_dataset():
    ds = MNISTSRDataset(n_synthetic=16)
    assert len(ds) == 16
    item = ds[0]
    assert item["hr"].shape == (28, 28, 1)
    assert item["lr"].shape == (14, 14, 1)
    assert -1.0 <= item["hr"].min() and item["hr"].max() <= 1.0
    # deterministic
    ds2 = MNISTSRDataset(n_synthetic=16)
    np.testing.assert_allclose(ds2[3]["hr"], ds[3]["hr"])


def test_mnist_idx_reader(tmp_path):
    import struct

    imgs, labels = synthetic_digits(4)
    (tmp_path / "train-images-idx3-ubyte").write_bytes(
        struct.pack(">4i", 2051, 4, 28, 28) + imgs.tobytes()
    )
    (tmp_path / "train-labels-idx1-ubyte").write_bytes(
        struct.pack(">2i", 2049, 4) + labels.astype(np.uint8).tobytes()
    )
    ds = MNISTSRDataset(data_dir=tmp_path, mode="train")
    assert len(ds) == 4
    assert int(ds[1]["label"]) == int(labels[1])


# ------------------------- Loader / export -------------------------

def test_loader_batches_and_shuffles():
    ds = MNISTSRDataset(n_synthetic=10)
    loader = Loader(ds, batch_size=4, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == 2  # drop_last
    assert batches[0]["hr"].shape == (4, 28, 28, 1)
    # next epoch shuffles differently
    b2 = list(loader)
    assert not np.allclose(batches[0]["hr"], b2[0]["hr"])


def test_export_png_dataset(tmp_path, rng):
    src = tmp_path / "npz"
    src.mkdir()
    for i in range(3):
        np.savez_compressed(src / f"axial_vol_{i:03d}.npz", lr=rng.random((32, 32)), hr=rng.random((32, 32)))
    n = export_png_dataset(src, tmp_path / "out")
    assert n == 3
    meta = (tmp_path / "out" / "metadata.jsonl").read_text().strip().split("\n")
    assert len(meta) == 3
    row = json.loads(meta[0])
    assert "file_name" in row and "conditioning_image" in row  # HF convention
    assert (tmp_path / "out" / row["file_name"]).exists()


def test_normalize_to_uint8_constant():
    assert normalize_to_uint8(np.ones((4, 4))).max() == 0  # constant -> zeros
