import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")

from mrisr_tpu.data.slicecache import SliceCache, SliceCacheDataset, build_cache_from_dataset  # noqa: E402


def test_native_cache_roundtrip(tmp_path, rng):
    p = tmp_path / "cache.bin"
    c = SliceCache.create(p, n=5, h=16, w=24)
    data = [(rng.random((16, 24)).astype(np.float32), rng.random((16, 24)).astype(np.float32)) for _ in range(5)]
    for i, (lr, hr) in enumerate(data):
        c.write(i, lr, hr)
    c.close()

    r = SliceCache.open(p)
    assert (r.n, r.height, r.width) == (5, 16, 24)
    lr_b, hr_b = r.get_batch([3, 0, 4])
    np.testing.assert_allclose(lr_b[0], data[3][0])
    np.testing.assert_allclose(hr_b[1], data[0][1])
    np.testing.assert_allclose(hr_b[2], data[4][1])
    r.close()


def test_native_cache_multithreaded_batch(tmp_path, rng):
    p = tmp_path / "c.bin"
    c = SliceCache.create(p, n=64, h=32, w=32)
    ref = rng.random((64, 32, 32)).astype(np.float32)
    for i in range(64):
        c.write(i, ref[i], ref[i] * 2)
    lr_b, hr_b = c.get_batch(list(range(64)), threads=4)
    np.testing.assert_allclose(lr_b, ref)
    np.testing.assert_allclose(hr_b, ref * 2)
    c.close()


def test_native_cache_bad_index(tmp_path, rng):
    c = SliceCache.create(tmp_path / "x.bin", n=2, h=4, w=4)
    with pytest.raises(IndexError):
        c.write(5, np.zeros((4, 4), np.float32), np.zeros((4, 4), np.float32))
    with pytest.raises(IndexError):
        c.get_batch([7])
    c.close()


def test_native_cache_corrupt_file(tmp_path):
    bad = tmp_path / "bad.bin"
    bad.write_bytes(b"not a cache")
    with pytest.raises(OSError):
        SliceCache.open(bad)


def test_build_cache_from_dataset(tmp_path):
    from mrisr_tpu.data.datasets import MNISTSRDataset

    ds = MNISTSRDataset(n_synthetic=6)

    class HRonly:
        """Adapt MNIST (lr 14x14) to equal-size pairs for the cache."""

        def __len__(self):
            return len(ds)

        def __getitem__(self, i):
            item = ds[i]
            return {"hr": item["hr"], "lr": item["hr"] * 0.5}

    cache = build_cache_from_dataset(HRonly(), tmp_path / "mnist.bin")
    assert cache.n == 6
    view = SliceCacheDataset(tmp_path / "mnist.bin")
    s = view[2]
    np.testing.assert_allclose(s["hr"][..., 0] * 0.5, s["lr"][..., 0])
    batch = view.get_batch([0, 1, 2])
    assert batch["hr"].shape == (3, 28, 28, 1)
