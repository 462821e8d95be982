"""Volume driver: grouped multi-chain dispatch == strict-serial dispatch.

``super_resolve_volume(chain_group=G)`` batches G chains per jitted program
(the volume-serving pattern, PERF.md round-7) and pads the start list to a
multiple of G by repeating the last start.  The math must be unchanged:
per-chain keys are ``fold_in(key, start)`` in both paths, so the grouped
volume must equal the serial volume exactly — including an uneven tail
(n_slices not a multiple of G*batch_size) where the padding logic runs.

Reference behavior being preserved: the notebook's per-batch loop over a
sliced volume (ResDif_execution.ipynb cell 37 evaluation loop).
"""
import jax
import jax.numpy as jnp
import numpy as np

from mrisr_tpu.data.nifti import write_nifti
from mrisr_tpu.diffusion.schedules import resdiff_schedule
from mrisr_tpu.models.resdiff_unet import ResDiffUNet
from mrisr_tpu.models.simple_cnn import SimpleCNN
from mrisr_tpu.pipelines.resdiff import ResDiffPipeline
from mrisr_tpu.pipelines.volume import super_resolve_volume


def test_volume_grouped_dispatch_matches_serial(tmp_path, key):
    cnn = SimpleCNN()
    unet = ResDiffUNet(image_size=32, inner_channel=8, norm_groups=4)
    sched = resdiff_schedule(100)
    k1, k2 = jax.random.split(key)
    cnn_params = cnn.init(k1, jnp.zeros((1, 32, 32, 1)))
    unet_params = unet.init(k2, jnp.zeros((1, 32, 32, 2)), jnp.array([0.5]))
    pipe = ResDiffPipeline(cnn, unet, sched, cnn_params, unet_params)

    # 5 slices, batch_size=2 -> 3 starts; chain_group=2 pads to 4 groups'
    # worth (one repeated start) — exercises both the slice padding and the
    # start-list padding.
    rng = np.random.default_rng(0)
    vol = (rng.random((28, 30, 5)) * 600).astype(np.float32)
    src = tmp_path / "vol.nii"
    write_nifti(src, vol, np.eye(4))

    kwargs = dict(axis=2, resolution=32, batch_size=2, num_steps=3, seed=7)
    serial = super_resolve_volume(pipe, src, None, chain_group=1, **kwargs)
    grouped = super_resolve_volume(pipe, src, None, chain_group=2, **kwargs)

    assert serial.data.shape == vol.shape
    np.testing.assert_allclose(grouped.data, serial.data, atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(grouped.affine, serial.affine)


def test_restack_slices_larger_than_resolution():
    """Slices LARGER than the model resolution take the pad-back branch
    (undo-crop): the SR patch is centered on a zero canvas of the original
    shape (ADVICE round-3: this path raised NameError after the vectorized
    fast-path refactor; no prior test covered it)."""
    from mrisr_tpu.pipelines.volume import restack_slices

    rng = np.random.default_rng(1)
    sr = rng.uniform(-1, 1, (3, 32, 32, 1)).astype(np.float32)
    vol = restack_slices(sr, [(40, 40)] * 3, axis=2)
    assert vol.shape == (40, 40, 3)
    # center 32x32 carries the slices, border is the zero canvas
    np.testing.assert_allclose(
        vol[4:36, 4:36, :], np.moveaxis((sr[..., 0] + 1) / 2, 0, 2), atol=1e-6
    )
    np.testing.assert_array_equal(vol[:4, :, :], 0.0)
    np.testing.assert_array_equal(vol[:, 36:, :], 0.0)


def test_restack_slices_pad_back_mixed_dims():
    from mrisr_tpu.pipelines.volume import restack_slices

    rng = np.random.default_rng(3)
    # uniform ORIGINAL shapes but mixed relative to resolution is the real
    # serving case; exercise the loop by making shapes equal but > res in
    # one dim and < res in the other (fails the fast-path h0<=rh and w0<=rw
    # test, so the loop runs its pad-back branch per slice).
    sr = rng.uniform(-1, 1, (2, 16, 16, 1)).astype(np.float32)
    vol = restack_slices(sr, [(20, 12)] * 2, axis=2)
    assert vol.shape == (20, 12, 2)
    # width 12 < 16: cropped center columns [2:14]; height 20 > 16: rows
    # padded back with 2 zero rows top/bottom.
    np.testing.assert_array_equal(vol[:2, :, :], 0.0)
    np.testing.assert_allclose(
        vol[2:18, :, 0], (sr[0, :, 2:14, 0] + 1) / 2, atol=1e-6
    )
