import jax
import jax.numpy as jnp
import numpy as np

from mrisr_tpu.diffusion.schedules import sd15_schedule, resdiff_schedule
from mrisr_tpu.models.sd_unet import SDUNet
from mrisr_tpu.models.vae import AutoencoderKL
from mrisr_tpu.models.controlnet import ControlNet
from mrisr_tpu.pipelines.latent import LatentSRPipeline, prepare_condition_image, decode_to_vis

TINY = dict(block_out_channels=(8, 16, 16, 16), heads=2, context_dim=16)


def _tiny_latent_pipeline(key):
    unet = SDUNet(**TINY)
    cn = ControlNet(block_out_channels=TINY["block_out_channels"], heads=2, context_dim=16)
    vae = AutoencoderKL(block_out_channels=(8, 8, 16, 16))
    sched = sd15_schedule(zero_terminal_snr=False, timesteps=100)

    lat = jnp.zeros((1, 8, 8, 4))
    t = jnp.array([1])
    ctx = jnp.zeros((1, 7, 16))
    img = jnp.zeros((1, 64, 64, 3))
    k1, k2, k3 = jax.random.split(key, 3)
    unet_params = unet.init(k1, lat, t, ctx)
    cn_params = cn.init(k2, lat, t, ctx, img)
    vae_params = vae.init(k3, img)
    prompt = jnp.zeros((1, 7, 16))
    return LatentSRPipeline(unet, cn, vae, sched, unet_params, cn_params, vae_params, prompt)


def test_latent_pipeline_end_to_end(key):
    pipe = _tiny_latent_pipeline(key)
    lr = jnp.zeros((1, 64, 64, 1))
    out = pipe.super_resolve(lr, key, num_inference_steps=3)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_latent_precompute_cond_equivalence(key):
    """Hoisting the step-invariant ControlNet condition embedding out of the
    K-step scan (precompute_cond=True, the default) must be bit-equivalent
    to embedding inside every step (PERF.md round-13)."""
    pipe = _tiny_latent_pipeline(key)
    pipe_off = LatentSRPipeline(
        pipe.unet, pipe.controlnet, pipe.vae, pipe.sched, pipe.unet_params,
        pipe.controlnet_params, pipe.vae_params, pipe.prompt_embeds,
        precompute_cond=False,
    )
    lr = jnp.asarray(np.random.default_rng(3).uniform(-1, 1, (1, 64, 64, 1)), jnp.float32)
    out_on = np.asarray(pipe.super_resolve(lr, key, num_inference_steps=3))
    out_off = np.asarray(pipe_off.super_resolve(lr, key, num_inference_steps=3))
    np.testing.assert_allclose(out_on, out_off, atol=1e-6, rtol=1e-6)


def test_prepare_condition_image():
    x = jnp.zeros((2, 16, 16, 1))
    y = prepare_condition_image(x, (32, 32))
    assert y.shape == (2, 32, 32, 3)


def test_decode_to_vis():
    img = jnp.zeros((1, 8, 8, 1))
    vis = decode_to_vis(img)
    assert vis.shape == (8, 8, 3) and vis.dtype == np.uint8
    assert vis.max() == 127 or vis.max() == 128  # [-1,1] zero -> mid gray


def test_volume_pipeline_roundtrip(tmp_path, key):
    """NIfTI -> slices -> (identity 'SR') -> restack -> NIfTI."""
    from mrisr_tpu.data.nifti import write_nifti, read_nifti
    from mrisr_tpu.pipelines.volume import super_resolve_volume

    rng = np.random.default_rng(0)
    vol = (rng.random((24, 20, 6)) * 800).astype(np.float32)
    src = tmp_path / "in.nii.gz"
    write_nifti(src, vol)

    class IdentityPipeline:
        def super_resolve(self, lr, key, num_steps=None):
            return lr

    out = super_resolve_volume(
        IdentityPipeline(), src, tmp_path / "out.nii.gz", resolution=32, batch_size=4,
        clip=(0, 800),
    )
    assert out.shape == vol.shape
    # identity SR + windows: output approximates the [0,1]-scaled input
    expected = np.clip(vol / 800.0, 0, 1)
    np.testing.assert_allclose(out.data, expected, atol=1e-2)
    saved = read_nifti(tmp_path / "out.nii.gz")
    assert saved.shape == vol.shape


def test_cli_evaluate_and_export(tmp_path, rng):
    from PIL import Image

    from mrisr_tpu.cli import main

    gen = tmp_path / "gen"
    gt = tmp_path / "gt"
    gen.mkdir(), gt.mkdir()
    a = (rng.random((16, 16)) * 255).astype(np.uint8)
    Image.fromarray(a).save(gen / "0.png")
    Image.fromarray(a).save(gt / "0.png")
    assert main(["evaluate", "--gen", str(gen), "--gt", str(gt)]) == 0

    src = tmp_path / "npz"
    src.mkdir()
    np.savez_compressed(src / "a.npz", lr=rng.random((8, 8)), hr=rng.random((8, 8)))
    assert main(["export-png", "--source", str(src), "--dest", str(tmp_path / "png")]) == 0


def test_cli_build_index(tmp_path, rng):
    from mrisr_tpu.cli import main
    from mrisr_tpu.data.dicom import write_dicom_minimal

    root = tmp_path / "d"
    root.mkdir()
    write_dicom_minimal(root / "a.dcm", (rng.random((8, 8)) * 100).astype(np.uint16))
    assert main(["build-index", "--root", str(root), "--out", str(tmp_path / "i.json")]) == 0
    import json

    assert len(json.loads((tmp_path / "i.json").read_text())) == 1


def test_volume_pipeline_grouped_chains_match_serial(tmp_path, key):
    """chain_group=G dispatch == serial dispatch, slice for slice.

    Grouped dispatch exists to amortize per-dispatch overhead
    (PERF.md round-7); the per-chain keys are the same ``fold_in(key, s)``
    as the serial path, so outputs must agree bit-for-bit including the
    padded remainder group."""
    import jax.numpy as jnp

    from mrisr_tpu.data.nifti import write_nifti
    from mrisr_tpu.diffusion.schedules import resdiff_schedule
    from mrisr_tpu.models.resdiff_unet import ResDiffUNet
    from mrisr_tpu.models.simple_cnn import SimpleCNN
    from mrisr_tpu.pipelines.resdiff import ResDiffPipeline
    from mrisr_tpu.pipelines.volume import super_resolve_volume

    rng = np.random.default_rng(0)
    vol = (rng.random((20, 18, 6)) * 800).astype(np.float32)
    src = tmp_path / "in.nii.gz"
    write_nifti(src, vol)

    cnn = SimpleCNN()
    unet = ResDiffUNet(image_size=32, inner_channel=8, norm_groups=4)
    k1, k2 = jax.random.split(key)
    pipe = ResDiffPipeline(
        cnn, unet, resdiff_schedule(100),
        cnn.init(k1, jnp.zeros((1, 32, 32, 1))),
        unet.init(k2, jnp.zeros((1, 32, 32, 2)), jnp.array([0.5])),
    )
    common = dict(resolution=32, batch_size=2, num_steps=4, clip=(0, 800))
    serial = super_resolve_volume(pipe, src, None, chain_group=1, **common)
    # 6 slices / bs=2 = 3 chains; G=2 pads to 4 (one repeated chain).
    grouped = super_resolve_volume(pipe, src, None, chain_group=2, **common)
    np.testing.assert_allclose(grouped.data, serial.data, atol=1e-5, rtol=1e-5)


def test_volume_pipeline_mesh_sharded(tmp_path, key):
    """Volume inference with batches sharded over the 8-device mesh."""
    import jax

    from mrisr_tpu.data.nifti import write_nifti
    from mrisr_tpu.parallel.mesh import make_mesh
    from mrisr_tpu.pipelines.volume import super_resolve_volume

    rng = np.random.default_rng(0)
    vol = (rng.random((16, 16, 8)) * 800).astype(np.float32)
    src = tmp_path / "in.nii.gz"
    write_nifti(src, vol)

    seen_shardings = []

    class ShardCheckPipeline:
        def super_resolve(self, lr, key, num_steps=None):
            seen_shardings.append(lr.sharding)
            return lr

    out = super_resolve_volume(
        ShardCheckPipeline(), src, None, resolution=16, batch_size=8,
        clip=(0, 800), mesh=make_mesh(8),
    )
    assert out.shape == vol.shape
    assert seen_shardings and all(not s.is_fully_replicated for s in seen_shardings)


def test_volume_pipeline_mesh_sharded_numeric(tmp_path, key):
    """Mesh-sharded volume serving == single-device, REAL ResDiff math.

    The ShardCheckPipeline test above pins that the driver actually shards
    its batches; this one pins that sharding does not change the numbers —
    the property ``__graft_entry__.dryrun_multichip`` leg 4 checks, now
    CI-guarded in the suite itself (VERDICT round-4 weak #6)."""
    import jax.numpy as jnp

    from mrisr_tpu.data.nifti import write_nifti
    from mrisr_tpu.diffusion.schedules import resdiff_schedule
    from mrisr_tpu.models.resdiff_unet import ResDiffUNet
    from mrisr_tpu.models.simple_cnn import SimpleCNN
    from mrisr_tpu.parallel.mesh import make_mesh
    from mrisr_tpu.pipelines.resdiff import ResDiffPipeline
    from mrisr_tpu.pipelines.volume import super_resolve_volume

    rng = np.random.default_rng(0)
    vol = (rng.random((20, 18, 8)) * 800).astype(np.float32)
    src = tmp_path / "in.nii.gz"
    write_nifti(src, vol)

    cnn = SimpleCNN()
    unet = ResDiffUNet(image_size=32, inner_channel=8, norm_groups=4)
    k1, k2 = jax.random.split(key)
    pipe = ResDiffPipeline(
        cnn, unet, resdiff_schedule(100),
        cnn.init(k1, jnp.zeros((1, 32, 32, 1))),
        unet.init(k2, jnp.zeros((1, 32, 32, 2)), jnp.array([0.5])),
    )
    common = dict(resolution=32, batch_size=8, num_steps=4, clip=(0, 800))
    single = super_resolve_volume(pipe, src, None, **common)
    sharded = super_resolve_volume(pipe, src, None, mesh=make_mesh(8), **common)
    np.testing.assert_allclose(sharded.data, single.data, atol=1e-5, rtol=1e-5)


def test_latent_volume_mesh_sharded_numeric(tmp_path, key):
    """Same property for the LATENT pipeline family (grouped dispatch path,
    [G, B, ...] stacks sharded over the data axis) — the family previously
    had no mesh-sharded numeric test at all (VERDICT round-4 weak #6)."""
    from mrisr_tpu.data.nifti import write_nifti
    from mrisr_tpu.parallel.mesh import make_mesh
    from mrisr_tpu.pipelines.volume import super_resolve_volume

    pipe = _tiny_latent_pipeline(key)
    rng = np.random.default_rng(1)
    vol = (rng.random((48, 40, 16)) * 800).astype(np.float32)
    src = tmp_path / "in.nii.gz"
    write_nifti(src, vol)

    # batch 8 = one slice per virtual device; 16 slices / bs 8 = 2 chains,
    # one G=2 grouped dispatch ([G, B, ...] sharded P(None, "data", ...)).
    common = dict(
        resolution=64, batch_size=8, num_steps=3, clip=(0, 800), chain_group=2
    )
    single = super_resolve_volume(pipe, src, None, **common)
    sharded = super_resolve_volume(pipe, src, None, mesh=make_mesh(8), **common)
    # latent output is RGB; driver keeps channel 0 semantics via restack on
    # [..., 0] — both paths go through the same restack, so compare volumes.
    # atol 1e-4: the sharded program lowers differently from the
    # single-device one and the 3-step chain + VAE decode amplifies the
    # per-op reassociation noise past 1e-5 (same envelope as
    # __graft_entry__ leg 5 and the fused-tower chain comparison).
    np.testing.assert_allclose(sharded.data, single.data, atol=1e-4, rtol=1e-4)


def test_latent_grouped_dispatch_matches_single(key):
    """LatentSRPipeline.super_resolve_group (G chains, one lax.scan program)
    == per-chain super_resolve, chain for chain (the volume-serving
    amortization pattern, mirroring ResDiffPipeline.super_resolve_many)."""
    pipe = _tiny_latent_pipeline(key)
    rng = np.random.default_rng(5)
    stack = jnp.asarray(rng.standard_normal((2, 1, 64, 64, 1)), jnp.float32)
    keys = jnp.stack([jax.random.fold_in(key, i) for i in range(2)])
    grouped = np.asarray(pipe.super_resolve_group(stack, keys, 3))
    for g in range(2):
        single = np.asarray(
            pipe.super_resolve(stack[g], keys[g], num_inference_steps=3)
        )
        np.testing.assert_allclose(grouped[g], single, atol=1e-5, rtol=1e-5)
