"""Trainer hardening: resume, validation hook, grad accumulation, precision,
native-cache training path, dataset stats, resumable evaluation.

Reference semantics: resume via ``start_epoch``/checkpoint load
(``ResDif_execution.ipynb`` cells 29/45), validation every ``val_freq``
with metrics + image strips (cell 46), ``gradient_accumulation_steps`` and
``mixed_precision`` (config cell 11), resumable eval loops (cells 32/50),
dataset analytics (``notebooks/dataset.ipynb`` cell 10).
"""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrisr_tpu.cli import main as cli_main


def test_train_cnn_resume_continues_from_checkpoint(tmp_path):
    out = str(tmp_path / "run")
    rc = cli_main(
        ["train-cnn", "--cpu", "--steps", "3", "--batch", "2",
         "--resolution", "32", "--out", out]
    )
    assert rc == 0
    from mrisr_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(f"{out}/ckpt")
    assert mgr.latest_step() == 3
    mgr.close()

    rc = cli_main(
        ["train-cnn", "--cpu", "--steps", "5", "--batch", "2",
         "--resolution", "32", "--out", out, "--resume"]
    )
    assert rc == 0
    mgr = CheckpointManager(f"{out}/ckpt")
    assert mgr.latest_step() == 5  # 3 resumed + 2 more, not 5 fresh + 3 stale
    mgr.close()


def test_train_resdiff_validation_hook_writes_metrics_and_strips(tmp_path):
    out = str(tmp_path / "run")
    rc = cli_main(
        ["train-resdiff", "--cpu", "--steps", "2", "--batch", "2",
         "--resolution", "32", "--out", out,
         "--val-every", "2", "--val-steps", "2"]
    )
    assert rc == 0
    strips = list((tmp_path / "run" / "val").glob("val_*.png"))
    assert strips, "validation image strips missing"
    lines = [json.loads(l) for l in open(f"{out}/metrics.jsonl")]
    val_lines = [l for l in lines if any(k.startswith("val_") for k in l)]
    assert val_lines and "val_psnr" in val_lines[-1]


def test_grad_accum_defers_updates():
    from mrisr_tpu.train.state import create_train_state, make_optimizer

    def apply_fn(params, x):
        return x * params["w"]

    params = {"w": jnp.ones(())}
    state = create_train_state(apply_fn, params, make_optimizer(0.1, grad_accum=2))
    grads = {"w": jnp.ones(())}
    s1 = state.apply_gradients(grads=grads)
    # first microstep accumulates, does not update
    assert float(s1.params["w"]) == pytest.approx(1.0)
    s2 = s1.apply_gradients(grads=grads)
    assert float(s2.params["w"]) < 1.0  # applied after k=2 microsteps


def test_bf16_policy_keeps_params_fp32():
    from mrisr_tpu.models.simple_cnn import SimpleCNN
    from mrisr_tpu.train.precision import get_policy
    from mrisr_tpu.train.state import create_train_state, make_optimizer
    from mrisr_tpu.train.steps import make_cnn_train_step

    key = jax.random.PRNGKey(0)
    cnn = SimpleCNN()
    params = cnn.init(key, jnp.zeros((1, 16, 16, 1)))
    state = create_train_state(cnn.apply, params, make_optimizer(1e-3))
    step = make_cnn_train_step(cnn, get_policy("bfloat16"))
    batch = {
        "lr": jnp.ones((2, 16, 16, 1)) * 0.5,
        "hr": jnp.ones((2, 16, 16, 1)) * 0.25,
    }
    state, m = step(state, batch, key)
    assert np.isfinite(float(m["loss"]))
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(l.dtype == jnp.float32 for l in leaves)


def test_build_cache_and_train_from_cache(tmp_path):
    cache_path = str(tmp_path / "slices.cache")
    rc = cli_main(["build-cache", "--cpu", "--resolution", "32", "--out", cache_path])
    assert rc == 0
    out = str(tmp_path / "run")
    rc = cli_main(
        ["train-cnn", "--cpu", "--steps", "2", "--batch", "2",
         "--resolution", "32", "--out", out, "--cache", cache_path]
    )
    assert rc == 0


def test_loader_uses_dataset_get_batch(tmp_path):
    """The Loader must route through a dataset's vectorised get_batch."""
    from mrisr_tpu.data.loader import Loader

    calls = []

    class DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):  # pragma: no cover - must not be called
            raise AssertionError("per-item path used despite get_batch")

        def get_batch(self, idx):
            calls.append(list(map(int, idx)))
            return {"x": np.zeros((len(idx), 2), np.float32)}

    batches = list(Loader(DS(), batch_size=4))
    assert len(batches) == 2 and calls and all(len(c) == 4 for c in calls)


def test_dataset_stats_overlap(tmp_path):
    # fixture: 2 low-field subjects, 1 of which also has high-field data
    for sub, tree in [
        ("sub-0001", "64mT data"),
        ("sub-0002", "64mT data"),
        ("sub-0001", "3T data"),
    ]:
        if tree == "64mT data":
            d = tmp_path / tree / sub / "ses-01" / "anat"
            d.mkdir(parents=True)
            (d / f"{sub}_run-01_T1w.nii.gz").write_bytes(b"")
        else:
            d = tmp_path / tree / sub / "anat"
            d.mkdir(parents=True)
            (d / f"{sub}_acq-highres_T1w.nii.gz").write_bytes(b"")
    from mrisr_tpu.data.bids import dataset_stats

    st = dataset_stats(tmp_path)
    assert st["low_field"]["n_subjects"] == 2
    assert st["high_field"]["n_subjects"] == 1
    assert st["overlap"]["n_subjects_in_both"] == 1
    assert st["overlap"]["only_low_field"] == ["sub-0002"]
    assert st["low_field"]["subjects"]["sub-0001"]["runs"] == ["01"]
    assert st["paired_scans"] == 1


def test_evaluate_folders_resumable(tmp_path):
    from PIL import Image

    from mrisr_tpu.eval.metrics import MRIEvaluator

    gen, gt = tmp_path / "gen", tmp_path / "gt"
    gen.mkdir(), gt.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        a = (rng.random((16, 16)) * 255).astype(np.uint8)
        Image.fromarray(a).save(gen / f"{i}.png")
        Image.fromarray(a).save(gt / f"{i}.png")

    state_file = str(tmp_path / "progress.json")
    ev = MRIEvaluator(verbose=False)
    full = ev.evaluate_folders(str(gen), str(gt), state_file=state_file)
    assert full["count"] == 4
    st = json.loads(open(state_file).read())
    assert len(st["processed"]) == 4

    # simulate partial progress: drop 2 entries, rerun resumes only the rest
    st["processed"] = st["processed"][:2]
    st["count"] = 2
    st["sums"] = {k: v / 2 for k, v in st["sums"].items()}
    open(state_file, "w").write(json.dumps(st))
    resumed = ev.evaluate_folders(str(gen), str(gt), state_file=state_file)
    assert resumed["count"] == 4


def test_cli_stats_command(tmp_path, capsys):
    d = tmp_path / "64mT data" / "sub-0001" / "ses-01" / "anat"
    d.mkdir(parents=True)
    (d / "sub-0001_T1w.nii.gz").write_bytes(b"")
    (tmp_path / "3T data").mkdir()
    rc = cli_main(["stats", "--data-dir", str(tmp_path), "--out", str(tmp_path / "s.json")])
    assert rc == 0
    report = json.loads((tmp_path / "s.json").read_text())
    assert report["low_field"]["n_subjects"] == 1


def test_train_latent_cli_tiny_modes(tmp_path):
    """PEFT training loop reachable from the CLI for all three modes."""
    for mode in ("controlnet", "lora", "adapter"):
        out = str(tmp_path / mode)
        rc = cli_main(
            ["train-latent", "--cpu", "--tiny", "--mode", mode,
             "--steps", "2", "--batch", "2", "--resolution", "64",
             "--warmup", "1", "--out", out]
        )
        assert rc == 0, mode
        lines = [json.loads(l) for l in open(f"{out}/metrics.jsonl")]
        assert lines and np.isfinite(lines[0]["loss"])


def test_config_file_feeds_cli_defaults(tmp_path):
    """--config values override parser defaults; explicit flags still win."""
    cfg = tmp_path / "c.yaml"
    cfg.write_text(
        "data:\n  resolution: 32\n  batch_size: 2\ntrain:\n  max_steps: 2\n"
        "  output_dir: '%s'\n" % (tmp_path / "cfgout")
    )
    rc = cli_main(["train-cnn", "--cpu", "--config", str(cfg)])
    assert rc == 0
    assert (tmp_path / "cfgout" / "metrics.jsonl").exists()

    # explicit CLI flag beats the config file
    rc = cli_main(
        ["train-cnn", "--cpu", "--config", str(cfg), "--out", str(tmp_path / "cli")]
    )
    assert rc == 0
    assert (tmp_path / "cli" / "metrics.jsonl").exists()


def test_visual_report_cli(tmp_path):
    """report subcommand: LR|HR montages + stats.json on a fixture tree."""
    from mrisr_tpu.data.nifti import write_nifti

    rng = np.random.default_rng(0)
    sub = "sub-0001"
    lr_dir = tmp_path / "64mT data" / sub / "ses-01" / "anat"
    hr_dir = tmp_path / "3T data" / sub / "anat"
    lr_dir.mkdir(parents=True), hr_dir.mkdir(parents=True)
    write_nifti(lr_dir / f"{sub}_T1w.nii.gz", rng.random((8, 8, 6)).astype(np.float32))
    write_nifti(
        hr_dir / f"{sub}_acq-highres_T1w.nii.gz",
        rng.random((16, 16, 12)).astype(np.float32),
    )
    out = tmp_path / "report"
    rc = cli_main(["report", "--data-dir", str(tmp_path), "--out", str(out)])
    assert rc == 0
    assert (out / f"{sub}_lr_hr.png").exists()
    stats = json.loads((out / "stats.json").read_text())
    assert stats["paired_scans"] == 1 and len(stats["montages"]) == 1


def test_resdiff_remat_step_matches_no_remat():
    """jax.checkpoint remat must not change loss or gradients."""
    from mrisr_tpu.diffusion.schedules import resdiff_schedule
    from mrisr_tpu.models.resdiff_unet import ResDiffUNet
    from mrisr_tpu.train.state import create_train_state, make_optimizer
    from mrisr_tpu.train.steps import make_resdiff_train_step

    key = jax.random.PRNGKey(0)
    unet = ResDiffUNet(image_size=32, inner_channel=8, norm_groups=4)
    params = unet.init(key, jnp.zeros((1, 32, 32, 2)), jnp.array([0.5]))
    sched = resdiff_schedule(100)
    batch = {
        "sr": jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 1)) * 0.1,
        "hr": jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 1)) * 0.1,
    }
    outs = []
    for remat in (False, True):
        state = create_train_state(unet.apply, params, make_optimizer(1e-4))
        step = make_resdiff_train_step(unet, sched, remat=remat)
        state, m = step(state, batch, jax.random.PRNGKey(3))
        outs.append((float(m["loss"]), state.params))
    assert outs[0][0] == pytest.approx(outs[1][0], rel=1e-6)
    # fp reassociation through Adam gives ~1e-6 drift; semantics identical
    for a, b in zip(jax.tree_util.tree_leaves(outs[0][1]), jax.tree_util.tree_leaves(outs[1][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_skip_nonfinite_guards_updates():
    import optax

    from mrisr_tpu.train.state import create_train_state, make_optimizer

    def apply_fn(params, x):
        return x * params["w"]

    params = {"w": jnp.ones(())}
    state = create_train_state(
        apply_fn, params, make_optimizer(0.1, skip_nonfinite=True)
    )
    # a NaN gradient must leave params untouched...
    s1 = state.apply_gradients(grads={"w": jnp.array(jnp.nan)})
    assert float(s1.params["w"]) == 1.0
    # ...and a following finite gradient still applies
    s2 = s1.apply_gradients(grads={"w": jnp.ones(())})
    assert float(s2.params["w"]) < 1.0
