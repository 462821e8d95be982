import numpy as np

from mrisr_tpu.config import Config, load_config, config_to_flat_dict


def test_default_config():
    cfg = Config()
    assert cfg.model.inner_channel == 32
    assert cfg.schedule.beta_start == 1e-6


def test_yaml_float_resolver(tmp_path):
    """'1e-2' must parse as a float (the reference needed a loader hack)."""
    p = tmp_path / "c.yaml"
    p.write_text("optim:\n  lr: 1e-2\n  warmup_steps: 500\nmodel:\n  image_size: 128\n")
    cfg = load_config(p)
    assert isinstance(cfg.optim.lr, float) and cfg.optim.lr == 0.01
    assert cfg.model.image_size == 128


def test_json_config_and_extras(tmp_path):
    p = tmp_path / "c.json"
    p.write_text('{"train": {"max_steps": 5}, "wandb": {"project": "x"}}')
    cfg = load_config(p)
    assert cfg.train.max_steps == 5
    assert cfg.extras["wandb"]["project"] == "x"


def test_overrides_and_flatten():
    cfg = load_config(None, overrides={"data": {"batch_size": 3}})
    assert cfg.data.batch_size == 3
    flat = config_to_flat_dict(cfg)
    assert flat["data.batch_size"] == 3
    assert "optim.lr" in flat


def test_checkpoint_roundtrip(tmp_path, key):
    import jax.numpy as jnp

    from mrisr_tpu.models.simple_cnn import SimpleCNN
    from mrisr_tpu.train.state import create_train_state, make_optimizer
    from mrisr_tpu.utils.checkpoint import CheckpointManager

    cnn = SimpleCNN(hidden=8)
    x = jnp.zeros((1, 8, 8, 1))
    params = cnn.init(key, x)
    state = create_train_state(cnn.apply, params, make_optimizer(1e-3))

    mgr = CheckpointManager(tmp_path / "ckpt", max_to_keep=2)
    assert mgr.save(0, state)
    state2 = state.replace(step=state.step + 1)
    assert mgr.save(1, state2)
    assert mgr.latest_step() == 1

    restored = mgr.restore(state)
    assert int(restored.step) == 1
    leaves_a = jax.tree_util.tree_leaves(restored.params)
    leaves_b = jax.tree_util.tree_leaves(state2.params)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    mgr.close()


import jax  # noqa: E402  (used above)


def test_metric_logger_jsonl(tmp_path):
    from mrisr_tpu.utils.logging import MetricLogger

    lg = MetricLogger(tmp_path)
    lg.log(1, {"loss": 0.5})
    lg.log(2, {"loss": 0.25, "psnr": 30.0})
    lines = (tmp_path / "metrics.jsonl").read_text().strip().split("\n")
    assert len(lines) == 2
    import json

    row = json.loads(lines[1])
    assert row["psnr"] == 30.0 and row["step"] == 2
