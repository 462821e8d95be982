"""Parity-harness smoke: tiny configs produce a complete, sane report."""
import json

import numpy as np

from mrisr_tpu.eval.parity import run_parity


def test_parity_report_structure(tmp_path):
    out = tmp_path / "parity.json"
    report = run_parity(
        out, mnist_steps=5, phantom_steps=10, resdiff_steps=3, res=32,
        n_train=8, lr_schedule="cosine", batch=4,
    )
    on_disk = json.loads(out.read_text())
    for section in ("mnist_regression", "phantom_cnn", "phantom_resdiff", "anchors"):
        assert section in on_disk, section
    for section in ("mnist_regression", "phantom_cnn", "phantom_resdiff"):
        model = on_disk[section]["model"]
        assert set(model) == {"psnr", "ssim", "nmse", "hfen"}
        assert all(np.isfinite(v) for v in model.values())
    # baselines recorded alongside (the comparison the judge needs)
    assert "bicubic_baseline" in on_disk["phantom_cnn"]
    assert "stage1_cnn" in on_disk["phantom_resdiff"]
    assert on_disk["anchors"]["fastmri_cnn"]["psnr"] == 27.9176
    # params must not leak into the JSON
    assert "cnn_params" not in on_disk["phantom_cnn"]
