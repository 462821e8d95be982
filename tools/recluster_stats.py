"""Re-emit PARITY_r07_256 / PARITY_r08 decision statistics with
image-clustered CIs (VERDICT round-4 weak #2 / next #4).

The flat paired t-CIs in those artifacts treat the n_images x n_seeds
(image, seed) grid as independent samples; seed replicates of one image
are correlated, so the flat CIs are too tight.  This tool recomputes every
paired-delta block from the STORED per-image arrays (seed-major layout,
``eval/parity.py::sample_rows`` / ``eval_profile``), adds the
``clustered_by_image`` block (average seeds per image first, t-CI over the
n_images independent images), flips the machine-checkable verdicts to the
conservative interval, and writes ``*_clustered.json`` siblings.  The flat
statistics are recomputed too and asserted equal to the stored ones — the
proof that the clustering reads the same data the artifact was built from.

For PARITY_r08 the bicubic per-image reference rows were not stored; they
are regenerated bit-identically from the committed config (the phantom
generator is a seeded numpy RNG — ``_phantom_batches(seed0=1000)``).

Usage: PYTHONPATH=/root/repo python tools/recluster_stats.py
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from mrisr_tpu.eval.parity import (  # noqa: E402
    _metrics_per_image,
    _paired_delta_stats,
    _phantom_batches,
)


def _assert_flat_matches(new: dict, old: dict, where: str) -> None:
    """Stored arrays reproduce stored stats.  Tolerance: the r07 blocks are
    pure re-reads (agree to 1e-12); the r08 bicubic rows are REGENERATED and
    metric kernels ran on TPU in the original session vs CPU here, so the
    per-image PSNRs differ at the ~1e-5 dB level — still five orders below
    any decision threshold."""
    for k in ("n", "mean", "std"):
        if k in old and abs(float(new[k]) - float(old[k])) > 1e-3:
            raise AssertionError(
                f"{where}: recomputed flat {k} {new[k]} != stored {old[k]} — "
                "per-image arrays do not reproduce the stored statistics"
            )


def recluster_r07(path: str, out: str) -> None:
    d = json.load(open(path))
    n_seeds = len(d["config"]["sample_seeds"])
    prof = d["phantom_resdiff"]["profiles_50step"]
    exact = prof["exact"]["per_image"]
    for name, block in prof.items():
        if not isinstance(block, dict) or "per_image" not in block or name == "exact":
            continue
        stats = {}
        for m in ("psnr", "ssim"):
            s = _paired_delta_stats(
                exact[m], block["per_image"][m], n_seeds=n_seeds
            )
            _assert_flat_matches(
                s, block.get("delta_vs_exact", {}).get(m, {}),
                f"{path}:{name}.{m}",
            )
            stats[m] = s
        block["delta_vs_exact"] = stats
        gate = stats["psnr"].get("clustered_by_image", stats["psnr"])
        block["within_0p1db_flat"] = bool(stats["psnr"]["ci95"][1] < 0.1)
        block["within_0p1db"] = bool(gate["ci95"][1] < 0.1)
        print(
            f"[r07 {name}] dPSNR {stats['psnr']['mean']:+.4f} "
            f"flat CI95 ({stats['psnr']['ci95'][0]:+.4f},{stats['psnr']['ci95'][1]:+.4f}) "
            f"clustered ({gate['ci95'][0]:+.4f},{gate['ci95'][1]:+.4f}) "
            f"within_0.1dB={block['within_0p1db']}"
        )
    d["clustering_note"] = (
        "delta_vs_exact blocks recomputed by tools/recluster_stats.py with "
        "image-clustered CIs (seed replicates averaged per image first); "
        "within_0p1db now gates on the conservative clustered interval, "
        "within_0p1db_flat keeps the original flat-CI verdict"
    )
    json.dump(d, open(out, "w"), indent=2)
    print(f"wrote {out}")


def recluster_r08(path: str, out: str) -> None:
    d = json.load(open(path))
    for run_name, run in d.items():
        if not isinstance(run, dict) or not isinstance(run.get("config"), dict):
            continue
        cfg = run["config"]
        n_seeds = len(cfg["sample_seeds"])
        lr_te, hr_te = _phantom_batches(
            cfg["n_test"], cfg["res"], seed0=1000, textured=True,
            degrade_scale=cfg["degrade_scale"], texture_mode=cfg["texture_mode"],
        )
        bic = _metrics_per_image(lr_te, hr_te)
        bic_rep = {m: bic[m] * n_seeds for m in bic}
        for row_name, row in run.items():
            if not isinstance(row, dict) or "per_image" not in row:
                continue
            s = _paired_delta_stats(
                row["per_image"]["psnr"], bic_rep["psnr"], n_seeds=n_seeds
            )
            _assert_flat_matches(
                s, row.get("delta_vs_bicubic_psnr", {}),
                f"{path}:{run_name}.{row_name}",
            )
            row["delta_vs_bicubic_psnr"] = s
            gate = s.get("clustered_by_image", s)
            row["beats_bicubic_flat"] = bool(s["ci95"][0] > 0.0)
            row["beats_bicubic"] = bool(gate["ci95"][0] > 0.0)
            print(
                f"[r08 {run_name}.{row_name}] dPSNR {s['mean']:+.3f} "
                f"flat ({s['ci95'][0]:+.3f},{s['ci95'][1]:+.3f}) "
                f"clustered ({gate['ci95'][0]:+.3f},{gate['ci95'][1]:+.3f}) "
                f"beats_bicubic={row['beats_bicubic']}"
            )
        if "controlnet" in run and "base_unet" in run:
            run["controlnet_minus_base_psnr"] = _paired_delta_stats(
                run["controlnet"]["per_image"]["psnr"],
                run["base_unet"]["per_image"]["psnr"],
                n_seeds=n_seeds,
            )
    d["clustering_note"] = (
        "delta_vs_bicubic_psnr blocks recomputed by tools/recluster_stats.py "
        "with image-clustered CIs; bicubic per-image rows regenerated "
        "bit-identically from the committed config (seeded phantom "
        "generator); beats_bicubic now gates on the clustered interval"
    )
    json.dump(d, open(out, "w"), indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    recluster_r07(
        os.path.join(REPO, "PARITY_r07_256.json"),
        os.path.join(REPO, "PARITY_r07_256_clustered.json"),
    )
    recluster_r08(
        os.path.join(REPO, "PARITY_r08.json"),
        os.path.join(REPO, "PARITY_r08_clustered.json"),
    )
