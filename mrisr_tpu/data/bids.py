"""BIDS tree scanners for paired low/high-field MRI.

Native equivalents of the reference scanners:

* :func:`get_data_dicts` — pairs each subject's 64mT T1w with the 3T
  ``sub-XXXX_acq-highres_T1w.nii.gz`` (``slicedMRI/transform_to_2D_slices.py:19-51``).
* :func:`get_data_dicts_artificial` — 3T-only scan where lr == hr path and
  degradation is deferred to the dataset (``src/datasets/mri_datasets.py:8-43``).
"""
from __future__ import annotations

from pathlib import Path


def get_data_dicts(data_dir: str | Path) -> list[dict]:
    data_dir = Path(data_dir)
    lr_dir = data_dir / "64mT data"
    hr_dir = data_dir / "3T data"
    pairs = []
    for subject_dir in sorted(lr_dir.glob("sub-*")):
        subject_id = subject_dir.name
        sess_dirs = sorted(subject_dir.glob("ses-*"))
        if not sess_dirs:
            continue
        anat_dir = sess_dirs[0] / "anat"
        lr_files = sorted(anat_dir.glob("*T1w.nii.gz"))
        if not lr_files:
            continue
        hr_path = hr_dir / subject_id / "anat" / f"{subject_id}_acq-highres_T1w.nii.gz"
        if hr_path.exists():
            pairs.append({"lr": str(lr_files[0]), "hr": str(hr_path), "subject_id": subject_id})
    return pairs


def dataset_stats(data_dir: str | Path) -> dict:
    """Subject/session/run analytics over the paired BIDS trees.

    Native equivalent of the exploration notebook's dataset report
    (``notebooks/dataset.ipynb`` cell 10): subject counts per field
    strength, subject overlap, session/run/acquisition distributions, and
    paired-scan availability.
    """
    data_dir = Path(data_dir)

    def scan(root: Path) -> dict:
        subjects: dict[str, dict] = {}
        for sub in sorted(root.glob("sub-*")):
            sessions = sorted(d.name for d in sub.glob("ses-*"))
            scans = sorted(
                str(f.relative_to(sub)) for f in sub.rglob("*.nii*")
            )
            acqs = sorted(
                {
                    part.split("-", 1)[1]
                    for f in scans
                    for part in Path(f).name.split("_")
                    if part.startswith("acq-")
                }
            )
            runs = sorted(
                {
                    part.split("-", 1)[1]
                    for f in scans
                    for part in Path(f).name.split("_")
                    if part.startswith("run-")
                }
            )
            subjects[sub.name] = {
                "n_sessions": len(sessions),
                "n_scans": len(scans),
                "acquisitions": acqs,
                "runs": runs,
            }
        return subjects

    lf = scan(data_dir / "64mT data")
    hf = scan(data_dir / "3T data")
    both = sorted(set(lf) & set(hf))
    pairs = get_data_dicts(data_dir)
    return {
        "low_field": {"n_subjects": len(lf), "subjects": lf},
        "high_field": {"n_subjects": len(hf), "subjects": hf},
        "overlap": {
            "n_subjects_in_both": len(both),
            "subjects": both,
            "only_low_field": sorted(set(lf) - set(hf)),
            "only_high_field": sorted(set(hf) - set(lf)),
        },
        "paired_scans": len(pairs),
    }


def get_data_dicts_artificial(data_dir: str | Path, modality: str = "T2w") -> list[dict]:
    data_dir = Path(data_dir)
    base = data_dir / "rawdata_BIDS_3T"
    out = []
    for subject_dir in sorted(base.glob("sub-*")):
        files = sorted((subject_dir / "anat").glob(f"*{modality}*.nii*"))
        if not files:
            continue
        prompt = (
            f"high quality MRI scan, {modality} brain slice, 3T field strength, "
            "precise anatomical details, sharp focus, medical imaging"
        )
        out.append(
            {
                "lr": str(files[0]),
                "hr": str(files[0]),
                "txt": prompt,
                "subject_id": subject_dir.name,
            }
        )
    return out
