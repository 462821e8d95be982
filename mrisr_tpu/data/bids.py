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
