from mrisr_tpu.eval.metrics import (
    psnr,
    ssim,
    nmse,
    hfen_laplacian,
    hfen_log,
    compute_mri_metrics,
    MRIEvaluator,
)

__all__ = [
    "psnr",
    "ssim",
    "nmse",
    "hfen_laplacian",
    "hfen_log",
    "compute_mri_metrics",
    "MRIEvaluator",
]
