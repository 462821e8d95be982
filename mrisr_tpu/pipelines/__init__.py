from mrisr_tpu.pipelines.sampler import (
    ddpm_sample,
    ddim_sample,
    sr3_ancestral_sample,
    res_shift_sample,
)
from mrisr_tpu.pipelines.resdiff import ResDiffPipeline

__all__ = [
    "ddpm_sample",
    "ddim_sample",
    "sr3_ancestral_sample",
    "res_shift_sample",
    "ResDiffPipeline",
]
