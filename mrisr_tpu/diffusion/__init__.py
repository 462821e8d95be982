from mrisr_tpu.diffusion.schedules import (
    Schedule,
    linear_betas,
    scaled_linear_betas,
    cosine_betas,
    make_schedule,
    rescale_zero_terminal_snr,
    spaced_timesteps,
)
from mrisr_tpu.diffusion import ddpm, ddim, sr3, res_shift

__all__ = [
    "Schedule",
    "linear_betas",
    "scaled_linear_betas",
    "cosine_betas",
    "make_schedule",
    "rescale_zero_terminal_snr",
    "spaced_timesteps",
    "ddpm",
    "ddim",
    "sr3",
    "res_shift",
]
