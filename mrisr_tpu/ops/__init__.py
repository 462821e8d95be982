from mrisr_tpu.ops.resize import (
    resize2d,
    interpolate_like_torch,
    pil_resize_like,
    gaussian_blur,
    pixel_shuffle,
    pixel_unshuffle,
)
from mrisr_tpu.ops.wavelets import haar_dwt_level, haar_dwt_highpass_sum
from mrisr_tpu.ops.fourier import gaussian_highpass_split

__all__ = [
    "resize2d",
    "interpolate_like_torch",
    "pil_resize_like",
    "gaussian_blur",
    "pixel_shuffle",
    "pixel_unshuffle",
    "haar_dwt_level",
    "haar_dwt_highpass_sum",
    "gaussian_highpass_split",
]
