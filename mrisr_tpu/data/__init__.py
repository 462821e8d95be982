from mrisr_tpu.data.bids import get_data_dicts, get_data_dicts_artificial
from mrisr_tpu.data.slices import (
    pad_or_center_crop,
    scale_intensity_range,
    clip_to_unit_interval,
    volume_to_slices,
)
from mrisr_tpu.data.degrade import simulate_low_res

__all__ = [
    "get_data_dicts",
    "get_data_dicts_artificial",
    "pad_or_center_crop",
    "scale_intensity_range",
    "clip_to_unit_interval",
    "volume_to_slices",
    "simulate_low_res",
]
