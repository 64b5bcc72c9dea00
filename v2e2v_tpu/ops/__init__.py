"""Core numerical ops: emulator numerics, voxelization, image utilities, conv cells."""

from .numerics import (
    lin_log,
    lin_log_np,
    rescale_intensity_frame,
    low_pass_filter_step,
    subtract_leak_current,
    softshrink,
)
from .voxel import (
    events_to_voxel_grid_np,
    events_to_voxel_grid,
    event_preprocess_np,
    event_preprocess,
    add_noise_to_voxel,
    voxelize_and_preprocess_np,
)
from .image import (
    normalize_image_percentile,
    normalize_image_minmax_u8,
    optimal_crop_size,
    CropParameters,
)
