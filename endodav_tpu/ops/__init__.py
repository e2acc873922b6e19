from .resize import interp_matrix, resize2d, resize_nchw
from .sampling import (
    flow_consistency,
    flow_to_grid,
    flow_warp,
    forward_splat_occupancy,
    grid_sample,
    occlusion_mask_backward,
)

__all__ = [
    "interp_matrix",
    "resize2d",
    "resize_nchw",
    "flow_consistency",
    "flow_to_grid",
    "flow_warp",
    "forward_splat_occupancy",
    "grid_sample",
    "occlusion_mask_backward",
]
