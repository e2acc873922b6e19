from .transforms import (
    backproject_depth,
    disp_to_depth,
    pixel_grid_homogeneous,
    project_3d,
    rigid_flow,
    rot_from_axisangle,
    transformation_from_parameters,
    translation_matrix,
)
from .extras import flow_match, project_raw_pixels, reduced_ransac, texture_mask
from .losses import berhu, ncc, reprojection_loss, smooth_bright, smooth_loss, smooth_registration, ssim

__all__ = [
    "backproject_depth",
    "disp_to_depth",
    "pixel_grid_homogeneous",
    "project_3d",
    "rigid_flow",
    "rot_from_axisangle",
    "transformation_from_parameters",
    "translation_matrix",
    "berhu",
    "ncc",
    "reprojection_loss",
    "smooth_bright",
    "smooth_loss",
    "smooth_registration",
    "ssim",
    "flow_match",
    "project_raw_pixels",
    "reduced_ransac",
    "texture_mask",
]
