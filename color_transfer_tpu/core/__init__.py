from color_transfer_tpu.core.colorspace import (
    srgb_to_linear,
    linear_to_srgb,
    rgb_to_xyz,
    xyz_to_rgb,
    rgb_to_lab,
    lab_to_rgb,
    rgb_to_hsv,
    hsv_to_rgb,
    rgb_to_grayscale,
    rgb_to_yiq,
)
from color_transfer_tpu.core.blur import gaussian_kernel1d, gaussian_blur
from color_transfer_tpu.core.resize import (
    resize_bilinear,
    resize_nearest,
    resize_antialias,
    avg_pool2d,
)
from color_transfer_tpu.core.sampling import grid_sample, flow_warp, coords_grid
from color_transfer_tpu.core.linalg import sqrtm_psd, cov3, solve3

__all__ = [
    "srgb_to_linear",
    "linear_to_srgb",
    "rgb_to_xyz",
    "xyz_to_rgb",
    "rgb_to_lab",
    "lab_to_rgb",
    "rgb_to_hsv",
    "hsv_to_rgb",
    "rgb_to_grayscale",
    "rgb_to_yiq",
    "gaussian_kernel1d",
    "gaussian_blur",
    "resize_bilinear",
    "resize_nearest",
    "resize_antialias",
    "avg_pool2d",
    "grid_sample",
    "flow_warp",
    "coords_grid",
    "sqrtm_psd",
    "cov3",
    "solve3",
]
