"""Pure-JAX image operations (NHWC, float in [0,1]).

TPU-native rebuild of the reference's ``src/mon/core/image/`` ops: layout
utilities, resize with divisible-by semantics, colorspace conversions (incl.
HVI), photometry, differentiable filters and geometry helpers. All functions
are jit-/vmap-/grad-compatible and operate on ``(..., H, W, C)`` arrays.
"""

from enhax.ops.layout import (
    get_image_size, make_divisible, pad_to_divisible, unpad, to_4d, to_3d,
    chw_to_hwc, hwc_to_chw, image_local_mean, image_local_variance,
)
from enhax.ops.resize import (
    resize, resize_divisible, resize_align_corners, resize_bicubic_torch,
    resize_nearest_torch, resize_nearest_exact_torch,
)
from enhax.ops.color import (
    rgb_to_grayscale, grayscale_to_rgb, rgb_to_hsv, hsv_to_rgb,
    rgb_to_hvi, hvi_to_rgb, rgb_to_ycbcr, ycbcr_to_rgb, rgb_to_yuv,
    yuv_to_rgb, rgb_to_xyz, xyz_to_rgb, rgb_to_lab, lab_to_rgb,
    rgb_to_hls, hls_to_rgb, rgb_to_linear, linear_to_rgb, rgb_to_sepia,
    rgb_to_luv, luv_to_rgb, bgr_to_rgb, rgb_to_bgr,
)
from enhax.ops.photometry import (
    adjust_gamma, normalize_image, denormalize_image,
    normalize_image_mean_std, denormalize_image_mean_std, scale_gt_mean,
    add_noise,
)
from enhax.ops.geometry import pair_downsample, flip_horizontal, flip_vertical
from enhax.ops.filtering import (
    box_filter, guided_filter, fast_guided_filter,
    fast_guided_filter_bicubic, sobel_filter,
    gaussian_kernel, gaussian_filter,
)
