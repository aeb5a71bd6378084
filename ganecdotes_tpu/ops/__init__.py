from ganecdotes_tpu.ops.upfirdn2d import (
    upfirdn2d,
    upfirdn2d_ref,
    make_kernel,
    upsample_2d,
    downsample_2d,
    blur_2d,
)
from ganecdotes_tpu.ops.fused_act import fused_leaky_relu
from ganecdotes_tpu.ops.interp import resize_nearest, resize_bilinear
from ganecdotes_tpu.ops.grid_sample import grid_sample_bilinear
from ganecdotes_tpu.ops.affine_warp import (
    affine_warp,
    affine_warp_exact,
    affine_warp_shear,
    norm_to_pixel_matrix,
)
