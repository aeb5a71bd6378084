from ganecdotes_tpu.nn.layers import (
    equal_linear_init,
    equal_linear_apply,
    equal_conv2d_init,
    equal_conv2d_apply,
    pixel_norm,
    conv2d_nhwc,
    conv2d_transpose_nhwc,
    leaky_relu,
)
