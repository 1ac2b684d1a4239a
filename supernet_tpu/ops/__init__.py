"""Moment-propagation primitives (the L0/L1 layer stack of the reference).

Every op maps ``(mu, sigma) -> (mu, sigma)`` where ``mu`` is the mean and
``sigma`` the diagonal (per-element) variance of the activation distribution,
both NHWC. See ``supernet_tpu.ops.moments`` for the math.
"""

from supernet_tpu.ops.moments import (
    vconv_input,
    vconv,
    vconv_relu,
    vconv_input_relu,
    vrelu,
    vmaxpool,
    vunpool,
    vunpool_conv2,
    vpad,
    vcrop_concat,
    vsoftmax,
    crop_center,
    crop_to_match,
    set_backend,
    get_backend,
    set_conv_fold,
    get_conv_fold,
    set_mxu_precision,
    get_mxu_precision,
    set_act_dtype,
    get_act_dtype,
    apply_env_overrides,
)

__all__ = [
    "vconv_input",
    "vconv",
    "vconv_relu",
    "vconv_input_relu",
    "vrelu",
    "set_backend",
    "get_backend",
    "set_conv_fold",
    "get_conv_fold",
    "set_mxu_precision",
    "get_mxu_precision",
    "set_act_dtype",
    "get_act_dtype",
    "apply_env_overrides",
    "vmaxpool",
    "vunpool",
    "vunpool_conv2",
    "vpad",
    "vcrop_concat",
    "vsoftmax",
    "crop_center",
    "crop_to_match",
]
