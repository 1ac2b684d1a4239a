from supernet_tpu.models.unet import (
    VDPUNet,
    init_params,
    forward,
    forward_images,
    forward_sampled,
    sample_weights,
    layer_names,
    kl_regularizer,
)

__all__ = [
    "VDPUNet",
    "init_params",
    "forward",
    "forward_images",
    "forward_sampled",
    "sample_weights",
    "layer_names",
    "kl_regularizer",
]

from supernet_tpu.models.unet3d import (  # noqa: E402
    forward3d,
    forward_sampled3d,
    init_params3d,
    kl_regularizer3d,
    layer_names3d,
)

__all__ += [
    "forward3d",
    "forward_sampled3d",
    "init_params3d",
    "kl_regularizer3d",
    "layer_names3d",
]

from supernet_tpu.models.inflate import (  # noqa: E402
    inflate_params3d,
    softplus_inverse,
)

__all__ += [
    "inflate_params3d",
    "softplus_inverse",
]
