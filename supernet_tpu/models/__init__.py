from supernet_tpu.models.unet import (
    VDPUNet,
    init_params,
    forward,
    forward_images,
    layer_names,
    kl_regularizer,
)

__all__ = [
    "VDPUNet",
    "init_params",
    "forward",
    "forward_images",
    "layer_names",
    "kl_regularizer",
]
