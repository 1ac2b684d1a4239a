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
