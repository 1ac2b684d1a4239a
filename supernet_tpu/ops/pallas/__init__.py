"""Fused Pallas TPU kernels for the VDP moment-propagation hot path.

The reference's hot inner path materializes ``[B, H'W', k^2*C]`` patch
matrices in HBM for every conv (SURVEY.md §3.5, `Brats.py:118-137`). The
XLA fallback (`supernet_tpu.ops.moments`) already reduces that to three
convolutions, but they remain three separate HBM round trips. The kernels
here compute the mean conv, both variance terms and (optionally) the
following ReLU in ONE pass: ``mu`` and ``sigma`` are read from HBM exactly
once and both output moments are written exactly once.
"""

from supernet_tpu.ops.pallas.vdp_conv import (
    vdp_conv,
    vdp_conv_reference,
    pallas_supported,
)

__all__ = ["vdp_conv", "vdp_conv_reference", "pallas_supported"]
