"""Analytic FLOP accounting for the VDP U-Net — holds throughput numbers to
the hardware (MFU) instead of free-floating images/sec.

Counts the MXU (matmul/conv) FLOPs of the moment primitives in
``supernet_tpu.ops.moments`` per layer, using the exact geometry chain
recorded by ``models.unet.forward``'s shape tap (the same chain pinned by
tests/test_geometry.py against `Hippocampus.py:375-418` / `Brats.py:379-455`).
Elementwise work (ReLU masks, softplus, adds, the variance scaling) is
excluded, as is standard for MFU accounting.

Per-layer conv FLOP model (1 MAC = 2 FLOPs), per output pixel:

- ``vconv_input`` (moments.py:145): mu conv ``2 k^2 Cin Cout`` + the
  ones-kernel window-sum ``2 k^2`` (channel pre-sum excluded: elementwise).
- ``vconv`` (moments.py:170): mu conv + sigma conv (w_mu^2) =
  ``4 k^2 Cin Cout`` + window-sum ``2 k^2``.
- ``vunpool_conv2`` (moments.py:307): four 1x1 taps for mu and four for
  sigma, each output pixel hit exactly once per moment -> ``4 Cin Cout``.
- head / 1x1 convs follow the ``vconv`` formula with k = 1.

Training-step FLOPs use the standard fwd:bwd = 1:2 estimate (grad wrt
activations + grad wrt weights each cost one forward): ``3x`` forward.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from supernet_tpu.configs import ModelConfig

# bf16 peak TFLOP/s per chip by device_kind substring (public spec sheets).
_PEAK_BF16_TFLOPS = (
    ("v6", 918.0),  # Trillium
    ("v5p", 459.0),
    ("v5e", 197.0),  # v5 litepod
    ("v5", 197.0),
    ("v4", 275.0),
    ("v3", 123.0),
    ("v2", 45.0),
)


def peak_tflops(device=None) -> float:
    """bf16 peak TFLOP/s of ``device`` (default: first visible device); 0.0
    when unknown (non-TPU hosts) so MFU reads as unavailable, never wrong."""
    import os

    env = os.environ.get("SUPERNET_TPU_PEAK_TFLOPS")
    if env:
        return float(env)
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for key, tf in _PEAK_BF16_TFLOPS:
        if key in kind.replace(" ", ""):
            return tf
    return 0.0


def _conv_shapes(cfg: ModelConfig) -> List[Tuple[str, int]]:
    """(layer_name, output_H) for every conv layer via the forward tap,
    without running any compute (jax.eval_shape)."""
    import dataclasses

    from supernet_tpu.models import init_params, layer_names
    from supernet_tpu.models.unet import forward

    cfg_nr = dataclasses.replace(cfg, remat=False)  # remat re-traces blocks
    conv_names = {n for n, *_ in layer_names(cfg_nr)}
    rec: Dict[str, int] = {}

    def tap(name, shape):
        if name in conv_names:
            rec[name] = shape[1]

    params = jax.eval_shape(
        lambda k: init_params(k, cfg_nr), jax.random.PRNGKey(0)
    )
    x = jax.ShapeDtypeStruct(
        (1, cfg.image_size, cfg.image_size, cfg.in_channels), jnp.float32
    )
    jax.eval_shape(lambda p, xx: forward(p, xx, cfg_nr, tap=tap), params, x)
    return [(n, rec[n]) for n, *_ in layer_names(cfg_nr)]


def forward_flops_per_layer(cfg: ModelConfig) -> Dict[str, float]:
    """MXU FLOPs of one forward pass per conv layer, batch size 1."""
    from supernet_tpu.models import layer_names

    shapes = dict(_conv_shapes(cfg))
    out: Dict[str, float] = {}
    for name, k, cin, cout in layer_names(cfg):
        hw = shapes[name] ** 2
        if name == "conv_input":
            f = hw * (2 * k * k * cin * cout + 2 * k * k)
        elif name.endswith("_conv2x2"):
            f = hw * (4 * cin * cout)
        else:  # intermediate vconv (3x3 and the 1x1 head)
            f = hw * (4 * k * k * cin * cout + 2 * k * k)
        out[name] = float(f)
    return out


def forward_flops(cfg: ModelConfig, batch: int = 1) -> float:
    """Total MXU FLOPs of one forward pass at ``batch``."""
    return batch * sum(forward_flops_per_layer(cfg).values())


def train_step_flops(cfg: ModelConfig, batch: int) -> float:
    """One optimizer step: forward + backward ~= 3x forward (standard MFU
    convention); ``cfg.remat`` recomputation is NOT charged (it is overhead,
    not useful work — charging it would flatter MFU)."""
    return 3.0 * forward_flops(cfg, batch)


def mfu(flops_per_second: float, device=None) -> float:
    """Model FLOP utilization vs the chip's bf16 peak; 0.0 if peak unknown."""
    peak = peak_tflops(device)
    if peak <= 0:
        return 0.0
    return flops_per_second / (peak * 1e12)
