"""2-D -> 3-D parameter inflation for the volumetric VDP family.

The reference is 2-D-only (it trains on extracted slices —
`Hippocampus.py:55-80`); the volumetric family is net-new. Inflation
lets a trained 2-D slice model initialize the 3-D model — the standard
"inflated convolution" transfer trick from video models (I3D: tile the
2-D kernel along the new depth axis and divide by the depth extent), made
Bayesian here by also mapping the per-channel weight variances:

- mean kernel: ``w_mu3[d] = w_mu2 / k`` for each of the ``k`` depth taps,
  so on a depth-constant input every depth tap contributes ``1/k`` of the
  2-D response and the sum reproduces it exactly;
- raw variance: ``softplus(s3) = softplus(s2) / k`` — the inflated kernel
  draws ``k`` independent weight samples per output tap, and the variance
  of their sum over a depth-constant window is ``k * softplus(s3)``,
  matching the 2-D weight variance exactly.

Both families share one layer-naming scheme and one ``ModelConfig``
(`models.unet.layer_names` / `models.unet3d.layer_names3d`), and the 3-D
skip-concat uses the same decoder-first channel layout as 2-D
(`ops.moments3d.vcrop_concat3d`), so the mapping is name-for-name.

What is exact and what is not (tests/test_inflate.py): on depth-constant
inputs the mean path and the ``softplus(s_w)``-driven variance terms are
exact through conv / relu / pool (the VDP window sums pick up a factor
``k`` that cancels the ``1/k`` variance scaling). The ``conv(sigma,
w_mu^2)`` variance term propagates the input variance through the mean
weights under VDP's diagonal (independent-pixels) assumption; a
depth-replicated input is perfectly depth-correlated, which the diagonal
form cannot represent, so that term comes out ``1/k`` of the 2-D value —
an inherent property of first-order propagation, not of the inflation.
The decoder additionally breaks depth constancy at the first 3-D unpool
(zeros interleave along depth too). Inflation is therefore a transfer
*initialization* — matched mean path, conservatively-scaled uncertainty
— not a function-preserving rewrite of the whole net.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from supernet_tpu.configs import ModelConfig
from supernet_tpu.models.unet import Params, layer_names
from supernet_tpu.models.unet3d import layer_names3d

Array = jax.Array


def softplus_inverse(y: Array) -> Array:
    """x with softplus(x) = y, for y > 0: ``y + log(-expm1(-y))`` (the
    stable form of ``log(expm1(y))`` — no overflow for large y, and the
    log argument tends to y itself for small y)."""
    y = jnp.asarray(y, jnp.float32)
    return y + jnp.log(-jnp.expm1(-y))


def inflate_params3d(params2d: Params, cfg: ModelConfig) -> Params:
    """Inflate a 2-D parameter pytree into the 3-D model's structure for
    the same ``cfg`` (both families derive their layer lists from it).

    Raises if the 2-D tree does not match the config's 2-D layer map —
    inflating a mismatched checkpoint would silently mis-initialize."""
    names2 = {n: (k, ci, co) for n, k, ci, co in layer_names(cfg)}
    out: Params = {}
    for name, k, cin, cout in layer_names3d(cfg):
        if name not in params2d or name not in names2:
            raise ValueError(
                f"layer {name!r} missing from the 2-D checkpoint; "
                "inflation needs a checkpoint trained with the same "
                "ModelConfig (depth/base_kernels/channels)"
            )
        if names2[name] != (k, cin, cout):
            # both families derive their layer maps from one config, so a
            # divergence here is a framework bug, not a user error — but
            # fail loudly rather than inflate mismatched channel groups
            raise ValueError(
                f"layer {name!r}: 2-D layer map {names2[name]} disagrees "
                f"with the 3-D map ({k}, {cin}, {cout})"
            )
        w2 = jnp.asarray(params2d[name]["w_mu"], jnp.float32)
        s2 = jnp.asarray(params2d[name]["w_sigma"], jnp.float32)
        if w2.shape != (k, k, cin, cout) or s2.shape != (cout,):
            raise ValueError(
                f"layer {name!r}: 2-D kernel {w2.shape} / sigma "
                f"{s2.shape} do not match the config's "
                f"({k}, {k}, {cin}, {cout}) / ({cout},)"
            )
        w3 = jnp.tile(w2[None] / k, (k, 1, 1, 1, 1))
        s3 = softplus_inverse(jax.nn.softplus(s2) / k)
        out[name] = {"w_mu": w3, "w_sigma": s3}
    return out
