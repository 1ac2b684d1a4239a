"""Fused sigma-chain backward as a Pallas TPU kernel (VERDICT r2 #2 — the
one untried kernel target).

The variance path of every VDP conv contains the term

    out = winsum(src) * s_w        src = mu^2 + sigma  (or x^2), [B,H,W,C]

where ``winsum`` is a channel sum followed by a k x k ones-kernel VALID conv
(`ops/moments.py:272`) and ``s_w = softplus(w_sigma)`` is per-output-channel.
Its backward under XLA is the dominant *multiply_reduce* trace bucket
(docs/PERFORMANCE.md end-state profile): given the output cotangent ``g``,

    dt   = sum_c g * s_w              [B,H',W']   (channel reduce)
    u    = spread_k(dt)               [B,H,W]     (transposed ones conv)
    dsw  = sum_bhw g * t              [C]         (spatial reduce)

XLA emits dt and dsw as two separate fusions (two full reads of ``g``) plus
the 1-channel spread. This kernel produces ``u`` and per-image ``dsw``
partials in ONE pass over ``g``: read g once, keep dt in VMEM, do the k x k
spread as shifted in-VMEM adds. Everything around it — the channel sum of
``src`` in the forward, and the 2*mu*u / broadcast-add chains in the
backward — intentionally stays in XLA's fusion domain: round 2 measured
that custom-call boundaries which break XLA's elementwise fusions lose
(the pool-kernel lesson, docs/PERFORMANCE.md).

Wrapped as ``winsum_scale(sc, s_w, k)`` with a custom VJP, where ``sc`` is
the channel-summed source ``[B, H, W]`` — its cotangent is the small
``u`` plane, so the ``d src -> (d mu, d sigma)`` chain remains ordinary XLA
elementwise code. Opt-in via ``moments.set_sigma_bwd("pallas")`` /
``SUPERNET_SIGMA_BWD=pallas``.

MEASURED OUTCOME (round 3, v5e, in-process A/B — docs/PERFORMANCE.md
dead-ends table): gradient-exact but LOSES end-to-end at every size
(BraTS b20 −31%, Hippocampus b20 −29%, b256 −82%; BraTS b128 OOMs at
compile — the custom-vjp seam blocks XLA's remat of the fused forward).
Kept in-tree as the documented negative result; the default stays "xla".
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# H'-tile ceiling: VMEM blocks pad the lane dim (C) to 128, so a whole
# BraTS level-0 image block ([186,186,32->128 lanes] bf16 ~= 8.9 MB,
# double-buffered) blows the ~16 MB scoped budget; tiles of <=32 rows with
# an f32 full-plane accumulator (1-channel -> tiny) stay well inside it.
_MAX_TH = 32

_INTERPRET = False


def set_interpret(v: bool) -> None:
    global _INTERPRET
    _INTERPRET = bool(v)


def _bwd_kernel(k: int, th: int, g_ref, t_ref, sw_ref, u_ref, dsw_ref, carry):
    """Grid (B, H_pad/TH). Blocks: g [1,TH,W',C], t [1,TH,W',1], s_w [1,C];
    u [1,TH,W] row-tiles are produced in order using a scratch ``carry`` of
    the previous tile's last k-1 dt rows (rows are zero-padded XLA-side to a
    multiple of TH, so no masking and no dynamic offsets — Mosaic requires
    static-alignment proofs for dynamic sublane starts); dsw [1,1,C] is
    indexed per-image only, stays VMEM-resident across the row tiles, and
    accumulates in place (sequential TPU grid)."""
    j = pl.program_id(1)
    _, _, wp, c = g_ref.shape

    @pl.when(j == 0)
    def _init():
        carry[...] = jnp.zeros_like(carry)  # dt rows above the image are 0
        dsw_ref[0, 0] = jnp.zeros((c,), dsw_ref.dtype)

    g = g_ref[0].astype(jnp.float32)  # [TH, W', C]
    t = t_ref[0, :, :, 0].astype(jnp.float32)  # [TH, W']
    sw = sw_ref[0].astype(jnp.float32)  # [C]
    dt = jnp.sum(g * sw[None, None, :], axis=-1)  # [TH, W']
    dsw_ref[0, 0] += jnp.sum(g * t[:, :, None], axis=(0, 1)).astype(
        dsw_ref.dtype
    )
    # transposed VALID ones-conv, rows: u[r] = sum_di dt[r - di] needs the
    # previous tile's last k-1 dt rows -> dt_ext[m] = dt_global[base-k+1+m]
    dt_ext = jnp.concatenate([carry[...], dt], axis=0)  # [TH+k-1, W']
    rowsum = dt_ext[0:th]
    for s in range(1, k):
        rowsum = rowsum + dt_ext[s : s + th]
    carry[...] = dt[th - (k - 1) :, :]
    # columns: u[., c] = sum_dj rowsum[., c - dj] — static lane shifts
    pad = jnp.zeros((th, k - 1), jnp.float32)
    u = jnp.concatenate([rowsum, pad], axis=1)
    for dj in range(1, k):
        u = u + jnp.concatenate(
            [pad[:, :dj], rowsum, pad[:, dj:]]
            if dj < k - 1
            else [pad, rowsum],
            axis=1,
        )
    u_ref[0] = u.astype(u_ref.dtype)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _bwd_call(
    g: Array, t: Array, s_w: Array, k: int, interpret: bool
) -> Tuple[Array, Array]:
    b, hp, wp, c = g.shape
    h, w = hp + k - 1, wp + k - 1
    # zero-pad rows so u's full extent (hp + k - 1) is covered by aligned
    # TH tiles; zero dt rows below the image reproduce the boundary exactly
    th = _MAX_TH if h >= 2 * _MAX_TH else 8
    hp_pad = th * -(-h // th)
    gz = jnp.pad(g, ((0, 0), (0, hp_pad - hp), (0, 0), (0, 0)))
    tz = jnp.pad(t, ((0, 0), (0, hp_pad - hp), (0, 0)))
    u, dsw = pl.pallas_call(
        functools.partial(_bwd_kernel, k, th),
        grid=(b, hp_pad // th),
        in_specs=[
            pl.BlockSpec((1, th, wp, c), lambda i, j: (i, j, 0, 0)),
            # t rides as [B, Hp, W', 1]: the (8,128)-or-full rule binds the
            # LAST TWO block dims, so the tiled axis must sit 3rd-from-last
            pl.BlockSpec((1, th, wp, 1), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, th, w), lambda i, j: (i, j, 0)),
            # dsw rides as [B, 1, C]: same block rule (full-dim last two)
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hp_pad, w), t.dtype),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((k - 1, wp), jnp.float32)],
        interpret=interpret,
    )(gz, tz[..., None], s_w[None])
    return u[:, :h], jnp.sum(dsw[:, 0], axis=0)


def _winsum_scale_fwd(sc: Array, s_w: Array, k: int):
    out, t = _forward(sc, s_w, k)
    return out, (t, s_w)


def _forward(sc: Array, s_w: Array, k: int) -> Tuple[Array, Array]:
    """out = onesconv_k(sc)[..., None] * s_w; returns (out, t residual).

    ``sc`` [B, H, W] is the channel-summed variance source in the activation
    dtype; the k x k ones conv stays on the MXU exactly as the XLA path's
    ``_window_sum`` (`ops/moments.py:272`)."""
    ones = jnp.ones((k, k, 1, 1), sc.dtype)
    t = lax.conv_general_dilated(
        sc[..., None],
        ones,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=sc.dtype,
    )[..., 0]
    out = t[..., None] * s_w.astype(t.dtype)
    return out, t


def _winsum_scale_bwd(k: int, res, g: Array):
    t, s_w = res
    u, dsw = _bwd_call(g, t, s_w.astype(jnp.float32), k, _INTERPRET)
    return u.astype(t.dtype), dsw.astype(s_w.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def winsum_scale(sc: Array, s_w: Array, k: int) -> Array:
    """``onesconv_k(sc) * s_w`` with the fused Pallas backward.

    sc: [B, H, W] channel-summed variance source; s_w: [C]. Returns
    [B, H-k+1, W-k+1, C]. Numerically identical to the XLA composition in
    forward; backward fuses the two multiply_reduce fusions + spread into
    one pass over the cotangent.
    """
    return _forward(sc, s_w, k)[0]


winsum_scale.defvjp(
    lambda sc, s_w, k: _winsum_scale_fwd(sc, s_w, k)[:2],
    _winsum_scale_bwd,
)
