"""Fused 2x2/stride-2 VDP max-pool as Pallas TPU kernels (fwd + bwd).

Semantics match ``supernet_tpu.ops.moments.vmaxpool`` exactly (reference:
``mymaxpooling.call`` + ``get_pooled``, `Hippocampus.py:54-64,226-234`):
max-pool the mean, take sigma at the argmax, first-occurrence (row-major)
tie-breaking, and the backward routes both output grads to the selected
window element only.

Why a kernel: in the XLA composition the pool subsystem costs ~10 ms of a
63 ms BraTS train step (compare/select fusions over stride-2 slices plus
6-D interleave copies in the custom VJP), where the pure bandwidth bound
is ~1 ms. A Pallas pair does each direction in one HBM pass:

  fwd: read mu, sigma -> write mu_out, sigma_out, idx (tap index 0..3)
  bwd: read idx, g_mu, g_sigma -> write d_mu, d_sigma

The tap index is the only residual. It is stored in the ACTIVATION dtype
(values 0..3 are exact in bf16/f32) because this toolchain's Mosaic lowers
mixed int8/float block stores poorly; at quarter resolution that residual
is still <=1/8 of either input, so the backward never re-reads the
full-resolution inputs.

Tiling: grid ``(B, H_out/TH)``; input blocks ``[1, 2*TH, W, C]``, output
blocks ``[1, TH, W/2, C]`` — plain Blocked specs only (this toolchain's
Mosaic rejects ``pl.Element``). Stride-2 H access is free (H rows are
vector registers); stride-2 W access is an in-VMEM sublane shuffle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array

# VMEM working-set budget (bytes): blocks are double-buffered by Pallas,
# and the f32 whole-block compute (see kernels) allocates stack
# intermediates on top of the bf16 blocks.
_VMEM_BUDGET = 12 << 20


def _pick_th(h_out: int, w: int, c: int, itemsize: int) -> int:
    """H-out tile: full H when it fits, else halve until within budget."""
    lanes = -(-c // 128) * 128  # lane dim pads to 128 in VMEM

    def ws(th: int) -> int:
        inp = 2 * (2 * th) * w * lanes * itemsize * 2  # dbl-buffered blocks
        out = 3 * th * (w // 2) * lanes * itemsize * 2
        f32 = 8 * (2 * th) * w * lanes * 4  # f32 stack intermediates
        return inp + out + f32

    th = h_out
    while th > 1 and ws(th) > _VMEM_BUDGET:
        th = -(-th // 2)
    return th


def _taps(x: Array):
    """Four 2x2-window taps of a [2TH, W, C] block, row-major order.

    Strided slices lower to gathers in Mosaic (unsupported); a reshape
    splitting H and W by 2 plus integer indexing lowers to sublane
    shuffles instead."""
    t2, w, c = x.shape
    r = x.reshape(t2 // 2, 2, w // 2, 2, c)
    return r[:, 0, :, 0], r[:, 0, :, 1], r[:, 1, :, 0], r[:, 1, :, 1]


def _pool_fwd_kernel(mu_ref, sg_ref, mx_ref, so_ref, idx_ref):
    # whole-block f32 compute: bf16 compares/selects crash this
    # toolchain's Mosaic ("Target does not support this comparison" /
    # compile-helper aborts); HBM blocks stay bf16, only VMEM is f32.
    dt = mu_ref.dtype
    mu = mu_ref[0].astype(jnp.float32)
    sg = sg_ref[0].astype(jnp.float32)
    m00, m01, m10, m11 = _taps(mu)
    s00, s01, s10, s11 = _taps(sg)
    mx = jnp.maximum(jnp.maximum(m00, m01), jnp.maximum(m10, m11))
    # first-occurrence (row-major) selection — TF's argmax tie rule
    p0 = m00 == mx
    p1 = jnp.logical_and(jnp.logical_not(p0), m01 == mx)
    p01 = jnp.logical_or(p0, p1)
    p2 = jnp.logical_and(jnp.logical_not(p01), m10 == mx)
    so = jnp.where(p0, s00, jnp.where(p1, s01, jnp.where(p2, s10, s11)))
    idx = jnp.where(
        p0,
        jnp.float32(0),
        jnp.where(p1, jnp.float32(1), jnp.where(p2, jnp.float32(2), jnp.float32(3))),
    )
    mx_ref[0] = mx.astype(dt)
    so_ref[0] = so.astype(dt)
    idx_ref[0] = idx.astype(dt)


def _interleave(t00: Array, t01: Array, t10: Array, t11: Array) -> Array:
    """[TH, w, C] x4 -> [2TH, 2w, C] pixel shuffle (in-VMEM)."""
    th, w, c = t00.shape
    top = jnp.stack([t00, t01], axis=2).reshape(th, 2 * w, c)
    bot = jnp.stack([t10, t11], axis=2).reshape(th, 2 * w, c)
    return jnp.stack([top, bot], axis=1).reshape(2 * th, 2 * w, c)


def _pool_bwd_kernel(idx_ref, gm_ref, gs_ref, dm_ref, ds_ref):
    # whole-block f32 compute (see fwd kernel)
    dt = gm_ref.dtype
    idx = idx_ref[0].astype(jnp.float32)
    gm = gm_ref[0].astype(jnp.float32)
    gs = gs_ref[0].astype(jnp.float32)
    zero = jnp.zeros_like(gm)
    masks = [idx == jnp.float32(k) for k in range(4)]
    dm_ref[0] = _interleave(*[jnp.where(m, gm, zero) for m in masks]).astype(dt)
    ds_ref[0] = _interleave(*[jnp.where(m, gs, zero) for m in masks]).astype(dt)


# interpret=True runs the kernels in the Pallas interpreter (CPU tests);
# set via set_interpret() before the first trace.
_INTERPRET = False


def set_interpret(v: bool) -> None:
    global _INTERPRET
    _INTERPRET = bool(v)


@functools.partial(jax.jit, static_argnames=("th", "interpret"))
def _pool_fwd_call(mu: Array, sigma: Array, th: int, interpret: bool):
    b, h, w, c = mu.shape
    ho, wo = h // 2, w // 2
    grid = (b, ho // th)
    in_spec = pl.BlockSpec((1, 2 * th, w, c), lambda i, j: (i, j, 0, 0))
    out_spec = pl.BlockSpec((1, th, wo, c), lambda i, j: (i, j, 0, 0))
    return pl.pallas_call(
        _pool_fwd_kernel,
        grid=grid,
        in_specs=[in_spec, in_spec],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, ho, wo, c), mu.dtype),
            jax.ShapeDtypeStruct((b, ho, wo, c), sigma.dtype),
            jax.ShapeDtypeStruct((b, ho, wo, c), mu.dtype),
        ],
        interpret=interpret,
    )(mu, sigma)


@functools.partial(jax.jit, static_argnames=("th", "interpret"))
def _pool_bwd_call(idx: Array, g_mu: Array, g_sigma: Array, th: int, interpret: bool):
    b, ho, wo, c = idx.shape
    grid = (b, ho // th)
    in_spec = pl.BlockSpec((1, th, wo, c), lambda i, j: (i, j, 0, 0))
    out_spec = pl.BlockSpec((1, 2 * th, 2 * wo, c), lambda i, j: (i, j, 0, 0))
    return pl.pallas_call(
        _pool_bwd_kernel,
        grid=grid,
        in_specs=[in_spec, in_spec, in_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, 2 * ho, 2 * wo, c), g_mu.dtype),
            jax.ShapeDtypeStruct((b, 2 * ho, 2 * wo, c), g_sigma.dtype),
        ],
        interpret=interpret,
    )(idx, g_mu, g_sigma)


def pool_shape_supported(h: int, w: int) -> bool:
    """Even spatial dims only (all reference pool inputs are even); odd
    sizes fall back to the XLA composition."""
    return h % 2 == 0 and w % 2 == 0


@jax.custom_vjp
def vmaxpool_pallas(mu: Array, sigma: Array):
    (mx, so), _ = _vmp_fwd(mu, sigma)
    return mx, so


def _vmp_fwd(mu: Array, sigma: Array):
    b, h, w, c = mu.shape
    th = _pick_th(h // 2, w, c, mu.dtype.itemsize)
    # tile must divide H_out exactly (Blocked specs recompute otherwise)
    while (h // 2) % th:
        th -= 1
    mx, so, idx = _pool_fwd_call(mu, sigma, th, _INTERPRET)
    return (mx, so), idx


def _vmp_bwd(idx, g):
    g_mu, g_sigma = g
    b, ho, wo, c = idx.shape
    th = _pick_th(ho, 2 * wo, c, g_mu.dtype.itemsize)
    while ho % th:
        th -= 1
    d_mu, d_sigma = _pool_bwd_call(idx, g_mu, g_sigma, th, _INTERPRET)
    return d_mu, d_sigma


vmaxpool_pallas.defvjp(_vmp_fwd, _vmp_bwd)
