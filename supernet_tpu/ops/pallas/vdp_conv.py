"""Fused VDP convolution as a single Pallas TPU kernel, with a custom VJP.

One kernel invocation computes, in a single HBM pass over ``(mu, sigma)``:

    mu_out  = conv_valid(mu, w_mu)                         (MXU)
    win     = winsum(mu^2 + sigma)                         (VPU + MXU ones-dot)
    sig_out = win * softplus(w_sigma) + conv_valid(sigma, w_mu^2)
    [mu_out, sig_out = relu-masked]                        (optional fusion)

replacing the three separate XLA convolutions + elementwise passes of
``supernet_tpu.ops.moments.vconv`` (which itself replaces the reference's
HBM patch materialization, `Hippocampus.py:178-197`, SURVEY.md §3.5/§7.1).
``win`` is also emitted: it is the residual the backward pass needs for
``d loss / d w_sigma``, so training never recomputes the window sum.

Tiling: grid ``(B, Cout_tiles, H_tiles)``. The H dimension uses
``pl.Element`` indexing so each step reads an overlapping (halo) slab of
``HT + k - 1`` input rows; tail tiles clamp their offset and recompute a few
rows (identical values, harmless overlap). Weights are blocked over Cout for
the 512-channel BraTS bottleneck. When everything fits VMEM the grid
degenerates to ``(B, 1, 1)`` with plain Blocked specs.

The backward pass is hand-derived and runs as XLA convolutions (transposed
convs + filter-gradient convs) — no forward recompute; residuals are the
inputs plus the kernel's own ``win`` output (and the fused-ReLU mask, which
is recoverable from the post-ReLU mean output).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

_DIMSPEC = ("NHWC", "HWIO", "NHWC")

# VMEM working-set budget (bytes) for picking the H tile; Pallas double-
# buffers every blocked operand, which the estimate accounts for.
_VMEM_BUDGET = 10 << 20
_WEIGHT_BUDGET = 4 << 20


def pallas_supported() -> bool:
    """True when the default backend can run compiled Pallas TPU kernels."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


# Compile-safe envelope, established empirically on TPU v5e: Mosaic's
# compile helper crashes on any Element-indexed (halo) spec and on large
# unrolled kernels. The crash tracks the unroll volume ~ taps x output
# area: 9 taps x 60x60 crashes, 9 x 28x28 compiles. Whole-H blocks only.
_MAX_TAP_AREA = 6000


def shape_supported(h: int, w: int, cin: int, cout: int, k: int) -> bool:
    """Whether the fused kernel is known to compile for this layer shape.

    Callers (supernet_tpu.ops.moments) fall back to the XLA composition per
    layer when this is False, so a 'pallas' backend run still covers the
    whole model.
    """
    ht, _ = _pick_tiles(1, h, w, cin, cout, k)
    h_out, w_out = h - k + 1, w - k + 1
    n_h = -(-h_out // ht)
    return n_h == 1 and k * k * h_out * w_out <= _MAX_TAP_AREA


def _conv(x: Array, w: Array, padding, precision: str) -> Array:
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=_DIMSPEC,
        precision=precision,
        preferred_element_type=jnp.float32,
    )


def _pick_tiles(
    b: int, h: int, w: int, cin: int, cout: int, k: int
) -> Tuple[int, int]:
    """(H tile, Cout tile) fitting the VMEM budget. H tile <= H_out."""
    itemsize = 4
    ct = cout if 2 * k * k * cin * cout * itemsize <= _WEIGHT_BUDGET else 128
    ct = min(ct, cout)
    h_out, w_out = h - k + 1, w - k + 1

    def working_set(ht: int) -> int:
        slab = 2 * (ht + k - 1) * w * cin * itemsize  # mu + sigma in
        outs = (2 * ct + 1) * ht * w_out * itemsize  # mu, sigma, win out
        return 2 * (slab + outs)  # double buffering

    ht = h_out
    while ht > 8 and working_set(ht) > _VMEM_BUDGET:
        ht = -(-ht // 2)
    return ht, ct


def _dot3(x: Array, w: Array, precision: str) -> Array:
    """[HT, W', C] x [C, CT] -> [HT, W', CT] on the MXU (2-D reshape form).

    Mosaic's dot lowering only accepts DEFAULT and HIGHEST; 'high' (3-pass
    f32) rounds up to 'highest' inside the kernel.
    """
    ht, wp, c = x.shape
    out = lax.dot_general(
        x.reshape(ht * wp, c),
        w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision="highest" if precision == "high" else precision,
    )
    return out.reshape(ht, wp, w.shape[1])


def _kernel(
    refs,
    *,
    k: int,
    ht: int,
    has_sigma: bool,
    fuse_relu: bool,
    precision: str,
):
    if has_sigma:
        mu_ref, sg_ref, wmu_ref, wsq_ref, sw_ref, muo, sgo, wino = refs
    else:
        mu_ref, wmu_ref, sw_ref, muo, sgo, wino = refs
        sg_ref = wsq_ref = None

    wp = muo.shape[2]  # W_out
    m = mu_ref[0]  # [HT + k - 1, W, Cin]
    s = sg_ref[0] if has_sigma else None
    t = m * m + s if has_sigma else m * m
    ts = jnp.sum(t, axis=-1)  # [HT + k - 1, W]

    acc_mu = jnp.zeros((ht, wp, muo.shape[3]), jnp.float32)
    acc_s2 = jnp.zeros_like(acc_mu) if has_sigma else None
    win = jnp.zeros((ht, wp), jnp.float32)
    for di in range(k):
        for dj in range(k):
            mp = m[di : di + ht, dj : dj + wp, :]
            acc_mu = acc_mu + _dot3(mp, wmu_ref[di, dj], precision)
            if has_sigma:
                sp = s[di : di + ht, dj : dj + wp, :]
                acc_s2 = acc_s2 + _dot3(sp, wsq_ref[di, dj], precision)
            win = win + ts[di : di + ht, dj : dj + wp]

    sw = sw_ref[0]  # [CT]
    sig = win[..., None] * sw[None, None, :]
    if has_sigma:
        sig = sig + acc_s2
    if fuse_relu:
        mask = acc_mu > 0
        acc_mu = jnp.where(mask, acc_mu, 0.0)
        sig = jnp.where(mask, sig, 0.0)
    muo[0] = acc_mu
    sgo[0] = sig
    wino[0] = win[..., None]


def _pallas_forward(
    mu: Array,
    sigma: Optional[Array],
    w_mu: Array,
    w_sigma: Array,
    *,
    fuse_relu: bool,
    precision: str,
    interpret: bool,
) -> Tuple[Array, Array, Array]:
    """Run the fused kernel; returns (mu_out, sigma_out, win)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, cin = mu.shape
    k, cout = w_mu.shape[0], w_mu.shape[3]
    h_out, w_out = h - k + 1, w - k + 1
    has_sigma = sigma is not None

    ht, ct = _pick_tiles(b, h, w, cin, cout, k)
    n_h = -(-h_out // ht)
    n_c = -(-cout // ct)

    w_sq = jnp.square(w_mu)
    sw = jax.nn.softplus(w_sigma).reshape(1, cout)

    vmem = pltpu.VMEM
    if n_h == 1:
        # No halo needed: plain Blocked specs (broadest Mosaic support).
        act_spec = pl.BlockSpec(
            (1, h, w, cin), lambda bi, ci, hi: (bi, 0, 0, 0), memory_space=vmem
        )
        out_spec = pl.BlockSpec(
            (1, h_out, w_out, ct),
            lambda bi, ci, hi: (bi, 0, 0, ci),
            memory_space=vmem,
        )
        win_spec = pl.BlockSpec(
            (1, h_out, w_out, 1),
            lambda bi, ci, hi: (bi, 0, 0, 0),
            memory_space=vmem,
        )
    else:
        # Overlapping (halo) H blocks: Mosaic requires every dim of a spec to
        # be Element-indexed, so the maps return element offsets throughout.
        # Tail tiles clamp their offset and recompute a few rows.
        h_idx = lambda hi: jnp.minimum(hi * ht, h_out - ht)
        act_spec = pl.BlockSpec(
            (
                pl.Element(1),
                pl.Element(ht + k - 1),
                pl.Element(w),
                pl.Element(cin),
            ),
            lambda bi, ci, hi: (bi, h_idx(hi), 0, 0),
            memory_space=vmem,
        )
        out_spec = pl.BlockSpec(
            (pl.Element(1), pl.Element(ht), pl.Element(w_out), pl.Element(ct)),
            lambda bi, ci, hi: (bi, h_idx(hi), 0, ci * ct),
            memory_space=vmem,
        )
        win_spec = pl.BlockSpec(
            (pl.Element(1), pl.Element(ht), pl.Element(w_out), pl.Element(1)),
            lambda bi, ci, hi: (bi, h_idx(hi), 0, 0),
            memory_space=vmem,
        )
    wmu_spec = pl.BlockSpec(
        (k, k, cin, ct), lambda bi, ci, hi: (0, 0, 0, ci), memory_space=vmem
    )
    sw_spec = pl.BlockSpec(
        (1, ct), lambda bi, ci, hi: (0, ci), memory_space=vmem
    )

    if has_sigma:
        in_specs = [act_spec, act_spec, wmu_spec, wmu_spec, sw_spec]
        args = (mu, sigma, w_mu, w_sq, sw)
    else:
        in_specs = [act_spec, wmu_spec, sw_spec]
        args = (mu, w_mu, sw)

    kern = functools.partial(
        _kernel,
        k=k,
        ht=ht,
        has_sigma=has_sigma,
        fuse_relu=fuse_relu,
        precision=precision,
    )

    flops_per_out = 2 * k * k * cin * (2 if has_sigma else 1)
    mu_out, sg_out, win = pl.pallas_call(
        lambda *refs: kern(refs),
        grid=(b, n_c, n_h),
        in_specs=in_specs,
        out_specs=[out_spec, out_spec, win_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, h_out, w_out, cout), jnp.float32),
            jax.ShapeDtypeStruct((b, h_out, w_out, cout), jnp.float32),
            jax.ShapeDtypeStruct((b, h_out, w_out, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=b * h_out * w_out * cout * flops_per_out,
            bytes_accessed=4
            * b
            * (h * w * cin * (2 if has_sigma else 1) + 2 * h_out * w_out * cout),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return mu_out, sg_out, win


def vdp_conv_reference(
    mu: Array,
    sigma: Optional[Array],
    w_mu: Array,
    w_sigma: Array,
    fuse_relu: bool = False,
    precision: str = "highest",
) -> Tuple[Array, Array]:
    """Pure-XLA reference of the fused op (used by tests and as fallback)."""
    from supernet_tpu.ops import moments

    old = moments.get_mxu_precision()
    moments.set_mxu_precision(precision)
    try:
        if sigma is None:
            mu_o, sg_o = moments.vconv_input(mu, w_mu, w_sigma)
        else:
            mu_o, sg_o = moments.vconv(mu, sigma, w_mu, w_sigma)
    finally:
        moments.set_mxu_precision(old)
    if fuse_relu:
        mu_o, sg_o = moments.vrelu(mu_o, sg_o)
    return mu_o, sg_o


# --------------------------------------------------------------- custom VJP


def _bwd_common(
    res,
    cots,
    *,
    k: int,
    has_sigma: bool,
    fuse_relu: bool,
    precision: str,
):
    """Hand-derived VJP: transposed convs + filter-grad convs, one pass."""
    mu, sigma, w_mu, w_sigma, win, mu_out = res
    g1, g2 = cots
    if fuse_relu:
        mask = mu_out > 0
        g1 = jnp.where(mask, g1, 0.0)
        g2 = jnp.where(mask, g2, 0.0)

    sw = jax.nn.softplus(w_sigma)
    full = ((k - 1, k - 1), (k - 1, k - 1))

    # d/d mu and d/d sigma.
    w_flip_t = w_mu[::-1, ::-1].transpose(0, 1, 3, 2)  # [k,k,Co,Ci]
    d_mu = _conv(g1, w_flip_t, full, precision)
    gs = jnp.sum(g2 * sw[None, None, None, :], axis=-1, keepdims=True)
    ones = jnp.ones((k, k, 1, 1), jnp.float32)
    g_win = _conv(gs, ones, full, precision)  # [B,H,W,1]
    d_mu = d_mu + 2.0 * mu * g_win
    if has_sigma:
        w2_flip_t = jnp.square(w_mu)[::-1, ::-1].transpose(0, 1, 3, 2)
        d_sigma = g_win + _conv(g2, w2_flip_t, full, precision)
    else:
        d_sigma = None

    # d/d w_mu: filter-gradient convolutions (N is the contraction axis).
    def filter_grad(x: Array, g: Array) -> Array:
        lhs = x.transpose(3, 1, 2, 0)  # [Ci, H, W, N]
        rhs = g.transpose(1, 2, 0, 3)  # [H', W', N, Co]
        out = _conv(lhs, rhs, "VALID", precision)  # [Ci, k, k, Co]
        return out.transpose(1, 2, 0, 3)

    d_w = filter_grad(mu, g1)
    if has_sigma:
        d_w = d_w + 2.0 * w_mu * filter_grad(sigma, g2)

    # d/d w_sigma through softplus.
    d_sw = jnp.einsum("bhwc,bhwo->c", g2, win)
    d_ws = d_sw * jax.nn.sigmoid(w_sigma)
    return d_mu, d_sigma, d_w, d_ws


@functools.lru_cache(maxsize=None)
def _make_vdp_conv(
    k: int, fuse_relu: bool, has_sigma: bool, precision: str, interpret: bool
):
    """Build (and cache) the custom-VJP fused conv for one static config."""

    if has_sigma:

        @jax.custom_vjp
        def f(mu, sigma, w_mu, w_sigma):
            mu_o, sg_o, _ = _pallas_forward(
                mu,
                sigma,
                w_mu,
                w_sigma,
                fuse_relu=fuse_relu,
                precision=precision,
                interpret=interpret,
            )
            return mu_o, sg_o

        def fwd(mu, sigma, w_mu, w_sigma):
            mu_o, sg_o, win = _pallas_forward(
                mu,
                sigma,
                w_mu,
                w_sigma,
                fuse_relu=fuse_relu,
                precision=precision,
                interpret=interpret,
            )
            return (mu_o, sg_o), (mu, sigma, w_mu, w_sigma, win, mu_o)

        def bwd(res, cots):
            return _bwd_common(
                res,
                cots,
                k=k,
                has_sigma=True,
                fuse_relu=fuse_relu,
                precision=precision,
            )

        f.defvjp(fwd, bwd)
        return f

    @jax.custom_vjp
    def f_in(mu, w_mu, w_sigma):
        mu_o, sg_o, _ = _pallas_forward(
            mu,
            None,
            w_mu,
            w_sigma,
            fuse_relu=fuse_relu,
            precision=precision,
            interpret=interpret,
        )
        return mu_o, sg_o

    def fwd_in(mu, w_mu, w_sigma):
        mu_o, sg_o, win = _pallas_forward(
            mu,
            None,
            w_mu,
            w_sigma,
            fuse_relu=fuse_relu,
            precision=precision,
            interpret=interpret,
        )
        return (mu_o, sg_o), (mu, None, w_mu, w_sigma, win, mu_o)

    def bwd_in(res, cots):
        d_mu, _, d_w, d_ws = _bwd_common(
            res,
            cots,
            k=k,
            has_sigma=False,
            fuse_relu=fuse_relu,
            precision=precision,
        )
        return d_mu, d_w, d_ws

    f_in.defvjp(fwd_in, bwd_in)
    return f_in


def vdp_conv(
    mu: Array,
    sigma: Optional[Array],
    w_mu: Array,
    w_sigma: Array,
    fuse_relu: bool = False,
    precision: str = "highest",
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Fused VDP conv (+ optional ReLU). ``sigma=None`` selects the
    deterministic-input form (the reference's ``myConv_input``).

    The kernel computes in f32 (bf16 compares/selects are rejected by
    this toolchain's Mosaic — see ops/pallas/pool.py); under bf16
    activations the moment tensors are upcast at this boundary and the
    outputs cast back, so the mixed backend composes with
    ``SUPERNET_ACT_DTYPE=bfloat16``.
    """
    import jax.numpy as jnp

    act_dt = mu.dtype
    if act_dt != jnp.float32:
        mu = mu.astype(jnp.float32)
        sigma = sigma.astype(jnp.float32) if sigma is not None else None
    k = w_mu.shape[0]
    f = _make_vdp_conv(k, fuse_relu, sigma is not None, precision, interpret)
    out = f(mu, w_mu, w_sigma) if sigma is None else f(mu, sigma, w_mu, w_sigma)
    if act_dt != jnp.float32:
        out = tuple(o.astype(act_dt) for o in out)
    return out
