"""Fused sigma-chain backward kernel (ops/pallas/sigma_bwd.py, VERDICT r2
#2): forward equality with the XLA winsum*s_w composition and gradient
equality of the custom VJP, in interpreter mode for CPU CI; plus full-vconv
gradient parity with the mode switched on."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supernet_tpu.ops import moments
from supernet_tpu.ops.pallas import sigma_bwd


@pytest.fixture(autouse=True)
def _interpret_and_restore():
    sigma_bwd.set_interpret(True)
    yield
    sigma_bwd.set_interpret(False)
    moments.set_sigma_bwd("xla")


def _xla_ref(sc, s_w, k):
    """The XLA composition winsum_scale replaces: ones-conv * s_w."""
    ones = jnp.ones((k, k, 1, 1), sc.dtype)
    t = jax.lax.conv_general_dilated(
        sc[..., None], ones, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=sc.dtype,
    )[..., 0]
    return t[..., None] * s_w.astype(t.dtype)


@pytest.mark.parametrize("k,h,c", [(3, 10, 8), (2, 9, 4), (3, 37, 16)])
def test_winsum_scale_forward_matches_xla(k, h, c):
    rng = np.random.default_rng(0)
    sc = jnp.asarray(rng.normal(0, 1, (2, h, h)).astype(np.float32))
    s_w = jnp.asarray(rng.uniform(0.01, 0.2, (c,)).astype(np.float32))
    got = sigma_bwd.winsum_scale(sc, s_w, k)
    want = _xla_ref(sc, s_w, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("k,h,c", [(3, 10, 8), (2, 9, 4), (3, 37, 16)])
def test_winsum_scale_grad_matches_xla(k, h, c):
    rng = np.random.default_rng(1)
    sc = jnp.asarray(rng.normal(0, 1, (2, h, h)).astype(np.float32))
    s_w = jnp.asarray(rng.uniform(0.01, 0.2, (c,)).astype(np.float32))
    # a non-uniform downstream loss so every cotangent element differs
    rng2 = np.random.default_rng(2)
    w = jnp.asarray(
        rng2.normal(0, 1, (2, h - k + 1, h - k + 1, c)).astype(np.float32)
    )

    def loss(f):
        def inner(sc_, sw_):
            return jnp.sum(jnp.sin(f(sc_, sw_) * w))

        return inner

    g_sc, g_sw = jax.grad(
        loss(lambda a, b: sigma_bwd.winsum_scale(a, b, k)), argnums=(0, 1)
    )(sc, s_w)
    r_sc, r_sw = jax.grad(
        loss(lambda a, b: _xla_ref(a, b, k)), argnums=(0, 1)
    )(sc, s_w)
    np.testing.assert_allclose(
        np.asarray(g_sc), np.asarray(r_sc), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g_sw), np.asarray(r_sw), rtol=1e-4, atol=1e-5
    )


def test_vconv_grads_match_with_pallas_sigma_bwd():
    """Full vconv + vconv_input value_and_grad parity: sigma_bwd=pallas vs
    xla on the same inputs (the whole layer, not just the winsum term)."""
    rng = np.random.default_rng(3)

    def t(*s):
        return jnp.asarray(rng.normal(0, 1, s).astype(np.float32))

    x = t(2, 12, 12, 3)
    w_mu1 = 0.3 * t(3, 3, 3, 8)
    w_s1 = t(8) - 5.0
    w_mu2 = 0.3 * t(3, 3, 8, 8)
    w_s2 = t(8) - 5.0

    def loss(params):
        wm1, ws1, wm2, ws2 = params
        mu, sg = moments.vconv_input(x, wm1, ws1)
        mu, sg = moments.vrelu(mu, sg)
        mu, sg = moments.vconv(mu, sg, wm2, ws2)
        return jnp.sum(mu * mu) + jnp.sum(jnp.log1p(jnp.abs(sg)))

    params = (w_mu1, w_s1, w_mu2, w_s2)
    moments.set_sigma_bwd("xla")
    v_ref, g_ref = jax.value_and_grad(loss)(params)
    moments.set_sigma_bwd("pallas")
    v_pal, g_pal = jax.value_and_grad(loss)(params)
    assert float(v_pal) == pytest.approx(float(v_ref), rel=1e-6)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
        )


def test_sigma_bwd_mode_knob():
    moments.set_sigma_bwd("pallas")
    assert moments.get_sigma_bwd() == "pallas"
    moments.set_sigma_bwd("xla")
    with pytest.raises(ValueError):
        moments.set_sigma_bwd("bogus")
