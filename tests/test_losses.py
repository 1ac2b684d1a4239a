"""Loss tests (SURVEY.md §4.4): nll_gaussian vs a closed-form NumPy
transliteration of `Hippocampus.py:302-322` (including the log-of-product
vs sum-of-logs identity) and KL regularizer vs the per-layer formula."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supernet_tpu.losses import NLL_EPS, elbo_loss, nll_gaussian
from supernet_tpu.models import init_params, kl_regularizer
from supernet_tpu.configs import HIPPOCAMPUS

RNG = np.random.default_rng(5)


def _ref_nll(y, mu, sigma, eps=NLL_EPS):
    """Direct transliteration of the reference (log of product form)."""
    quad = np.mean(np.sum((mu - y) ** 2 / (sigma + eps), axis=-1))
    if np.isnan(quad) or np.isinf(quad):
        quad = 0.0
    logdet = np.mean(np.log(np.prod(sigma + eps, axis=-1)))
    return 0.5 * (quad + logdet)


def test_nll_matches_reference_form():
    y = RNG.random((2, 50, 3)).astype(np.float32)
    mu = RNG.random((2, 50, 3)).astype(np.float32)
    sigma = (RNG.random((2, 50, 3)).astype(np.float32)) * 0.1 + 0.01
    ours = float(nll_gaussian(jnp.asarray(y), jnp.asarray(mu), jnp.asarray(sigma)))
    ref = _ref_nll(y.astype(np.float64), mu.astype(np.float64),
                   sigma.astype(np.float64))
    assert ours == pytest.approx(ref, rel=1e-5)


def test_nll_stable_where_product_underflows():
    """Sum-of-logs survives where prod(sigma+eps) underflows to 0 in f32."""
    n = 4000  # (1e-3)^4000 underflows any float
    y = np.zeros((1, n, 1), np.float32)
    mu = np.zeros((1, n, 1), np.float32)
    sigma = np.zeros((1, n, 1), np.float32)  # sigma + eps = 1e-3
    val = float(nll_gaussian(jnp.asarray(y), jnp.asarray(mu), jnp.asarray(sigma)))
    want = 0.5 * np.log(1e-3)  # mean over pixels of sum_c log(eps)
    assert val == pytest.approx(want, rel=1e-4)
    # the reference's product form yields -inf here
    assert np.isneginf(np.log(np.prod(np.full(n, 1e-3, np.float32))))


def test_nll_nan_scrub_on_quadratic_term():
    y = jnp.zeros((1, 2, 1))
    mu = jnp.asarray([[[jnp.nan], [0.0]]])
    sigma = jnp.full((1, 2, 1), 0.1)
    val = float(nll_gaussian(y, mu, sigma))
    # quad term scrubbed to 0 -> only the logdet remains
    assert val == pytest.approx(0.5 * np.log(0.1 + NLL_EPS), rel=1e-5)


def test_elbo_loss_composition():
    y = jnp.zeros((1, 4, 2))
    mu = jnp.zeros((1, 4, 2))
    sigma = jnp.full((1, 4, 2), 0.5)
    kl = jnp.asarray(10.0)
    total = float(elbo_loss(y, mu, sigma, kl, kl_factor=1e-3))
    nll = float(nll_gaussian(y, mu, sigma))
    assert total == pytest.approx(nll + 1e-3 * 0.5 * 10.0, rel=1e-6)


def test_kl_regularizer_formula():
    cfg = HIPPOCAMPUS.model
    params = init_params(jax.random.PRNGKey(0), cfg)
    got = float(kl_regularizer(params))
    want = 0.0
    for p in params.values():
        w_mu = np.asarray(p["w_mu"], np.float64)
        ws = np.asarray(p["w_sigma"], np.float64)
        k = w_mu.shape[0]
        f = np.log1p(np.exp(ws))
        want += np.sum(w_mu**2) - k * k * np.mean(1 + np.log(f) - f)
    assert got == pytest.approx(want, rel=1e-4)
