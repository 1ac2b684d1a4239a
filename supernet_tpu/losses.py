"""ELBO losses: heteroscedastic Gaussian NLL + KL weight regularization.

Reference: ``nll_gaussian`` (`Hippocampus.py:302-322`) and
``sigma_regularizer`` + l2 (`Hippocampus.py:116,121,325-331`), combined in
``train_on_batch`` as ``nll + kl_factor * 0.5 * sum(model.losses)``
(`Hippocampus.py:520-531`).

Numerical note (SURVEY.md §7.3): the reference computes the log-determinant
term as ``log(prod_c(sigma_c + eps))`` which overflows/underflows trivially;
``sum_c log(sigma_c + eps)`` is algebraically identical and stable, and is
what we use. The NaN/Inf scrub the reference applies to the quadratic term
(`Hippocampus.py:314-315`) is preserved.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

NLL_EPS = 1e-3  # Hippocampus.py:304


def nll_gaussian(y: Array, mu: Array, sigma: Array, eps: float = NLL_EPS) -> Array:
    """Expected Gaussian negative log-likelihood over flattened pixels.

    Args:
      y:     one-hot targets [B, N, C]
      mu:    predictive mean (post-softmax probabilities) [B, N, C]
      sigma: predictive per-class variance [B, N, C] (pre-clipped by caller)

    Matches `Hippocampus.py:302-322`:
      loss1 = mean_{B,N}[ sum_c (mu - y)^2 / (sigma + eps) ]   (NaN/Inf -> 0)
      loss2 = mean_{B,N}[ sum_c log(sigma_c + eps) ]           (stable form)
      nll   = 0.5 * (loss1 + loss2)
    """
    inv = 1.0 / (sigma + eps)
    loss1 = jnp.mean(jnp.sum(jnp.square(mu - y) * inv, axis=-1))
    loss1 = jnp.where(jnp.isnan(loss1) | jnp.isinf(loss1), 0.0, loss1)
    loss2 = jnp.mean(jnp.sum(jnp.log(sigma + eps), axis=-1))
    return 0.5 * (loss1 + loss2)


def elbo_loss(
    y: Array,
    mu: Array,
    sigma: Array,
    kl: Array,
    kl_factor: float,
    sigma_clip_min: float = 1e-12,
    sigma_clip_max: float = 1e3,
) -> Array:
    """Total training loss: clipped-NLL + kl_factor * 0.5 * KL
    (`Hippocampus.py:523-527`)."""
    sigma_c = jnp.clip(sigma, sigma_clip_min, sigma_clip_max)
    return nll_gaussian(y, mu, sigma_c) + kl_factor * 0.5 * kl
