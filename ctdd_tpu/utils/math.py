"""Numerics helpers shared across losses / samplers / processes.

Counterparts of reference lib/utils/utils.py:59-133 (log1mexp, expand_dims)
and lib/models/models.py:20-25 (log_minus_exp), re-expressed functionally.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Matches the reference's -1e9 "log of zero" sentinel (losses.py:55 et al.).
NEG_INF = -1e9


def log1mexp(x: jnp.ndarray) -> jnp.ndarray:
    """log(1 - exp(-|x|)), elementwise, numerically stable.

    Counterpart of reference lib/utils/utils.py (used by CatRM 'mle' loss,
    losses.py:804-810). Uses the standard two-regime split at log(2).
    """
    x = -jnp.abs(x)
    return jnp.where(
        x > -0.693147180559945,  # -log(2)
        jnp.log(-jnp.expm1(x)),
        jnp.log1p(-jnp.exp(x)),
    )


def log_minus_exp(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """log(exp(a) - exp(b)) for b < a (reference models.py:20-25)."""
    return a + jnp.log1p(-jnp.exp(b - a) + eps)


def safe_log(p: jnp.ndarray, neg: float = NEG_INF) -> jnp.ndarray:
    """log(p) with p<=0 mapped to a large negative constant (ref losses.py:55)."""
    return jnp.where(p <= 0.0, neg, jnp.log(jnp.where(p <= 0.0, 1.0, p)))


def categorical(key: jax.Array, logits: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Sample categorical indices from (unnormalized) logits along `axis`."""
    return jax.random.categorical(key, logits, axis=axis)


def categorical_from_probs(key: jax.Array, probs: jnp.ndarray) -> jnp.ndarray:
    """Categorical draw from (possibly unnormalized, >=0) probabilities."""
    return jax.random.categorical(key, safe_log(probs), axis=-1)


def mean_cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over all batch/dim positions; logits (..., S), targets (...)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32), axis=-1)
    return -jnp.mean(ll)
