"""D3PM numerics helpers (reference lib/d3pm_utils.py:13-85)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def meanflat(x: jnp.ndarray) -> jnp.ndarray:
    """Mean over all but the leading batch axis."""
    return jnp.mean(x.reshape(x.shape[0], -1), axis=-1)


def log_min_exp(a: jnp.ndarray, b: jnp.ndarray, epsilon: float = 1e-6) -> jnp.ndarray:
    """log(exp(a) - exp(b)) for b < a."""
    return a + jnp.log1p(-jnp.exp(b - a) + epsilon)


def categorical_kl_logits(logits1, logits2, eps: float = 1e-6):
    """KL(Cat(logits1) || Cat(logits2)) per element."""
    p1 = jax.nn.softmax(logits1 + eps, axis=-1)
    return jnp.sum(
        p1
        * (jax.nn.log_softmax(logits1 + eps, axis=-1)
           - jax.nn.log_softmax(logits2 + eps, axis=-1)),
        axis=-1,
    )


def categorical_kl_probs(probs1, probs2, eps: float = 1e-6):
    """KL between categorical probability tensors."""
    return jnp.sum(probs1 * (jnp.log(probs1 + eps) - jnp.log(probs2 + eps)), axis=-1)


def categorical_log_likelihood(x, logits):
    """log p(x) under Cat(logits); x integer classes."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(log_probs, x[..., None].astype(jnp.int32), axis=-1)[
        ..., 0
    ]


def normalize_data(x, mean=128.0, std=128.0):
    return (x - mean) / std
