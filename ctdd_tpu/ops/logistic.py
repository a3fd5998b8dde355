"""Truncated discretized-logistic output head.

Counterpart of reference lib/models/models.py:28-74 (`sample_logistic` and its
method duplicates at models.py:294-299, 395-400, 607-612): maps network (μ,
log s) predictions to S-bin logits by integrating a logistic density over
equal-width bins on [-1, 1], with the PixelCNN++-style min-trick stabilizer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ctdd_tpu.utils.math import log_minus_exp


def logistic_bin_logits(
    mu: jnp.ndarray, log_scale: jnp.ndarray, S: int, fix_logistic: bool
) -> jnp.ndarray:
    """Discretized-logistic logits over S bins (ref models.py:50-74).

    mu/log_scale: (...,) network outputs; returns (..., S) logits.
    The mean is expected to already include the tanh(x + μ') residual bias
    (applied by the caller, ref models.py:181, unet.py:452).
    """
    mu = mu[..., None]
    log_scale = log_scale[..., None]
    inv_scale = jnp.exp(-(log_scale - 2.0))
    bin_width = 2.0 / S
    bin_centers = jnp.linspace(
        -1.0 + bin_width / 2.0, 1.0 - bin_width / 2.0, S, dtype=mu.dtype
    )
    bin_centers = bin_centers.reshape((1,) * (mu.ndim - 1) + (S,))
    sig_in_left = (bin_centers - bin_width / 2.0 - mu) * inv_scale
    bin_left_logcdf = jax.nn.log_sigmoid(sig_in_left)
    sig_in_right = (bin_centers + bin_width / 2.0 - mu) * inv_scale
    bin_right_logcdf = jax.nn.log_sigmoid(sig_in_right)

    logits_1 = log_minus_exp(bin_right_logcdf, bin_left_logcdf)
    if not fix_logistic:
        return logits_1
    logits_2 = log_minus_exp(
        -sig_in_left + bin_left_logcdf, -sig_in_right + bin_right_logcdf
    )
    return jnp.minimum(logits_1, logits_2)
