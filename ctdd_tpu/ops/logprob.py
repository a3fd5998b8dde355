"""Logit → per-dimension log-probability conversions.

Counterpart of reference lib/models/model_utils.py:30-60
(`get_logprob_with_logits`): converts network logits (B, D, S) into
per-dimension log-probs three ways, controlled by `logit_type`:

- "direct":           log_softmax(logits)
- "reverse_prob":     log(softmax(logits) @ q_{t|0} + 1e-35)
- "reverse_logscale": logsumexp(log_softmax(logits)[..., None] + log q_{t|0})

Returns (ll_all (B, D, S), ll_xt (B, D)) where ll_xt gathers the target state.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ctdd_tpu.utils.math import NEG_INF

LOGIT_DIRECT = "direct"
LOGIT_REVERSE_PROB = "reverse_prob"
LOGIT_REVERSE_LOGSCALE = "reverse_logscale"


def logprob_with_logits(
    logit_type: str,
    process,
    xt: jnp.ndarray,
    t: jnp.ndarray,
    logits: jnp.ndarray,
    xt_target: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(ll_all, ll_xt) per model_utils.py:30-60; `process` supplies q_{t|0}."""
    if xt_target is None:
        xt_target = xt
    if logit_type == LOGIT_DIRECT:
        log_prob = jax.nn.log_softmax(logits, axis=-1)
    else:
        qt0 = process.transition(t)  # (B, S, S)
        if logit_type == LOGIT_REVERSE_PROB:
            p0t = jax.nn.softmax(logits, axis=-1)  # (B, D, S)
            prob_all = jnp.einsum(
                "bds,bsk->bdk", p0t, qt0, preferred_element_type=jnp.float32
            )
            log_prob = jnp.log(prob_all + 1e-35)
        elif logit_type == LOGIT_REVERSE_LOGSCALE:
            log_p0t = jax.nn.log_softmax(logits, axis=-1)  # (B, D, S)
            log_qt0 = jnp.where(qt0 <= 1e-35, NEG_INF, jnp.log(qt0 + 1e-35))
            # logsumexp over the x0 axis: (B,D,S,1) + (B,1,S,S) -> (B,D,S)
            log_prob = jax.nn.logsumexp(
                log_p0t[:, :, :, None] + log_qt0[:, None, :, :], axis=-2
            )
        else:
            raise ValueError(f"unknown logit_type {logit_type}")
    ll_xt = jnp.take_along_axis(
        log_prob, xt_target.astype(jnp.int32)[..., None], axis=-1
    )[..., 0]
    return log_prob, ll_xt
