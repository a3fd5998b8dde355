"""Train state: params + EMA shadow params + optimizer state, as one pytree.

Functional counterpart of the reference's stateful EMA mixin
(lib/models/models.py:730-823) and its `state = {model, optimizer, n_iter}`
dict (train_image.py:55): EMA shadow params live in the state pytree, the
decay ramp min(decay, (1+n)/(10+n)) (models.py:745-751) is applied inside the
jitted step, and "sample with EMA weights" is just passing `ema_params`.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    ema_params: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32
    ema_num_updates: jnp.ndarray  # scalar int32 (ref models.py:750)

    def ema_update(self, new_params, decay: float):
        """Shadow update with the reference's warmup ramp (models.py:745-758)."""
        n = self.ema_num_updates + 1
        d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
        ema = jax.tree.map(
            lambda s, p: s - (1.0 - d) * (s - p), self.ema_params, new_params
        )
        return ema, n


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        params=params,
        ema_params=jax.tree.map(jnp.copy, params),
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        ema_num_updates=jnp.zeros((), jnp.int32),
    )
