"""Shared network building blocks (FiLM conditioning, temb MLPs, norms).

Counterparts of the small blocks scattered through reference
lib/networks/tau_networks.py and hollow_networks.py.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ctdd_tpu.ops.timestep import timestep_embedding


class TimeEmbedMLP(nn.Module):
    """sinusoid(t·scale) -> Linear -> ReLU -> Linear (tau_networks.py:599-603)."""

    temb_dim: int
    hidden: int
    out_dim: int
    time_scale_factor: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        emb = timestep_embedding(t * self.time_scale_factor, self.temb_dim)
        h = nn.Dense(self.hidden, dtype=self.dtype)(emb.astype(self.dtype))
        h = nn.relu(h)
        return nn.Dense(self.out_dim, dtype=self.dtype)(h)


def film(x: jnp.ndarray, params: jnp.ndarray, d: int) -> jnp.ndarray:
    """FiLM: scale/shift a (..., d) tensor with (B, 2d) params.

    Broadcasts over middle axes (ref tau_networks.py:516-519: params[:,None,:K]).
    """
    scale = params[:, :d]
    shift = params[:, d:]
    extra = x.ndim - 2
    scale = scale.reshape(scale.shape[:1] + (1,) * extra + (d,))
    shift = shift.reshape(shift.shape[:1] + (1,) * extra + (d,))
    return scale * x + shift


def normalize_states(x: jnp.ndarray, S: int) -> jnp.ndarray:
    """states [0, S-1] -> [-1, 1] (tau_networks.py:648-651)."""
    return (x.astype(jnp.float32) / (S - 1)) * 2.0 - 1.0


class PositionalEncoding(nn.Module):
    """Fixed sin/cos positional table, interleaved layout (tau_networks.py:467-488)."""

    d_model: int
    max_len: int = 5000

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import numpy as np

        position = np.arange(self.max_len)[:, None]
        div_term = np.exp(
            np.arange(0, self.d_model, 2) * (-np.log(10000.0) / self.d_model)
        )
        pe = np.zeros((self.max_len, self.d_model), np.float32)
        pe[:, 0::2] = np.sin(position * div_term)
        pe[:, 1::2] = np.cos(position * div_term)
        return x + jnp.asarray(pe)[None, : x.shape[1], :]
