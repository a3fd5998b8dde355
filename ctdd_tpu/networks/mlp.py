"""Residual MLP score network.

Counterpart of reference lib/networks/tau_networks.py:657-730 (`ResidualMLP`):
normalize states -> Dense(D->d_model) -> num_layers × [residual FF + LayerNorm
+ FiLM(temb)] -> Dense(d_model -> D·S) -> + one_hot(x) residual bias.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ctdd_tpu.networks.common import TimeEmbedMLP, normalize_states


class ResidualMLP(nn.Module):
    D: int
    S: int
    num_layers: int
    d_model: int
    hidden_dim: int
    time_scale_factor: float
    temb_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray, train: bool = False):
        B, D = x.shape
        temb = TimeEmbedMLP(
            temb_dim=self.temb_dim,
            hidden=self.hidden_dim,
            out_dim=4 * self.temb_dim,
            time_scale_factor=self.time_scale_factor,
            dtype=self.dtype,
        )(t)
        one_hot_x = jax.nn.one_hot(x, self.S, dtype=jnp.float32)

        h = normalize_states(x, self.S).astype(self.dtype)
        h = nn.Dense(self.d_model, dtype=self.dtype)(h)
        for _ in range(self.num_layers):
            resid = nn.Dense(self.hidden_dim, dtype=self.dtype)(h)
            resid = nn.Dense(self.d_model, dtype=self.dtype)(nn.relu(resid))
            h = nn.LayerNorm(dtype=self.dtype)(h + resid)
            film_params = nn.Dense(2 * self.d_model, dtype=self.dtype)(temb)
            h = film_params[:, : self.d_model] * h + film_params[:, self.d_model :]
        h = nn.Dense(self.D * self.S, dtype=self.dtype)(h)
        logits = h.reshape(B, D, self.S).astype(jnp.float32) + one_hot_x
        return logits
