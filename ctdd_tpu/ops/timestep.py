"""Sinusoidal timestep embeddings and data centering.

Counterparts of reference lib/networks/network_utils.py:7-24
(`transformer_timestep_embedding`, `center_data`), unet.py:223-241
(`TimeEmbedding`, concat order [sin, cos]) and hollow_networks.py:189-201.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def timestep_embedding(
    timesteps: jnp.ndarray, dim: int, max_positions: int = 10000
) -> jnp.ndarray:
    """(B,) -> (B, dim) sinusoidal embedding, [sin, cos] concat order."""
    half = dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-math.log(max_positions) / (half - 1))
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def center_data(x: jnp.ndarray, x_min_max) -> jnp.ndarray:
    """Map integer states in [min, max] to [-1, 1] (network_utils.py:23-24)."""
    lo, hi = x_min_max
    out = (x.astype(jnp.float32) - lo) / (hi - lo)
    return 2.0 * out - 1.0
