"""Energy-based score functions.

Counterpart of reference lib/networks/ebm_networks.py: BinaryMLPScoreFunc
(:8-31), BinaryTransformerScoreFunc (:34-57, CLS-token masked-transformer
energy), CatMLPScoreFunc (:60-87). Each maps (x:(B,D), t:(B,)) -> energies
(B,); the EBM losses/samplers tile mutations around these
(ctdd_tpu.losses.losses.ebm_all_mutation_logits / bin_ebm_flip_logits).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ctdd_tpu.networks.hollow import MaskedTransformer
from ctdd_tpu.ops.timestep import timestep_embedding


class BinaryMLPScoreFunc(nn.Module):
    """(:8-31): per-layer temb add + ELU, final scalar head."""

    cfg: object

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        m = self.cfg.model
        hidden = m.mlp_dim
        temb = timestep_embedding(t * m.time_scale_factor, hidden)
        h = x.astype(jnp.float32)
        for _ in range(m.num_layers):
            h = nn.Dense(hidden)(h) + temb
            h = nn.elu(h)
        return nn.Dense(1)(h)[..., 0]


class CatMLPScoreFunc(nn.Module):
    """(:60-87): embed states, flatten, per-layer temb add + SiLU."""

    cfg: object

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        m = self.cfg.model
        hidden = m.mlp_dim
        temb = timestep_embedding(t * m.time_scale_factor, hidden)
        h = nn.Embed(self.cfg.data.S, m.embed_dim)(x)
        h = h.reshape(h.shape[0], -1)
        for _ in range(m.num_layers):
            h = nn.Dense(hidden)(h) + temb
            h = nn.silu(h)
        return nn.Dense(1)(h)[..., 0]


class BinaryTransformerScoreFunc(nn.Module):
    """(:34-57): CLS token (= S) prepended, masked-transformer readout at 0."""

    cfg: object

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        m = self.cfg.model
        temb = timestep_embedding(t * m.time_scale_factor, m.embed_dim)
        B = x.shape[0]
        cls = jnp.full((B, 1), self.cfg.data.S, x.dtype)
        x = jnp.concatenate([cls, x.reshape(B, -1)], axis=1)
        full = MaskedTransformer(self.cfg)(x, temb, train=train)  # (B, D+1, S)
        return full[:, 0, 0]
