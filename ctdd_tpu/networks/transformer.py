"""Sequence transformer score network (tauLDR style).

Counterpart of reference lib/networks/tau_networks.py:491-654
(`TransformerEncoderLayer` with post-norm + double FiLM, `FFResidual`,
`TransformerEncoder` with one-hot residual logits add at :647).
Attention uses flax's fused dot-product attention (MXU, bf16-friendly).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ctdd_tpu.networks.common import (
    PositionalEncoding,
    TimeEmbedMLP,
    film,
    normalize_states,
)


class EncoderLayer(nn.Module):
    """Post-norm self-attention block with FiLM after each sub-block
    (tau_networks.py:491-529)."""

    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float
    qk_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, train: bool = False):
        K = self.d_model
        film_params = nn.Dense(2 * K, dtype=self.dtype)(temb)

        sa = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dtype=self.dtype,
            dropout_rate=self.dropout,
            deterministic=not train,
            normalize_qk=self.qk_norm,
        )(x, x)
        sa = nn.Dropout(self.dropout, deterministic=not train)(sa)
        x = nn.LayerNorm(dtype=self.dtype)(x + sa)
        x = film(x, film_params, K)

        ff = nn.Dense(self.dim_feedforward, dtype=self.dtype)(x)
        ff = nn.Dropout(self.dropout, deterministic=not train)(nn.relu(ff))
        ff = nn.Dense(K, dtype=self.dtype)(ff)
        ff = nn.Dropout(self.dropout, deterministic=not train)(ff)
        x = nn.LayerNorm(dtype=self.dtype)(x + ff)
        x = film(x, film_params, K)
        return x


class FFResidual(nn.Module):
    """Residual FF + LayerNorm + FiLM output block (tau_networks.py:532-549)."""

    d_model: int
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        film_params = nn.Dense(2 * self.d_model, dtype=self.dtype)(temb)
        h = nn.Dense(self.hidden, dtype=self.dtype)(x)
        h = nn.Dense(self.d_model, dtype=self.dtype)(nn.relu(h))
        x = nn.LayerNorm(dtype=self.dtype)(x + h)
        return film(x, film_params, self.d_model)


class SequenceTransformer(nn.Module):
    """(B, D) int states + (B,) times -> (B, D, S) logits
    (tau_networks.py:552-654)."""

    S: int
    num_layers: int
    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float
    num_output_FFresiduals: int
    time_scale_factor: float
    temb_dim: int
    use_one_hot_input: bool
    use_cat: bool = True  # categorical input path (one-hot Dense or Embed);
    # False = normalized-scalar Dense (tau_networks.py:616-625 semantics)
    max_len: int = 5000
    # The reference copies the torch transformer-tutorial PositionalEncoding
    # (tau_networks.py:467) but drops the tutorial's `* sqrt(d_model)`
    # embedding scale, leaving the token embedding (std ~1/sqrt(S) at init)
    # ~11x below the unit-scale PE at d_model=128: measured logit sensitivity
    # to the *input tokens* is 0.0016 at init and decays to 0 under training
    # (the marginal/all-rest collapse, docs/DESIGN_NOTES.md). True restores
    # the standard Vaswani scale; False keeps bit-parity with the reference.
    scale_input_embedding: bool = False
    # QK LayerNorm: bounds attention logits so the cross-position pattern
    # can't saturate exactly-local under training (the conditional decode
    # collapse, docs/DESIGN_NOTES.md "the conditioning is dead"). False =
    # reference bit-parity.
    qk_norm: bool = False
    # Auxiliary key-readout head (round-4 conditional-collapse attack): a
    # per-position Dense to `aux_key_classes` logits over the latent key of
    # the sequence (12 major scales for the pianoroll stand-in). The loss
    # reads these at SUFFIX positions only, so minimizing key-CE *requires*
    # prefix->suffix information flow through attention — the exact path the
    # collapse kills. 0 disables the head (reference bit-parity; no extra
    # params).
    aux_key_classes: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray, train: bool = False,
                 return_aux: bool = False):
        B, L = x.shape
        temb = TimeEmbedMLP(
            temb_dim=self.temb_dim,
            hidden=self.dim_feedforward,
            out_dim=4 * self.temb_dim,
            time_scale_factor=self.time_scale_factor,
            dtype=self.dtype,
        )(t)
        one_hot_x = jax.nn.one_hot(x, self.S, dtype=jnp.float32)

        if self.use_cat:
            if self.use_one_hot_input:
                h = nn.Dense(self.d_model, dtype=self.dtype)(
                    one_hot_x.astype(self.dtype)
                )
            else:
                h = nn.Embed(self.S, self.d_model, dtype=self.dtype)(x)
        else:
            h = normalize_states(x, self.S)[:, :, None].astype(self.dtype)
            h = nn.Dense(self.d_model, dtype=self.dtype)(h)

        if self.scale_input_embedding:
            h = h * jnp.sqrt(jnp.float32(self.d_model)).astype(self.dtype)
        h = PositionalEncoding(d_model=self.d_model, max_len=self.max_len)(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)

        for _ in range(self.num_layers):
            h = EncoderLayer(
                d_model=self.d_model,
                num_heads=self.num_heads,
                dim_feedforward=self.dim_feedforward,
                dropout=self.dropout,
                qk_norm=self.qk_norm,
                dtype=self.dtype,
            )(h, temb, train=train)
        for _ in range(self.num_output_FFresiduals):
            h = FFResidual(
                d_model=self.d_model, hidden=self.dim_feedforward, dtype=self.dtype
            )(h, temb)
        logits = nn.Dense(self.S, dtype=jnp.float32)(h)
        out = logits.astype(jnp.float32) + one_hot_x
        if self.aux_key_classes > 0:
            # always create the head when configured (param tree must not
            # depend on return_aux); XLA DCEs the matmul in non-aux traces
            key_logits = nn.Dense(
                self.aux_key_classes, dtype=jnp.float32, name="aux_key_head"
            )(h)
            if return_aux:
                return out, key_logits
        return out
