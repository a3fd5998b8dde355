"""Hollow / masked / enumerative transformers (SDDM family).

Counterpart of reference lib/networks/hollow_networks.py (1248 LoC):

- UniDirectionalTransformer (:497-568): causal towers over shifted inputs —
  l2r prepends the time token and drops the last position (triu -inf mask),
  r2l appends it and drops the first (tril mask).
- BidirectionalTransformer (:577-665) / BidirectionalTransformer2 (:668-755):
  two towers + readout; v1 learns an MLP of a half-width sinusoid, v2 uses
  the raw full-width sinusoid.
- Readouts: ConcatReadout (:64-87), ResidualReadout (:90-132, FiLM),
  ConcatResidualReadout (:135-186), AttentionReadout+CrossAttention
  (:204-308) with the joint [t | causal | anti-causal] key mask.
- TransformerEncoder (:450-493): prepends the time token, strips it after.
- MaskedTransformer (:859-914): S+1 mask vocab, readout at one position.
- EnumerativeTransformer (:917-960): the reference's python loop over D
  positions becomes an nn.scan over positions (sequential, memory-safe) —
  one compiled step reused D times.
- BertEnumTransformer (:963-1031): single-pass Bert-style enum.
- PrefixConditionalBidirTransformer (:1035-1133).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ctdd_tpu.networks.common import PositionalEncoding
from ctdd_tpu.ops.logistic import logistic_bin_logits
from ctdd_tpu.ops.timestep import timestep_embedding

xavier = nn.initializers.xavier_uniform()


def normalize_input(x, S):
    return (x.astype(jnp.float32) / (S - 1)) * 2.0 - 1.0


class MLP(nn.Module):
    """Plain MLP with GELU between layers (hollow_networks.py:31-53)."""

    features: tuple

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f)(x)
            if i != len(self.features) - 1:
                x = nn.gelu(x)
        return x


def apply_film(film_params, x):
    """(B, 4E) params -> scale/shift a (B, K, 2E) tensor (:56-61)."""
    a, b = jnp.split(film_params[:, None, :], 2, axis=-1)
    return a * x + b


class TransformerMlpBlock(nn.Module):
    """Dense->ReLU->Dropout->Dense(no bias)->Dropout, xavier init (:343-392)."""

    mlp_dim: int
    embed_dim: int
    dropout_rate: float
    out_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.mlp_dim, kernel_init=xavier)(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(nn.relu(x))
        x = nn.Dense(
            self.out_dim or self.embed_dim, use_bias=False, kernel_init=xavier
        )(x)
        return nn.Dropout(self.dropout_rate, deterministic=not train)(x)


class SelfAttentionBlock(nn.Module):
    """Pre/post-norm self-attention with additive mask (:311-340)."""

    embed_dim: int
    num_heads: int
    attention_dropout_rate: float
    dropout_rate: float
    norm_type: str

    @nn.compact
    def __call__(self, inputs, mask, train: bool = False):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dropout_rate=self.attention_dropout_rate,
            deterministic=not train,
        )
        attn_mask = None
        if mask is not None:
            # additive -inf mask -> boolean keep-mask broadcast over heads
            attn_mask = (mask == 0.0)[None, None, :, :]
        if self.norm_type == "prenorm":
            x = nn.LayerNorm()(inputs)
            x = attn(x, x, mask=attn_mask)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
            return x + inputs
        elif self.norm_type == "postnorm":
            x = attn(inputs, inputs, mask=attn_mask)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
            return nn.LayerNorm()(x + inputs)
        raise ValueError(self.norm_type)


class FeedForwardBlock(nn.Module):
    """(:395-420)."""

    embed_dim: int
    mlp_dim: int
    dropout_rate: float
    norm_type: str

    @nn.compact
    def __call__(self, x, train: bool = False):
        mlp = TransformerMlpBlock(
            mlp_dim=self.mlp_dim,
            embed_dim=self.embed_dim,
            dropout_rate=self.dropout_rate,
        )
        if self.norm_type == "prenorm":
            return x + mlp(nn.LayerNorm()(x), train=train)
        elif self.norm_type == "postnorm":
            return nn.LayerNorm()(x + mlp(x, train=train))
        raise ValueError(self.norm_type)


class TransformerBlock(nn.Module):
    """(:423-447)."""

    embed_dim: int
    num_heads: int
    mlp_dim: int
    attention_dropout_rate: float
    dropout_rate: float
    norm_type: str

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        x = SelfAttentionBlock(
            self.embed_dim, self.num_heads, self.attention_dropout_rate,
            self.dropout_rate, self.norm_type,
        )(x, mask, train=train)
        return FeedForwardBlock(
            self.embed_dim, self.mlp_dim, self.dropout_rate, self.norm_type
        )(x, train=train)


def _blocks_from_cfg(cfg, n=None):
    m = cfg.model
    return [
        TransformerBlock(
            embed_dim=m.embed_dim,
            num_heads=m.num_heads,
            mlp_dim=m.mlp_dim,
            attention_dropout_rate=m.attention_dropout_rate,
            dropout_rate=m.dropout_rate,
            norm_type=m.transformer_norm_type,
        )
        for _ in range(n or m.num_layers)
    ]


class UniDirectionalTransformer(nn.Module):
    """Causal tower over shifted inputs (:497-568)."""

    cfg: object
    direction: str  # 'l2r' | 'r2l'

    @nn.compact
    def __call__(self, x, temb, conditioner=None, train: bool = False):
        m = self.cfg.model
        temb = temb[:, None, :]
        cond = temb if conditioner is None else jnp.concatenate(
            [conditioner, temb], axis=1
        )
        concat_dim = x.shape[1] + cond.shape[1] - 1
        if self.direction == "l2r":
            x = jnp.concatenate([cond, x[:, :-1]], axis=1)
            mask = jnp.triu(
                jnp.full((concat_dim, concat_dim), -jnp.inf), k=1
            )
        else:
            x = jnp.concatenate([x[:, 1:], cond], axis=1)
            mask = jnp.tril(
                jnp.full((concat_dim, concat_dim), -jnp.inf), k=-1
            )
        x = PositionalEncoding(d_model=m.embed_dim, max_len=concat_dim)(x)
        x = nn.Dropout(m.dropout_rate, deterministic=not train)(x)
        for blk in _blocks_from_cfg(self.cfg):
            x = blk(x, mask, train=train)
        return x


class ConcatReadout(nn.Module):
    """(:64-87)."""

    cfg: object
    readout_dim: int = 0

    @nn.compact
    def __call__(self, l2r_embed, r2l_embed, temb, train: bool = False):
        out_dim = self.readout_dim or self.cfg.data.S
        state = jnp.concatenate([l2r_embed, r2l_embed], axis=-1)
        return MLP((self.cfg.model.mlp_dim, out_dim))(state)


class ResidualReadout(nn.Module):
    """FiLM residual readout (:90-132); input (B, K, E) -> (B, K, out)."""

    cfg: object
    readout_dim: int = 0
    input_is_2e: bool = False  # ConcatResidualReadout skips the input layer

    @nn.compact
    def __call__(self, x, temb, train: bool = False):
        m = self.cfg.model
        E = m.embed_dim
        out_dim = self.readout_dim or self.cfg.data.S
        temb = MLP((m.mlp_dim, 4 * E))(temb)
        if not self.input_is_2e:
            x = nn.Dense(2 * E)(x)
        for _ in range(m.num_output_ffresiduals):
            film_params = nn.Dense(4 * E)(temb)
            z = MLP((m.mlp_dim, 2 * E))(x)
            x = nn.LayerNorm()(x + z)
            x = apply_film(film_params, x)
        return nn.Dense(out_dim)(x)


class ConcatResidualReadout(nn.Module):
    """(:135-186)."""

    cfg: object
    readout_dim: int = 0

    @nn.compact
    def __call__(self, l2r_embed, r2l_embed, temb, train: bool = False):
        x = jnp.concatenate([l2r_embed, r2l_embed], axis=-1)
        return ResidualReadout(
            self.cfg, readout_dim=self.readout_dim, input_is_2e=True
        )(x, temb, train=train)


class CrossAttention(nn.Module):
    """Query from l2r+r2l; keys/vals from [temb | l2r | r2l] with the joint
    causal/anti-causal key mask (:204-280)."""

    cfg: object

    @nn.compact
    def __call__(self, l2r_embed, r2l_embed, temb):
        m = self.cfg.model
        num_heads = m.num_heads
        head_dim = m.qkv_dim // num_heads
        L = l2r_embed.shape[1]
        temb_tok = temb[:, None, :]

        query = nn.Dense(num_heads * head_dim, use_bias=False)(
            l2r_embed + r2l_embed
        )
        all_embed = jnp.concatenate([temb_tok, l2r_embed, r2l_embed], axis=1)
        key = nn.Dense(num_heads * head_dim)(all_embed)
        val = nn.Dense(num_heads * head_dim)(all_embed)

        B = query.shape[0]
        query = query.reshape(B, L, num_heads, head_dim) / jnp.sqrt(
            jnp.float32(head_dim)
        )
        key = key.reshape(B, 2 * L + 1, num_heads, head_dim)
        val = val.reshape(B, 2 * L + 1, num_heads, head_dim)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", query, key, preferred_element_type=jnp.float32
        )

        idx = jnp.arange(L)
        att_l2r = idx[:, None] >= idx[None, :]  # keep at or before diag
        att_r2l = idx[:, None] <= idx[None, :]  # keep at or after diag
        att_t = jnp.ones((L, 1), bool)
        joint = jnp.concatenate([att_t, att_l2r, att_r2l], axis=-1)  # (L, 2L+1)
        logits = jnp.where(
            joint[None, None, :, :], logits, jnp.finfo(logits.dtype).min
        )
        w = jax.nn.softmax(logits, axis=-1)
        x = jnp.einsum("bhqk,bkhd->bqhd", w, val)
        x = x.reshape(B, L, num_heads * head_dim)
        return nn.Dense(m.embed_dim)(x)


class AttentionReadout(nn.Module):
    """(:283-308)."""

    cfg: object
    readout_dim: int = 0

    @nn.compact
    def __call__(self, l2r_embed, r2l_embed, temb, train: bool = False):
        inputs = l2r_embed + r2l_embed
        if self.cfg.model.transformer_norm_type == "prenorm":
            l2r_embed = nn.LayerNorm()(l2r_embed)
            r2l_embed = nn.LayerNorm()(r2l_embed)
            x = CrossAttention(self.cfg)(l2r_embed, r2l_embed, temb) + inputs
        else:
            x = CrossAttention(self.cfg)(l2r_embed, r2l_embed, temb) + inputs
            x = nn.LayerNorm()(x)
        return ResidualReadout(self.cfg, readout_dim=self.readout_dim)(
            x, temb, train=train
        )


def _readout(cfg, readout_dim):
    kind = cfg.model.bidir_readout
    if kind == "concat":
        return ConcatReadout(cfg, readout_dim=readout_dim)
    if kind == "res_concat":
        return ConcatResidualReadout(cfg, readout_dim=readout_dim)
    if kind == "attention":
        return AttentionReadout(cfg, readout_dim=readout_dim)
    raise ValueError(f"unknown bidir_readout {kind}")


class _InputEmbed(nn.Module):
    """use_cat/one-hot/normalized-scalar input embedding (:616-625)."""

    cfg: object
    vocab_extra: int = 0

    @nn.compact
    def __call__(self, x):
        m = self.cfg.model
        S = self.cfg.data.S + self.vocab_extra
        if m.use_cat:
            if m.use_one_hot_input:
                return nn.Dense(m.embed_dim)(jax.nn.one_hot(x, S))
            return nn.Embed(S, m.embed_dim)(x)
        h = normalize_input(x, self.cfg.data.S)[..., None]
        return nn.Dense(m.embed_dim)(h)


class BidirectionalTransformer(nn.Module):
    """Two causal towers + readout (:577-665 v1, :668-755 v2)."""

    cfg: object
    readout_dim: Optional[int] = None
    learned_temb: bool = True  # v1; False = v2 (raw sinusoid)

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        m = self.cfg.model
        E = m.embed_dim
        rd = self.readout_dim if self.readout_dim is not None else self.cfg.data.S
        if self.learned_temb:
            temb = MLP((m.mlp_dim, E))(
                timestep_embedding(t * m.time_scale_factor, E // 2)
            )
        else:
            temb = timestep_embedding(t * m.time_scale_factor, E)
        x_embed = _InputEmbed(self.cfg)(x)
        l2r = UniDirectionalTransformer(self.cfg, "l2r")(x_embed, temb, train=train)
        r2l = UniDirectionalTransformer(self.cfg, "r2l")(x_embed, temb, train=train)
        logits = _readout(self.cfg, rd)(l2r, r2l, temb, train=train)
        return logits


class TransformerEncoderH(nn.Module):
    """Encoder that prepends the time token and strips it after (:450-493)."""

    cfg: object
    vocab_extra: int = 1  # pos table sized concat_dim + 1 (+2 if is_ebm)

    @nn.compact
    def __call__(self, x_embed, temb, conditioner=None, train: bool = False):
        m = self.cfg.model
        temb_tok = temb[:, None, :]
        cond = temb_tok if conditioner is None else jnp.concatenate(
            [conditioner, temb_tok], axis=1
        )
        x = jnp.concatenate([cond, x_embed], axis=1)
        max_len = m.concat_dim + (2 if m.get("is_ebm", False) else 1)
        x = PositionalEncoding(d_model=m.embed_dim, max_len=max(max_len, x.shape[1]))(x)
        x = nn.Dropout(m.dropout_rate, deterministic=not train)(x)
        for blk in _blocks_from_cfg(self.cfg):
            x = blk(x, None, train=train)
        return x[:, 1:]


class MaskedTransformer(nn.Module):
    """S+1 mask-vocab transformer with positional readout (:859-914).

    Returns the FULL (B, D, S) readout; callers gather the position(s) they
    need (the reference gathers inside, but the full readout costs the same
    under XLA and lets the enumerative wrapper batch positions).
    """

    cfg: object

    @nn.compact
    def __call__(self, x, temb, train: bool = False):
        m = self.cfg.model
        x_embed = _InputEmbed(self.cfg, vocab_extra=1)(x)
        embed = TransformerEncoderH(self.cfg)(x_embed, temb, train=train)
        if m.readout == "mlp":
            return MLP((m.mlp_dim, self.cfg.data.S))(embed)
        elif m.readout == "resnet":
            return ResidualReadout(self.cfg)(embed, temb, train=train)
        raise ValueError(f"unknown readout {m.readout}")


class EnumerativeTransformer(nn.Module):
    """Mask each position in turn, read out its logits (:917-960).

    The reference's host loop over D positions (hollow_networks.py:945-952)
    becomes an nn.scan over the position axis: one compiled step, params
    broadcast, executed D times on-device.
    """

    cfg: object

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        m = self.cfg.model
        S = self.cfg.data.S
        temb = timestep_embedding(t * m.time_scale_factor, m.embed_dim)
        B, D = x.shape
        prefix_cond = m.get("conditional_dim", 0)
        positions = jnp.arange(prefix_cond, D)

        class _Step(nn.Module):
            cfg: object

            @nn.compact
            def __call__(self, carry, pos):
                x, temb = carry
                x_masked = jnp.where(
                    jnp.arange(x.shape[1])[None, :] == pos, S, x
                )
                full = MaskedTransformer(self.cfg)(x_masked, temb, train=train)
                logit = jnp.take_along_axis(
                    full, jnp.full((x.shape[0], 1, 1), pos, jnp.int32), axis=1
                )[:, 0, :]
                return carry, logit

        scan = nn.scan(
            _Step,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=0,
            out_axes=0,
        )(self.cfg)
        _, logits = scan((x, temb), positions)  # (D', B, S)
        logits = jnp.transpose(logits, (1, 0, 2))
        if prefix_cond:
            dummy = jnp.zeros((B, prefix_cond, S), jnp.float32)
            logits = jnp.concatenate([dummy, logits], axis=1)
        return logits


class BertEnumTransformer(nn.Module):
    """Single-pass Bert-style enum transformer (:963-1031)."""

    cfg: object

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        m = self.cfg.model
        temb = timestep_embedding(t * m.time_scale_factor, m.embed_dim)
        x_embed = _InputEmbed(self.cfg)(x)
        embed = TransformerEncoderH(self.cfg)(x_embed, temb, train=train)
        if m.readout == "mlp":
            return MLP((m.mlp_dim, self.cfg.data.S))(embed)
        elif m.readout == "resnet":
            return ResidualReadout(self.cfg)(embed, temb, train=train)
        raise ValueError(f"unknown readout {m.readout}")


class PrefixConditionalBidirTransformer(nn.Module):
    """Prefix-conditioned bidirectional transformer (:1035-1133): the first
    conditional_dim positions condition both towers; logits span the rest."""

    cfg: object
    readout_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        m = self.cfg.model
        E = m.embed_dim
        cond_dim = m.get("conditional_dim", 0)
        rd = self.readout_dim if self.readout_dim is not None else self.cfg.data.S
        temb = MLP((m.mlp_dim, E))(
            timestep_embedding(t * m.time_scale_factor, E // 2)
        )
        x_embed = _InputEmbed(self.cfg)(x)
        # reference passes the full x_embed through both towers with the
        # conditioner's EMBEDDINGS as the prefix (its own code passes the raw
        # ints, which cannot concatenate — dead class, normalized here), then
        # slices the data positions (hollow_networks.py:1118-1124)
        conditioner = x_embed[:, :cond_dim]
        n_data = x.shape[1] - cond_dim
        l2r = UniDirectionalTransformer(self.cfg, "l2r")(
            x_embed, temb, conditioner=conditioner, train=train
        )[:, -n_data:]
        r2l = UniDirectionalTransformer(self.cfg, "r2l")(
            x_embed, temb, conditioner=conditioner, train=train
        )[:, :n_data]
        logits = _readout(self.cfg, rd)(l2r, r2l, temb, train=train)
        dummy = jnp.zeros(
            (x.shape[0], cond_dim, logits.shape[-1]), jnp.float32
        )
        return jnp.concatenate([dummy, logits], axis=1)


# ---------------------------------------------------------------------------
# Model-zoo wrappers (counterparts of models.py:495-658)
# ---------------------------------------------------------------------------


class HollowTransformerWrapper(nn.Module):
    """models.py:495-525 — picks bidir v1/v2 by cfg.model.nets."""

    cfg: object
    readout_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        learned = self.cfg.model.get("nets", "bidir_transformer") != "bidir_transformer2"
        return BidirectionalTransformer(
            self.cfg, readout_dim=self.readout_dim, learned_temb=learned
        )(x, t, train=train)


class HollowLogisticsWrapper(nn.Module):
    """models.py:528-614 — hollow net with truncated-logistic head."""

    cfg: object

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        cfg = self.cfg
        S = cfg.data.S
        B, D = x.shape
        learned = cfg.model.get("nets", "bidir_transformer") != "bidir_transformer2"
        net_out = BidirectionalTransformer(
            cfg, readout_dim=2, learned_temb=learned
        )(x, t, train=train)  # (B, D, 2)
        mu, log_scale = net_out[..., 0], net_out[..., 1]
        logits = logistic_bin_logits(
            mu, log_scale, S, bool(cfg.model.fix_logistic)
        )
        return logits.reshape(B, D, S)


class EnumerativeTransformerWrapper(nn.Module):
    """models.py:617-636 (MaskedModel)."""

    cfg: object

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        return EnumerativeTransformer(self.cfg)(x, t, train=train)


class BertEnumTransformerWrapper(nn.Module):
    """models.py:639-658 (BertMLPRes)."""

    cfg: object

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        return BertEnumTransformer(self.cfg)(x, t, train=train)
