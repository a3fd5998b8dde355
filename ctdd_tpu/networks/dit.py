"""DiT (Diffusion Transformer), num_states-aware.

Counterpart of reference lib/networks/dit.py (560 LoC): PatchEmbed (:97-188),
TimestepEmbedder (:195-237, note [cos, sin] concat order), LabelEmbedder with
CFG dropout (:240-270), adaLN-Zero DiTBlock (:280-313), FinalLayer (:317-333),
fixed 2D sin-cos positional table (:511-556), final 3x3 conv head producing
C·S logits or 2·C logistic params, and forward_with_cfg (:486-505).
Internally NHWC; adaLN modulations zero-initialized as in the reference.
"""

from __future__ import annotations

import math
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ctdd_tpu.ops.logistic import logistic_bin_logits
from ctdd_tpu.ops.timestep import center_data

xavier = nn.initializers.xavier_uniform()


def modulate(x, shift, scale):
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int) -> np.ndarray:
    """(grid², D) fixed table (ref dit.py:511-556)."""

    def emb_1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0)
    emb_h = emb_1d(embed_dim // 2, grid[0])
    emb_w = emb_1d(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)


class TimestepEmbedder(nn.Module):
    """(:195-237): [cos, sin] frequency embedding -> MLP (std=0.02 init)."""

    hidden_size: int
    frequency_embedding_size: int = 256

    @nn.compact
    def __call__(self, t):
        half = self.frequency_embedding_size // 2
        freqs = jnp.exp(
            -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
        )
        args = t.astype(jnp.float32)[:, None] * freqs[None, :]
        emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        init = nn.initializers.normal(0.02)
        h = nn.Dense(self.hidden_size, kernel_init=init)(emb)
        return nn.Dense(self.hidden_size, kernel_init=init)(nn.silu(h))


class LabelEmbedder(nn.Module):
    """(:240-270): class embedding with CFG dropout to a null class."""

    num_classes: int
    hidden_size: int
    dropout_prob: float

    @nn.compact
    def __call__(self, labels, train: bool = False, force_drop_ids=None):
        use_cfg = self.dropout_prob > 0
        table = nn.Embed(
            self.num_classes + int(use_cfg),
            self.hidden_size,
            embedding_init=nn.initializers.normal(0.02),
        )
        if (train and use_cfg) or force_drop_ids is not None:
            if force_drop_ids is None:
                drop = (
                    jax.random.uniform(self.make_rng("dropout"), labels.shape)
                    < self.dropout_prob
                )
            else:
                drop = force_drop_ids == 1
            labels = jnp.where(drop, self.num_classes, labels)
        return table(labels)


class Attention(nn.Module):
    """timm-style ViT attention, qkv_bias=True (the reference imports timm's)."""

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        hs = C // self.num_heads
        qkv = nn.Dense(3 * C, kernel_init=xavier, dtype=self.dtype)(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, hs)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        att = jnp.einsum(
            "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(hs)
        att = jax.nn.softmax(att, axis=-1).astype(self.dtype)
        out = jnp.einsum(
            "bhnm,bmhd->bnhd", att, v, preferred_element_type=jnp.float32
        ).reshape(B, N, C)
        return nn.Dense(C, kernel_init=xavier, dtype=self.dtype)(
            out
        ).astype(jnp.float32)


class DiTBlock(nn.Module):
    """adaLN-Zero block (:280-313)."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c):
        mods = nn.Dense(
            6 * self.hidden_size,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )(nn.silu(c))
        s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp = jnp.split(mods, 6, axis=-1)
        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6)(x)
        x = x + g_msa[:, None, :] * Attention(
            self.hidden_size, self.num_heads, dtype=self.dtype
        )(modulate(h, s_msa, sc_msa))
        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6)(x)
        h = modulate(h, s_mlp, sc_mlp)
        h = nn.Dense(
            int(self.hidden_size * self.mlp_ratio), kernel_init=xavier,
            dtype=self.dtype,
        )(h)
        h = nn.Dense(self.hidden_size, kernel_init=xavier, dtype=self.dtype)(
            nn.gelu(h, approximate=True)
        ).astype(jnp.float32)
        return x + g_mlp[:, None, :] * h


class FinalLayer(nn.Module):
    """(:317-333): zero-initialized adaLN + linear."""

    hidden_size: int
    patch_size: int
    out_channels: int

    @nn.compact
    def __call__(self, x, c):
        mods = nn.Dense(
            2 * self.hidden_size,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )(nn.silu(c))
        shift, scale = jnp.split(mods, 2, axis=-1)
        x = modulate(
            nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6)(x),
            shift,
            scale,
        )
        return nn.Dense(
            self.patch_size * self.patch_size * self.out_channels,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )(x)


class DiT(nn.Module):
    """(B, H, W, C) image + t [+ labels] -> (B, H, W, C·S or 2·C) (ref :339-509)."""

    input_size: int
    num_states: int
    patch_size: int
    in_channels: int
    hidden_size: int
    depth: int
    num_heads: int
    mlp_ratio: float
    class_dropout_prob: float
    num_classes: int
    model_output: str
    dtype: jnp.dtype = jnp.float32  # bf16 = MXU fast path; norms/head f32

    @nn.compact
    def __call__(self, x, t, y=None, train: bool = False):
        p = self.patch_size
        B, H, W, C = x.shape
        grid = H // p
        # PatchEmbed: p×p conv == linear on patches (xavier init like ref :414-417)
        h = nn.Conv(
            self.hidden_size, (p, p), strides=(p, p), padding="VALID",
            kernel_init=xavier,
        )(x)
        h = h.reshape(B, grid * grid, self.hidden_size)
        pos = jnp.asarray(
            get_2d_sincos_pos_embed(self.hidden_size, grid), jnp.float32
        )
        h = h + pos[None, :, :]

        c = TimestepEmbedder(self.hidden_size)(t)
        if y is not None:
            c = c + LabelEmbedder(
                self.num_classes, self.hidden_size, self.class_dropout_prob
            )(y, train=train)

        for _ in range(self.depth):
            h = DiTBlock(
                self.hidden_size, self.num_heads, self.mlp_ratio,
                dtype=self.dtype,
            )(h, c)
        h = FinalLayer(self.hidden_size, p, self.in_channels)(h, c)

        # unpatchify -> (B, H, W, C)
        h = h.reshape(B, grid, grid, p, p, self.in_channels)
        h = jnp.einsum("bhwpqc->bhpwqc", h).reshape(B, H, W, self.in_channels)

        out_ch = (
            self.in_channels * self.num_states
            if self.model_output == "logits"
            else self.in_channels * 2
        )
        return nn.Conv(out_ch, (3, 3), padding="SAME", kernel_init=xavier)(h)


def forward_with_cfg(apply_fn, params, x, t, y, cfg_scale: float,
                     guided_channels: int = 3):
    """Classifier-free guidance forward (ref dit.py:486-505).

    The first half of the batch carries the conditional inputs; the second
    half repeats them and is scored with dropped labels upstream. Like the
    reference, guidance is applied to the first `guided_channels` output
    channels only (its "exact reproducibility" convention).
    """
    import jax.numpy as jnp

    half = x[: len(x) // 2]
    combined = jnp.concatenate([half, half], axis=0)
    out = apply_fn(params, combined, t, y)
    eps, rest = out[:, :guided_channels], out[:, guided_channels:]
    cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
    half_eps = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
    eps = jnp.concatenate([half_eps, half_eps], axis=0)
    return jnp.concatenate([eps, rest], axis=1)


class DiTWrapper(nn.Module):
    """models.py:128-189 (DiTModel): centers input, logits or logistic head,
    returns (B, D, S)."""

    cfg: object

    @nn.compact
    def __call__(self, x, t, label=None, train: bool = False):
        cfg = self.cfg
        S = cfg.data.S
        C, H, W = cfg.data.shape
        if x.ndim == 2:
            B, D = x.shape
            img = x.reshape(B, C, H, W)
        else:
            B = x.shape[0]
            D = C * H * W
            img = x
        img = jnp.transpose(img, (0, 2, 3, 1))
        img = center_data(img, (0, S - 1))

        net = DiT(
            input_size=cfg.data.image_size,
            num_states=S,
            patch_size=cfg.model.patch_size,
            in_channels=cfg.model.input_channel,
            hidden_size=cfg.model.hidden_dim,
            depth=cfg.model.depth,
            num_heads=cfg.model.num_heads,
            mlp_ratio=cfg.model.mlp_ratio,
            class_dropout_prob=cfg.model.dropout,
            num_classes=S,
            model_output=cfg.model.model_output,
            dtype=jnp.bfloat16
            if cfg.model.get("compute_dtype", "float32") == "bfloat16"
            else jnp.float32,
        )
        out = net(img, t, y=label, train=train)  # (B, H, W, C·S or 2·C)
        if cfg.model.model_output == "logits":
            logits = out.reshape(B, H, W, C, S)
            logits = jnp.transpose(logits, (0, 3, 1, 2, 4))
        else:
            loc, log_scale = jnp.split(out, 2, axis=-1)
            loc = jnp.transpose(loc, (0, 3, 1, 2))
            log_scale = jnp.transpose(log_scale, (0, 3, 1, 2))
            loc = jnp.tanh(loc + jnp.transpose(img, (0, 3, 1, 2)))
            logits = logistic_bin_logits(
                loc, log_scale, S, bool(cfg.model.fix_logistic)
            )
        return logits.reshape(B, D, S)
