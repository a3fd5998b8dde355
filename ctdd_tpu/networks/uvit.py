"""U-ViT: all-tokens-are-patches ViT with long skip connections.

Counterpart of reference lib/networks/u_vit.py:261-427 (`UViT`): patch embed,
time token (+ optional label token), learned positional table, depth/2 in
blocks saving skips, mid block, depth/2 out blocks consuming skips through
Linear(2d -> d), LayerNorm + patch decoder, final 3x3 conv producing C·S
logits (or 2·C logistic pars). Internally NHWC.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ctdd_tpu.networks.dit import Attention  # timm-style ViT attention
from ctdd_tpu.ops.timestep import center_data, timestep_embedding


class UViTBlock(nn.Module):
    """Pre-LN ViT block, optional long-skip fusion (ref u_vit.py:203-241).

    Wrapped in jax.checkpoint upstream when use_checkpoint is set (the
    reference uses torch.utils.checkpoint the same way).
    """

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    skip: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None):
        if self.skip:
            x = nn.Dense(self.dim, dtype=self.dtype)(
                jnp.concatenate([x, skip], axis=-1)
            ).astype(jnp.float32)
        x = x + Attention(self.dim, self.num_heads, dtype=self.dtype)(
            nn.LayerNorm()(x)
        )
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype)(
            nn.LayerNorm()(x)
        )
        return x + nn.Dense(self.dim, dtype=self.dtype)(
            nn.gelu(h)
        ).astype(jnp.float32)


class UViT(nn.Module):
    """(B, H, W, C) + t [+ y] -> (B, C, H, W, S) logits (ref u_vit.py:261-427)."""

    img_size: int
    num_states: int
    patch_size: int
    in_chans: int
    embed_dim: int
    depth: int
    num_heads: int
    mlp_ratio: float
    mlp_time_embed: bool = True
    num_classes: int = -1
    model_output: str = "logits"
    use_checkpoint: bool = False
    dtype: jnp.dtype = jnp.float32  # bf16 = MXU fast path; norms/head f32

    @nn.compact
    def __call__(self, x, t, y=None, train: bool = False):
        S = self.num_states
        p = self.patch_size
        B, H, W, C = x.shape
        x = center_data(x, (0, S - 1))
        h = nn.Conv(
            self.embed_dim, (p, p), strides=(p, p), padding="VALID"
        )(x)
        L = (H // p) * (W // p)
        h = h.reshape(B, L, self.embed_dim)

        temb = timestep_embedding(t, self.embed_dim)
        if self.mlp_time_embed:
            temb = nn.Dense(4 * self.embed_dim)(temb)
            temb = nn.Dense(self.embed_dim)(nn.silu(temb))
        tokens = [temb[:, None, :], h]
        extras = 1
        if self.num_classes > 0 and y is not None:
            label = nn.Embed(self.num_classes, self.embed_dim)(y)
            tokens = [label[:, None, :]] + tokens
            extras = 2
        h = jnp.concatenate(tokens, axis=1)
        pos = self.param(
            "pos_embed", nn.initializers.zeros, (1, extras + L, self.embed_dim)
        )
        h = h + pos

        block = UViTBlock
        if self.use_checkpoint:
            block = nn.checkpoint(UViTBlock)

        skips = []
        for _ in range(self.depth // 2):
            h = block(
                self.embed_dim, self.num_heads, self.mlp_ratio,
                dtype=self.dtype,
            )(h)
            skips.append(h)
        h = block(
            self.embed_dim, self.num_heads, self.mlp_ratio, dtype=self.dtype
        )(h)
        for _ in range(self.depth // 2):
            h = block(
                self.embed_dim, self.num_heads, self.mlp_ratio, skip=True,
                dtype=self.dtype,
            )(h, skips.pop())

        h = nn.LayerNorm()(h)
        h = nn.Dense(p * p * self.in_chans)(h)
        h = h[:, extras:, :]
        # unpatchify -> (B, H, W, C)
        g = H // p
        h = h.reshape(B, g, g, p, p, self.in_chans)
        h = jnp.einsum("bhwpqc->bhpwqc", h).reshape(B, H, W, self.in_chans)

        if self.model_output == "logistic_pars":
            out = nn.Conv(self.in_chans * 2, (3, 3), padding="SAME")(h)
            return out  # caller splits loc/scale
        out = nn.Conv(self.in_chans * S, (3, 3), padding="SAME")(h)
        out = out.reshape(B, H, W, self.in_chans, S)
        return jnp.transpose(out, (0, 3, 1, 2, 4))  # (B, C, H, W, S)


class UViTWrapper(nn.Module):
    """models.py:77-125 (UViTModel): (B, D) -> (B, D, S) logits."""

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
        img = jnp.transpose(img, (0, 2, 3, 1)).astype(jnp.float32)
        net = UViT(
            img_size=cfg.data.image_size,
            num_states=S,
            patch_size=cfg.model.patch_size,
            in_chans=cfg.model.input_channel,
            embed_dim=cfg.model.hidden_dim,
            depth=cfg.model.depth,
            num_heads=cfg.model.num_heads,
            mlp_ratio=cfg.model.mlp_ratio,
            mlp_time_embed=True,
            num_classes=-1,
            model_output=cfg.model.model_output,
            use_checkpoint=bool(cfg.model.get("use_checkpoint", False)),
            dtype=jnp.bfloat16
            if cfg.model.get("compute_dtype", "float32") == "bfloat16"
            else jnp.float32,
        )
        logits = net(img, t, y=label, train=train)
        return logits.reshape(B, D, S)
