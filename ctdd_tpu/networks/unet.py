"""U-Net score network (the MNIST/maze workhorse).

Counterpart of reference lib/networks/unet.py:303-459 (`UNet`, D3PM-style)
plus its wrapper ImageX0PredBasePaul (models.py:192-299): GroupNorm ResBlocks
with FiLM-free additive time injection, QKV self-attention at configured
resolutions, variance-scaling fan_avg/uniform init with 1e-10-scaled final
convs, logits or truncated-logistic output heads, optional replication
padding (maze). Internally NHWC — the TPU-native conv layout — where the
reference is NCHW; outputs are identical (B, D, S) logits.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ctdd_tpu.ops.logistic import logistic_bin_logits
from ctdd_tpu.ops.timestep import center_data


def vs_init(scale: float = 1.0):
    """variance_scaling fan_avg/uniform (ref unet.py:17-37)."""
    return nn.initializers.variance_scaling(scale, "fan_avg", "uniform")


def conv3x3(features, scale=1.0, stride=1, name=None, dtype=None):
    return nn.Conv(
        features,
        (3, 3),
        strides=(stride, stride),
        padding="SAME" if stride == 1 else "VALID",
        kernel_init=vs_init(scale),
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        name=name,
    )


class TimeEmbedding(nn.Module):
    """Sinusoidal t embedding, [sin, cos] concat (ref unet.py:223-241)."""

    dim: int

    @nn.compact
    def __call__(self, t):
        half = self.dim // 2
        inv_freq = jnp.exp(
            jnp.arange(half, dtype=jnp.float32)
            * (-math.log(10000.0) / (half - 1))
        )
        args = t.astype(jnp.float32)[:, None] * inv_freq[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class ResBlock(nn.Module):
    """GroupNorm->swish->conv + temb add + GN->swish->drop->conv(1e-10) + skip
    (ref unet.py:100-140)."""

    out_ch: int
    time_dim: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, train: bool = False):
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=min(in_ch // 4, 32), epsilon=1e-6)(x)
        h = conv3x3(self.out_ch, dtype=self.dtype)(nn.swish(h))
        h = h + nn.Dense(
            self.out_ch, kernel_init=vs_init(), dtype=self.dtype
        )(nn.swish(temb))[:, None, None, :]
        h = nn.GroupNorm(num_groups=min(self.out_ch // 4, 32), epsilon=1e-6)(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(nn.swish(h))
        h = conv3x3(self.out_ch, scale=1e-10, dtype=self.dtype)(h)
        if in_ch != self.out_ch:
            x = nn.Dense(self.out_ch, kernel_init=vs_init(), dtype=self.dtype)(x)
        return h + x


class SelfAttention(nn.Module):
    """Spatial QKV attention with zero-init output proj (ref unet.py:152-200)."""

    n_head: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=min(C // 4, 32))(x)
        h = h.reshape(B, H * W, C).astype(self.dtype)
        qkv = nn.Dense(3 * C, kernel_init=vs_init(), dtype=self.dtype)(h)
        qkv = qkv.reshape(B, H * W, self.n_head, 3 * (C // self.n_head))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        ch = C // self.n_head
        scale = 1.0 / math.sqrt(math.sqrt(ch))
        w = jnp.einsum(
            "bthc,bshc->bhts", q * scale, k * scale,
            preferred_element_type=jnp.float32,
        )
        w = jax.nn.softmax(w, axis=-1)
        out = jnp.einsum("bhts,bshc->bthc", w, v)
        out = out.reshape(B, H * W, C).astype(self.dtype)
        out = nn.Dense(C, kernel_init=nn.initializers.zeros, dtype=self.dtype)(out)
        return x + out.reshape(B, H, W, C).astype(x.dtype)


class Downsample(nn.Module):
    """Pad (0,1,0,1) + stride-2 conv (ref unet.py:89-97)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return conv3x3(x.shape[-1], stride=2, dtype=self.dtype)(x)


class Upsample(nn.Module):
    """Nearest 2x + conv (ref unet.py:79-86)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, 2 * H, 2 * W, C), method="nearest")
        return conv3x3(C, dtype=self.dtype)(x)


class UNet(nn.Module):
    """(B, H, W, C_in) image + (B,) t -> logits (B,H,W,C,S) or logistic pars
    (ref unet.py:303-459)."""

    in_channel: int
    out_channel: int
    channel: int
    channel_multiplier: Sequence[int]
    n_res_blocks: int
    attn_resolutions: Sequence[int]
    num_heads: int
    dropout: float
    model_output: str  # 'logits' | 'logistic_pars'
    num_classes: int
    x_min_max: Sequence[float]
    img_size: int
    dtype: jnp.dtype = jnp.float32  # bfloat16 = MXU fast path; heads stay f32

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        S = self.num_classes
        dt = self.dtype
        time_dim = self.channel * 4
        attn_strides = [self.img_size // int(r) for r in self.attn_resolutions]

        temb = TimeEmbedding(self.channel)(t)
        temb = nn.Dense(time_dim, kernel_init=vs_init(), dtype=dt)(temb)
        temb = nn.Dense(time_dim, kernel_init=vs_init(), dtype=dt)(nn.swish(temb))

        B, H, W, C = x.shape
        hid = inp = center_data(x, self.x_min_max)
        hid = conv3x3(self.channel, dtype=dt)(hid.astype(dt))
        feats = [hid]
        n_block = len(self.channel_multiplier)
        for i in range(n_block):
            for _ in range(self.n_res_blocks):
                ch = self.channel * self.channel_multiplier[i]
                hid = ResBlock(ch, time_dim, self.dropout, dtype=dt)(
                    hid, temb, train
                )
                if 2**i in attn_strides:
                    hid = SelfAttention(self.num_heads, dtype=dt)(hid)
                feats.append(hid)
            if i != n_block - 1:
                hid = Downsample(dtype=dt)(hid)
                feats.append(hid)

        hid = ResBlock(hid.shape[-1], time_dim, self.dropout, dtype=dt)(
            hid, temb, train
        )
        hid = SelfAttention(self.num_heads, dtype=dt)(hid)
        hid = ResBlock(hid.shape[-1], time_dim, self.dropout, dtype=dt)(
            hid, temb, train
        )

        for i in reversed(range(n_block)):
            for _ in range(self.n_res_blocks + 1):
                ch = self.channel * self.channel_multiplier[i]
                hid = ResBlock(ch, time_dim, self.dropout, dtype=dt)(
                    jnp.concatenate([hid, feats.pop()], axis=-1), temb, train
                )
                if 2**i in attn_strides:
                    hid = SelfAttention(self.num_heads, dtype=dt)(hid)
            if i != 0:
                hid = Upsample(dtype=dt)(hid)

        hid = hid.astype(jnp.float32)
        hid = nn.GroupNorm(num_groups=min(hid.shape[-1] // 4, 32), epsilon=1e-6)(hid)
        if self.model_output == "logistic_pars":
            out = conv3x3(self.out_channel * 2, scale=1e-10)(nn.swish(hid))
            loc, log_scale = jnp.split(out, 2, axis=-1)
            return jnp.tanh(loc + inp), log_scale
        out = conv3x3(self.out_channel * S, scale=1e-10)(nn.swish(hid))
        # (B, H, W, C*S) -> (B, H, W, C, S)
        return out.reshape(B, H, W, self.out_channel, S)


class UNetWrapper(nn.Module):
    """(B, D) states -> (B, D, S) logits (ref models.py:192-299,
    ImageX0PredBasePaul): reshape to image, optional replication padding,
    logits or truncated-logistic head."""

    cfg: object  # FrozenCfg

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        cfg = self.cfg
        S = cfg.data.S
        C, H, W = cfg.data.shape
        padding = bool(cfg.model.get("padding", False))
        if x.ndim == 2:
            B, D = x.shape
            img = x.reshape(B, C, H, W)
        else:
            B = x.shape[0]
            D = C * H * W
            img = x
        img = jnp.transpose(img, (0, 2, 3, 1)).astype(jnp.float32)  # NHWC
        if padding:
            img = jnp.pad(img, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
        img_size = cfg.data.image_size + (1 if padding else 0)

        net = UNet(
            in_channel=cfg.model.input_channels,
            out_channel=cfg.model.input_channels,
            channel=cfg.model.ch,
            channel_multiplier=tuple(cfg.model.ch_mult),
            n_res_blocks=cfg.model.num_res_blocks,
            attn_resolutions=tuple(cfg.model.attn_resolutions),
            num_heads=cfg.model.num_heads,
            dropout=cfg.model.dropout,
            model_output=cfg.model.model_output,
            num_classes=S,
            x_min_max=tuple(cfg.model.data_min_max),
            img_size=img_size,
            dtype=jnp.bfloat16
            if cfg.model.get("compute_dtype", "float32") == "bfloat16"
            else jnp.float32,
        )
        out = net(img, t, train=train)
        if cfg.model.model_output == "logits":
            logits = out  # (B, H', W', C, S)
            logits = jnp.transpose(logits, (0, 3, 1, 2, 4))  # (B, C, H', W', S)
        else:
            loc, log_scale = out  # each (B, H', W', C)
            loc = jnp.transpose(loc, (0, 3, 1, 2))
            log_scale = jnp.transpose(log_scale, (0, 3, 1, 2))
            logits = logistic_bin_logits(
                loc, log_scale, S, bool(cfg.model.fix_logistic)
            )  # (B, C, H', W', S)
        if padding:
            logits = logits[:, :, :-1, :-1, :]
        return logits.reshape(B, D, S)
