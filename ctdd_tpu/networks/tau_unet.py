"""Original tauLDR U-Net (logistic-pars output).

Counterpart of reference lib/networks/tau_networks.py:198-463 (`UNet`):
GroupNorm ResBlocks with 1/√2 skip rescale, NiN-based spatial attention at
one scale (scale_count_to_put_attn), sinusoidal temb through a 2-layer MLP
(time_scale_factor·t), and a 2C-channel output head whose first C channels
get the tanh(x + μ') logistic residual bias (:443-446). Wrapped by
TauUNetWrapper (= reference ImageX0PredBase, models.py:302-400) which
integrates the truncated-logistic bins into (B, D, S) logits. NHWC inside.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ctdd_tpu.ops.logistic import logistic_bin_logits
from ctdd_tpu.ops.timestep import center_data, timestep_embedding


def ddpm_init(scale: float = 1.0):
    """default_init of tau_networks.py:49-52 (fan_avg uniform; 0 -> 1e-10)."""
    scale = 1e-10 if scale == 0 else scale
    return nn.initializers.variance_scaling(scale, "fan_avg", "uniform")


class NiN(nn.Module):
    """1x1 channel mix (tau_networks.py:55-71)."""

    out_ch: int
    init_scale: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        W = self.param(
            "W", ddpm_init(self.init_scale), (x.shape[-1], self.out_ch)
        )
        b = self.param("b", nn.initializers.zeros, (self.out_ch,))
        return jnp.einsum(
            "bhwi,ik->bhwk", x.astype(self.dtype), W.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ) + b


class AttnBlock(nn.Module):
    """Spatial self-attention with NiN projections (tau_networks.py:74-106)."""

    skip_rescale: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=min(C // 4, 32), epsilon=1e-6)(x)
        q = NiN(C, dtype=self.dtype)(h)
        k = NiN(C, dtype=self.dtype)(h)
        v = NiN(C, dtype=self.dtype)(h)
        w = jnp.einsum(
            "bhwc,bijc->bhwij", q.astype(self.dtype), k.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ) * (C ** -0.5)
        w = jax.nn.softmax(w.reshape(B, H, W, H * W), axis=-1).reshape(
            B, H, W, H, W
        )
        h = jnp.einsum(
            "bhwij,bijc->bhwc", w.astype(self.dtype), v.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        h = NiN(C, init_scale=0.0, dtype=self.dtype)(h)
        out = x + h
        return out / math.sqrt(2.0) if self.skip_rescale else out


class TauResBlock(nn.Module):
    """(tau_networks.py:109-165)."""

    out_ch: int
    dropout: float
    skip_rescale: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None, train: bool = False):
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=min(in_ch // 4, 32), epsilon=1e-6)(x)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype)(
            nn.silu(h)
        )
        if temb is not None:
            h = h + nn.Dense(self.out_ch, dtype=self.dtype)(
                nn.silu(temb)
            )[:, None, None, :].astype(h.dtype)
        h = h.astype(jnp.float32)
        h = nn.GroupNorm(num_groups=min(self.out_ch // 4, 32), epsilon=1e-6)(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(nn.silu(h))
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype)(h)
        if self.out_ch != in_ch:
            x = NiN(self.out_ch, dtype=self.dtype)(x)
        out = x + h.astype(jnp.float32)
        return out / math.sqrt(2.0) if self.skip_rescale else out


class TauUNet(nn.Module):
    """(B, H, W, C) + t -> (B, H, W, 2C) logistic params (ref :198-463)."""

    ch: int
    num_res_blocks: int
    num_scales: int
    ch_mult: Sequence[int]
    input_channels: int
    scale_count_to_put_attn: int
    data_min_max: Sequence[float]
    dropout: float
    skip_rescale: bool
    do_time_embed: bool
    time_scale_factor: float
    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32  # bfloat16 = MXU fast path; norms/head f32

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        dt = self.dtype
        h = center_data(x, self.data_min_max)
        centered_x_in = h

        temb = None
        if self.do_time_embed:
            temb = timestep_embedding(
                t * self.time_scale_factor, self.time_embed_dim
            )
            temb = nn.Dense(4 * self.time_embed_dim, dtype=dt)(temb)
            temb = nn.Dense(4 * self.time_embed_dim, dtype=dt)(nn.silu(temb))

        h = nn.Conv(self.ch, (3, 3), padding="SAME", dtype=dt)(h)
        h = h.astype(jnp.float32)
        hs = [h]
        in_ch = self.ch
        for scale in range(self.num_scales):
            for _ in range(self.num_res_blocks):
                out_ch = self.ch * self.ch_mult[scale]
                h = TauResBlock(
                    out_ch, self.dropout, self.skip_rescale, dtype=dt
                )(h, temb, train)
                if scale == self.scale_count_to_put_attn:
                    h = AttnBlock(self.skip_rescale, dtype=dt)(h)
                hs.append(h)
            if scale != self.num_scales - 1:
                # pad (0,1,0,1) + stride-2 conv (:168-180)
                hp = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(
                    h.shape[-1], (3, 3), strides=(2, 2), padding="VALID",
                    dtype=dt,
                )(hp).astype(jnp.float32)
                hs.append(h)

        h = TauResBlock(
            h.shape[-1], self.dropout, self.skip_rescale, dtype=dt
        )(h, temb, train)
        h = AttnBlock(self.skip_rescale, dtype=dt)(h)
        h = TauResBlock(
            h.shape[-1], self.dropout, self.skip_rescale, dtype=dt
        )(h, temb, train)

        for scale in reversed(range(self.num_scales)):
            for _ in range(self.num_res_blocks + 1):
                out_ch = self.ch * self.ch_mult[scale]
                h = TauResBlock(
                    out_ch, self.dropout, self.skip_rescale, dtype=dt
                )(jnp.concatenate([h, hs.pop()], axis=-1), temb, train)
                if scale == self.scale_count_to_put_attn:
                    h = AttnBlock(self.skip_rescale, dtype=dt)(h)
            if scale != 0:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, 2 * H, 2 * W, C), method="nearest")
                h = nn.Conv(C, (3, 3), padding="SAME", dtype=dt)(
                    h
                ).astype(jnp.float32)

        h = nn.GroupNorm(num_groups=min(h.shape[-1] // 4, 32), epsilon=1e-6)(h)
        h = nn.Conv(2 * self.input_channels, (3, 3), padding="SAME")(nn.silu(h))
        # logistic residual: tanh(x + mu') on the loc half (:443-446)
        C = self.input_channels
        loc = jnp.tanh(centered_x_in + h[..., :C])
        return jnp.concatenate([loc, h[..., C:]], axis=-1)


class TauUNetWrapper(nn.Module):
    """models.py:302-400 (ImageX0PredBase): logistic-only head -> (B, D, S)."""

    cfg: object

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        cfg = self.cfg
        S = cfg.data.S
        C, H, W = cfg.data.shape
        B = x.shape[0]
        D = C * H * W
        img = x.reshape(B, C, H, W) if x.ndim == 2 else x
        img = jnp.transpose(img, (0, 2, 3, 1)).astype(jnp.float32)
        net = TauUNet(
            ch=cfg.model.ch,
            num_res_blocks=cfg.model.num_res_blocks,
            num_scales=cfg.model.num_scales,
            ch_mult=tuple(cfg.model.ch_mult),
            input_channels=cfg.model.input_channels,
            scale_count_to_put_attn=cfg.model.scale_count_to_put_attn,
            data_min_max=tuple(cfg.model.data_min_max),
            dropout=cfg.model.dropout,
            skip_rescale=cfg.model.skip_rescale,
            do_time_embed=True,
            time_scale_factor=cfg.model.time_scale_factor,
            time_embed_dim=cfg.model.time_embed_dim,
            dtype=jnp.bfloat16
            if cfg.model.get("compute_dtype", "float32") == "bfloat16"
            else jnp.float32,
        )
        out = net(img, t, train=train)  # (B, H, W, 2C)
        loc, log_scale = out[..., :C], out[..., C:]
        loc = jnp.transpose(loc, (0, 3, 1, 2))
        log_scale = jnp.transpose(log_scale, (0, 3, 1, 2))
        logits = logistic_bin_logits(
            loc, log_scale, S, bool(cfg.model.fix_logistic)
        )  # (B, C, H, W, S)
        return logits.reshape(B, D, S)
