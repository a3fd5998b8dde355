"""DDSM-style score networks (sudoku constraint-attention, protein convnet).

Counterpart of reference lib/networks/ddsm_networks.py: SudokuScoreNet
(:123-167, 20 attention blocks with a learned projection of the sudoku
relative-constraint encoding as an attention bias), ProteinScoreNet
(:170-254, 20 dilated Conv1d blocks with GroupNorm), GaussianFourierProjection
(:94-107), plus the zoo wrappers of models.py:661-704.

Note on sudoku shapes: the reference wires concat_dim = 81·9 = 729 state dims
into losses while the net outputs (B, 81, 9) logits — shapes that cannot
actually meet in its loss code (untested path). We implement the coherent
form: 81 cells with 9 states each (D=81, S=9); the wrapper one-hot-encodes
cell values for the net exactly as the dataset's one-hot layout did.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def new_gelu(x):
    """Google-BERT GELU (ddsm_networks.py:22-27)."""
    return 0.5 * x * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * x**3)))


class GaussianFourierProjection(nn.Module):
    """Fixed random Fourier features of t (ddsm_networks.py:94-107)."""

    embed_dim: int
    scale: float = 30.0

    @nn.compact
    def __call__(self, t):
        W = self.param(
            "W",
            lambda key, shape: jax.random.normal(key, shape) * self.scale,
            (self.embed_dim // 2,),
        )
        W = jax.lax.stop_gradient(W)  # frozen, like requires_grad=False
        proj = t[:, None] * W[None, :] * 2.0 * jnp.pi
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


class BiasedSelfAttention(nn.Module):
    """Attention with a learned head-projection of a (T, T, R) relation
    encoding added to the logits (ddsm_networks.py:31-70)."""

    n_embd: int
    n_head: int

    @nn.compact
    def __call__(self, x, bias_encoding):
        B, T, C = x.shape
        hs = C // self.n_head
        qkv = nn.Dense(3 * C)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, self.n_head, hs).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, self.n_head, hs).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, self.n_head, hs).transpose(0, 2, 1, 3)
        att = jnp.einsum(
            "bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(hs)
        # (T, T, R) -> (T, T, n_head) -> (n_head, T, T)
        bias = nn.Dense(self.n_head)(bias_encoding).transpose(2, 0, 1)
        att = att + bias[None, :, :, :]
        att = jax.nn.softmax(att, axis=-1)
        y = jnp.einsum("bhts,bhsd->bhtd", att, v)
        y = y.transpose(0, 2, 1, 3).reshape(B, T, C)
        return nn.Dense(C)(y)


class SudokuBlock(nn.Module):
    """Pre-LN transformer block with biased attention (ddsm_networks.py:73-90)."""

    n_embd: int
    n_head: int

    @nn.compact
    def __call__(self, x, bias_encoding):
        x = x + BiasedSelfAttention(self.n_embd, self.n_head)(
            nn.LayerNorm()(x), bias_encoding
        )
        h = nn.Dense(4 * self.n_embd)(nn.LayerNorm()(x))
        return x + nn.Dense(self.n_embd)(new_gelu(h))


class SudokuScoreNet(nn.Module):
    """(B, 81, 9) one-hot-ish cells -> (B, 81, 9) centered logits
    (ddsm_networks.py:123-167)."""

    cfg: object
    encoding: np.ndarray  # (81, 81, R) relative constraint encoding

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        embed_dim = self.cfg.model.embed_dim
        temb = GaussianFourierProjection(embed_dim)(t)
        temb = new_gelu(nn.Dense(embed_dim)(temb))

        enc = jnp.asarray(self.encoding, jnp.float32)
        h = nn.Dense(128)(x.astype(jnp.float32))  # (B, 81, 128)
        for _ in range(20):
            h = SudokuBlock(128, 8)(h + nn.Dense(128)(temb)[:, None, :], enc)
        h = nn.Dense(9)(h)
        return h - jnp.mean(h, axis=-1, keepdims=True)


class ProteinScoreNet(nn.Module):
    """(B, L) residues -> (B, L, S) centered logits (ddsm_networks.py:170-254):
    20 dilated 1D convs (dilations 1,1,4,16,64 ×4) with GroupNorm(1) and
    residual adds, swish activations, GELU head."""

    cfg: object

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        S = self.cfg.data.S
        n = self.cfg.model.embed_dim
        temb = GaussianFourierProjection(n)(t / 2.0)
        temb = nn.swish(nn.Dense(n)(temb))

        h = jax.nn.one_hot(x, S)  # (B, L, S) — NLC (flax convs are NLC-native)
        h = nn.swish(
            nn.Conv(n, (9,), padding=4)(h)
        )
        dilations = [1, 1, 4, 16, 64] * 4
        for d in dilations:
            z = h + nn.Dense(n)(temb)[:, None, :]
            z = nn.GroupNorm(num_groups=1)(z)
            pad = 4 * d
            z = nn.Conv(n, (9,), kernel_dilation=(d,), padding=pad)(z)
            z = nn.swish(z)
            h = z + h
        h = nn.Conv(n, (1,))(h)
        h = nn.Conv(S, (1,))(nn.gelu(h))
        return h - jnp.mean(h, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# zoo wrappers (models.py:661-704)
# ---------------------------------------------------------------------------


class SudokuScoreNetWrapper(nn.Module):
    """models.py:661-681: builds the relative encoding and reshapes cells."""

    cfg: object

    def setup(self):
        from ctdd_tpu.data.sudoku import define_relative_encoding

        self.net = SudokuScoreNet(self.cfg, define_relative_encoding())

    def __call__(self, x, t, train: bool = False):
        B = x.shape[0]
        if x.ndim == 2 and x.shape[1] == 81:
            h = jax.nn.one_hot(x, 9)  # (B, 81, 9) cell values -> one-hot
        else:
            h = x.reshape(B, 81, 9).astype(jnp.float32)
        logits = self.net(h, t, train=train)
        return logits.reshape(B, 81, 9)


class ProteinScoreNetWrapper(nn.Module):
    """models.py:684-704."""

    cfg: object

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        B = x.shape[0]
        logits = ProteinScoreNet(self.cfg)(x.reshape(B, -1), t, train=train)
        return logits
