"""Pallas TPU kernels for the hot sampler/loss ops.

The reverse-rate computation runs once per sampler step on (N, D, S) tensors
(sampling.py:31-78 equivalents): softmax(logits), divide by the gathered
q_{t|0} denominator, one (D,S)x(S,S) matmul against q_{t|0}, multiply by the
gathered forward rates, and zero the current-state entry. Unfused, that is
five HBM-bound passes over (N, D, S); this kernel keeps the whole pipeline in
VMEM per (batch, D-tile) grid cell and feeds the MXU directly.

All kernels fall back to plain XLA (`*_xla`) on non-TPU backends and are
validated against those references in tests (interpret mode on CPU).

Measured on one v5e chip at the MNIST flagship size (N=16, D=784, S=256):
XLA-fused 0.018 ms vs this kernel 0.053 ms per call — XLA's bf16 MXU passes
beat the f32 `jnp.dot` here, and the whole op is <1% of a sampler step (the
UNet forward dominates). The samplers therefore default to the XLA path;
these kernels are the validated template for when S/D grow past what XLA
fuses well, and they are the higher-precision option (f32 accumulation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def reverse_rates_xla(logits, qt0_cols, qt0, rate_cols, x):
    """Reference semantics: R̂ = rate_cols · softmax(logits)/qt0_cols @ qt0,
    with R̂[b,d,x[b,d]] = 0. Shapes: logits/qt0_cols/rate_cols (N,D,S),
    qt0 (N,S,S), x (N,D) int."""
    p0t = jax.nn.softmax(logits, axis=-1)
    ratio = jnp.einsum(
        "bds,bsk->bdk", p0t / qt0_cols, qt0, preferred_element_type=jnp.float32
    )
    rev = rate_cols * ratio
    S = logits.shape[-1]
    mask = jnp.arange(S, dtype=jnp.int32)[None, None, :] == x[:, :, None]
    return jnp.where(mask, 0.0, rev)


def _rev_rates_kernel(logits_ref, qcols_ref, qt0_ref, rcols_ref, xoh_ref, out_ref):
    # one (TILE_D, S) tile of one batch element; qt0 (S, S) resident in VMEM
    logits = logits_ref[:]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    ratio = jnp.dot(
        p / qcols_ref[:], qt0_ref[:], preferred_element_type=jnp.float32
    )
    rev = rcols_ref[:] * ratio
    out_ref[:] = rev * (1.0 - xoh_ref[:])


@functools.partial(jax.jit, static_argnames=("tile_d", "interpret"))
def reverse_rates_pallas(
    logits, qt0_cols, qt0, rate_cols, x, *, tile_d: int = 128,
    interpret: bool = False,
):
    """Fused reverse rates. Grid = (N, ceil(D/tile_d)); the (S,S) q_{t|0} of
    the current batch element stays in VMEM across all D tiles."""
    N, D, S = logits.shape
    # pad D to the tile size (masked region multiplies to harmless values)
    pad = (-D) % tile_d
    if pad:
        padcfg = ((0, 0), (0, pad), (0, 0))
        logits = jnp.pad(logits, padcfg)
        qt0_cols = jnp.pad(qt0_cols, padcfg, constant_values=1.0)
        rate_cols = jnp.pad(rate_cols, padcfg)
        x = jnp.pad(x, ((0, 0), (0, pad)))
    Dp = D + pad
    x_onehot = jax.nn.one_hot(x, S, dtype=jnp.float32)

    grid = (N, Dp // tile_d)
    tile_spec = pl.BlockSpec(
        (1, tile_d, S), lambda b, d: (b, d, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        lambda l, qc, q, rc, xo, o: _rev_rates_kernel(
            l.at[0], qc.at[0], q.at[0], rc.at[0], xo.at[0], o.at[0]
        ),
        grid=grid,
        in_specs=[
            tile_spec,
            tile_spec,
            pl.BlockSpec((1, S, S), lambda b, d: (b, 0, 0), memory_space=pltpu.VMEM),
            tile_spec,
            tile_spec,
        ],
        out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((N, Dp, S), jnp.float32),
        interpret=interpret,
    )(logits, qt0_cols, qt0, rate_cols, x_onehot)
    return out[:, :D, :]


def euler_posterior_xla(rev_rates, x, h, eps=1e-35):
    """LBJF posterior probabilities (sampling.py:278-288)."""
    S = rev_rates.shape[-1]
    xt_onehot = jax.nn.one_hot(x, S)
    post0 = rev_rates * (1.0 - xt_onehot)
    off = jnp.sum(post0, axis=-1, keepdims=True)
    diag = jnp.clip(1.0 - h * off, 0.0, None)
    post = post0 * h + diag * xt_onehot
    return jnp.log(post / jnp.sum(post, axis=-1, keepdims=True) + eps)


def _euler_kernel(rev_ref, xoh_ref, h_ref, out_ref):
    rev = rev_ref[:]
    xoh = xoh_ref[:]
    h = h_ref[0, 0]
    post0 = rev * (1.0 - xoh)
    off = jnp.sum(post0, axis=-1, keepdims=True)
    diag = jnp.maximum(1.0 - h * off, 0.0)
    post = post0 * h + diag * xoh
    out_ref[:] = jnp.log(post / jnp.sum(post, axis=-1, keepdims=True) + 1e-35)


@functools.partial(jax.jit, static_argnames=("tile_d", "interpret"))
def euler_posterior_pallas(rev_rates, x, h, *, tile_d: int = 128,
                           interpret: bool = False):
    """Fused LBJF posterior -> log-probs, one VMEM pass."""
    N, D, S = rev_rates.shape
    pad = (-D) % tile_d
    if pad:
        rev_rates = jnp.pad(rev_rates, ((0, 0), (0, pad), (0, 0)))
        x = jnp.pad(x, ((0, 0), (0, pad)))
    Dp = D + pad
    xoh = jax.nn.one_hot(x, S, dtype=jnp.float32)
    h_arr = jnp.full((1, 1), h, jnp.float32)
    tile_spec = pl.BlockSpec(
        (1, tile_d, S), lambda b, d: (b, d, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        lambda r, xo, hh, o: _euler_kernel(r.at[0], xo.at[0], hh, o.at[0]),
        grid=(N, Dp // tile_d),
        in_specs=[
            tile_spec,
            tile_spec,
            pl.BlockSpec((1, 1), lambda b, d: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((N, Dp, S), jnp.float32),
        interpret=interpret,
    )(rev_rates, xoh, h_arr)
    return out[:, :D, :]
