"""Fused tau-leap sampler update: one Pallas kernel per scan step.

The p0t-parameterized tau-leap step (sampling.py:81-234 semantics, shared
timestep) is, unfused, a chain of HBM-bound XLA kernels over (N*D, S):

    softmax -> gather q_{t|0}(x|.) -> divide -> matmul qt0 -> gather R(.,x)
    -> multiply -> zero-at-x -> poisson(rates*h) -> ordinal jump -> clip

Each arrow that XLA does not fuse costs a full (N*D, S) round-trip to HBM
(205 MB at the flagship sampling size N=256, D=784, S=256). This kernel runs
the whole chain in VMEM per row-tile and writes back only the (N*D,) new
state. The two index gathers become one-hot matmuls on the MXU (exact on the
one-hot side; the (S,S) tables round to bf16, a 2^-8 relative quantization
far below the Poisson sampling noise), and the Poisson draw uses the on-core
PRNG (pltpu.prng_random_bits) so no random bits ever touch HBM.

Modes:
- "poisson":  jump counts ~ Poisson(rev * h) by CDF inversion (the same
              fixed-series inversion as sampling.poisson_inversion), summed
              ordinal offset, clip — the TauL / MidPointTauL full step.
- "expected": deterministic drift round(h * sum_s rev * (s - x_g)) — the
              MidPointTauL half-step (sampling.py:414-436 equivalents).

`x_gather` indexes the rate tables / mask / state-change (x' in midpoint's
full step); `x_base` is the state the jump is applied to. TauL passes the
same array for both.

`fused_tau_leap_update_xla` is the bit-faithful plain-XLA mirror (same bf16
table rounding, injectable uniforms) used for parity tests and as the
non-TPU fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_POISSON_K = 12


def _poisson_inversion_from_u(u, lam, max_k: int = MAX_POISSON_K):
    """N = #{k : u > P(Poisson(lam) <= k)}, fixed unrolled series (exact up
    to P(N > max_k); see sampling.poisson_inversion)."""
    pmf = jnp.exp(-lam)
    cdf = pmf
    n = jnp.zeros(lam.shape, jnp.float32)
    for k in range(1, max_k + 1):
        n = n + (u > cdf).astype(jnp.float32)
        pmf = pmf * lam / k
        cdf = cdf + pmf
    return n


def _update_kernel(
    seed_ref, h_ref, eps_ref,  # SMEM scalars
    logits_ref, xg_ref, xb_ref, qt0_ref, rate_ref,  # VMEM tensors
    out_ref,
    *, mode: str, is_ordinal: bool, S: int,
):
    R = logits_ref.shape[0]
    xg = xg_ref[:]  # (R, 1) int32
    iota = jax.lax.broadcasted_iota(jnp.int32, (R, S), 1)
    oh = (iota == xg).astype(jnp.bfloat16)  # exact one-hot

    # softmax over the vocab
    logits = logits_ref[:]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)

    # gathers as one-hot contractions against the SECOND table axis:
    # qd[r, s] = qt0[s, xg[r]],  fwd[r, s] = rate[s, xg[r]]
    gather_dn = (((1,), (1,)), ((), ()))
    qd = jax.lax.dot_general(
        oh, qt0_ref[:], dimension_numbers=gather_dn,
        preferred_element_type=jnp.float32,
    )
    fwd = jax.lax.dot_general(
        oh, rate_ref[:], dimension_numbers=gather_dn,
        preferred_element_type=jnp.float32,
    )

    # ratio[r, s] = sum_k p[r, k] / qd[r, k] * qt0[k, s]
    a = (p / (qd + eps_ref[0, 0])).astype(jnp.bfloat16)
    ratio = jax.lax.dot_general(
        a, qt0_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    rev = fwd * ratio * (1.0 - oh.astype(jnp.float32))
    diff = (iota - xg).astype(jnp.float32)
    h = h_ref[0, 0]

    if mode == "expected":
        drift = h * jnp.sum(rev * diff, axis=-1, keepdims=True)
        jump = jnp.round(drift).astype(jnp.int32)
    elif mode == "poisson":
        # seed words kept in independent dimensions: `seed + program_id`
        # would alias tile i of step-seed s with tile i-k of step-seed s+k,
        # reusing a tile's uniform stream across two timesteps whenever two
        # step seeds land within grid-size of each other
        pltpu.prng_seed(seed_ref[0, 0], pl.program_id(0))
        bits = pltpu.bitcast(pltpu.prng_random_bits((R, S)), jnp.uint32)
        # Mosaic cannot lower uint32->f32 converts; build u in [0, 1) by
        # splicing the top 23 random bits into a f32 mantissa with unit
        # exponent (value in [1, 2)) and subtracting 1.
        mant = (bits >> 9) | jnp.uint32(0x3F800000)
        u = pltpu.bitcast(mant, jnp.float32) - 1.0
        n = _poisson_inversion_from_u(u, rev * h)
        if not is_ordinal:
            tot = jnp.sum(n, axis=-1, keepdims=True)
            n = n * (tot <= 1.0).astype(jnp.float32)
        jump = jnp.sum(n * diff, axis=-1, keepdims=True).astype(jnp.int32)
    else:
        raise ValueError(mode)

    out_ref[:] = jnp.clip(xb_ref[:] + jump, 0, S - 1)


@functools.partial(
    jax.jit,
    static_argnames=("mode", "is_ordinal", "tile_r", "interpret"),
)
def fused_tau_leap_update(
    logits, x_gather, x_base, qt0, rate, h, eps, seed,
    *, mode: str = "poisson", is_ordinal: bool = True, tile_r: int = 256,
    interpret: bool = False,
):
    """One fused sampler-update step.

    Args:
      logits:   (N, D, S) f32 network output.
      x_gather: (N, D) int32 — indexes tables/mask/state-change.
      x_base:   (N, D) int32 — state the jump is applied to.
      qt0/rate: (S, S) f32 shared-timestep tables (rounded to bf16 inside).
      h, eps:   python/traced scalars.
      seed:     int32 scalar (poisson mode PRNG seed).
    Returns (N, D) int32 new state.
    """
    N, D, S = logits.shape
    NR = N * D
    logits = logits.reshape(NR, S)
    xg = x_gather.reshape(NR, 1).astype(jnp.int32)
    xb = x_base.reshape(NR, 1).astype(jnp.int32)
    pad = (-NR) % tile_r
    if pad:
        logits = jnp.pad(logits, ((0, pad), (0, 0)))
        xg = jnp.pad(xg, ((0, pad), (0, 0)))
        xb = jnp.pad(xb, ((0, pad), (0, 0)))
    NRp = NR + pad

    h_arr = jnp.full((1, 1), h, jnp.float32)
    eps_arr = jnp.full((1, 1), eps, jnp.float32)
    seed_arr = jnp.full((1, 1), seed, jnp.int32)

    row_spec = lambda w: pl.BlockSpec(
        (tile_r, w), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    table_spec = pl.BlockSpec(
        (S, S), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    smem = pl.BlockSpec(
        (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
    )

    out = pl.pallas_call(
        functools.partial(
            _update_kernel, mode=mode, is_ordinal=is_ordinal, S=S
        ),
        grid=(NRp // tile_r,),
        in_specs=[smem, smem, smem, row_spec(S), row_spec(1), row_spec(1),
                  table_spec, table_spec],
        out_specs=row_spec(1),
        out_shape=jax.ShapeDtypeStruct((NRp, 1), jnp.int32),
        interpret=interpret,
    )(seed_arr, h_arr, eps_arr, logits, xg, xb,
      qt0.astype(jnp.bfloat16), rate.astype(jnp.bfloat16))
    return out[:NR, 0].reshape(N, D)


def fused_tau_leap_update_xla(
    logits, x_gather, x_base, qt0, rate, h, eps, u=None,
    *, mode: str = "poisson", is_ordinal: bool = True, key=None,
):
    """Plain-XLA mirror with the kernel's exact bf16 table rounding.

    `u` (N, D, S) uniforms may be injected for deterministic parity tests;
    otherwise drawn from `key`. Used as the non-TPU fallback in samplers.
    """
    N, D, S = logits.shape
    qt0b = qt0.astype(jnp.bfloat16)
    rateb = rate.astype(jnp.bfloat16)
    p = jax.nn.softmax(logits, axis=-1)
    qd = jnp.take(
        jnp.swapaxes(qt0b, 0, 1).astype(jnp.float32), x_gather, axis=0
    )
    fwd = jnp.take(
        jnp.swapaxes(rateb, 0, 1).astype(jnp.float32), x_gather, axis=0
    )
    a = (p / (qd + eps)).astype(jnp.bfloat16)
    ratio = jax.lax.dot_general(
        a.reshape(N * D, S), qt0b,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(N, D, S)
    iota = jnp.arange(S, dtype=jnp.int32)[None, None, :]
    oh = (iota == x_gather[:, :, None]).astype(jnp.float32)
    rev = fwd * ratio * (1.0 - oh)
    diff = (iota - x_gather[:, :, None]).astype(jnp.float32)
    if mode == "expected":
        jump = jnp.round(h * jnp.sum(rev * diff, axis=-1)).astype(jnp.int32)
    elif mode == "poisson":
        if u is None:
            u = jax.random.uniform(key, rev.shape)
        n = _poisson_inversion_from_u(u, rev * h)
        if not is_ordinal:
            tot = jnp.sum(n, axis=-1, keepdims=True)
            n = n * (tot <= 1.0).astype(jnp.float32)
        jump = jnp.sum(n * diff, axis=-1).astype(jnp.int32)
    else:
        raise ValueError(mode)
    return jnp.clip(x_base + jump, 0, S - 1)
