"""Fused tau-leap update kernel == XLA mirror / existing sampler math.

Deterministic ("expected") mode is compared exactly against the XLA mirror
in interpret mode; the stochastic ("poisson") mode is validated three ways:
the mirror with injected uniforms reproduces the existing sampler composite
(reverse_rates_shared + _poisson_jump_update) up to bf16 table rounding, the
kernel is deterministic in its seed, and kernel jump statistics match the
mirror's Poisson statistics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctdd_tpu.ops import fused_update as fu


def _inputs(N=2, D=96, S=128, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    logits = 2.0 * jax.random.normal(ks[0], (N, D, S))
    # PSD-ish tables with positive entries, roughly transition/rate scaled
    qt0 = jax.random.uniform(ks[1], (S, S)) * 0.1 + 1e-3
    qt0 = qt0 / jnp.sum(qt0, axis=-1, keepdims=True)
    rate = jax.random.uniform(ks[2], (S, S)) * 3.0
    x = jax.random.randint(ks[3], (N, D), 0, S)
    return logits, qt0, rate, x


def test_expected_mode_kernel_matches_mirror():
    logits, qt0, rate, x = _inputs()
    h = 0.37
    got = fu.fused_tau_leap_update(
        logits, x, x, qt0, rate, h, 1e-9, 0,
        mode="expected", tile_r=64, interpret=True,
    )
    want = fu.fused_tau_leap_update_xla(
        logits, x, x, qt0, rate, h, 1e-9, mode="expected"
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_expected_mode_distinct_gather_base():
    # midpoint full step: rates/state-change at x', jumps applied to x
    logits, qt0, rate, x = _inputs(seed=1)
    xp = jnp.clip(x + 1, 0, qt0.shape[0] - 1)
    got = fu.fused_tau_leap_update(
        logits, xp, x, qt0, rate, 0.2, 1e-9, 0,
        mode="expected", tile_r=64, interpret=True,
    )
    want = fu.fused_tau_leap_update_xla(
        logits, xp, x, qt0, rate, 0.2, 1e-9, mode="expected"
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_mirror_matches_sampler_composite():
    """XLA mirror (bf16 tables) ~= the live sampler composite (f32 tables)."""
    from ctdd_tpu.sampling.samplers import _poisson_jump_update
    from ctdd_tpu.ops import indexing

    logits, qt0, rate, x = _inputs(seed=2)
    N, D, S = logits.shape
    h, eps = 0.01, 1e-9
    u = jax.random.uniform(jax.random.PRNGKey(7), (N, D, S))

    # mirror with injected uniforms
    got = fu.fused_tau_leap_update_xla(
        logits, x, x, qt0, rate, h, eps, u=u, mode="poisson"
    )

    # live composite: shared-t reverse rates + poisson inversion update,
    # with the same uniforms driving the inversion
    p = jax.nn.softmax(logits, axis=-1)
    qd = jnp.take(qt0.T, x, axis=0) + eps
    fwd = jnp.take(rate.T, x, axis=0)
    ratio = jnp.einsum("bds,sk->bdk", p / qd, qt0)
    rev = fwd * ratio * indexing.onehot_mask(x, S)
    n = fu._poisson_inversion_from_u(u, rev * h)
    diff = (jnp.arange(S)[None, None, :] - x[:, :, None]).astype(jnp.float32)
    want = jnp.clip(
        x + jnp.sum(n * diff, axis=-1).astype(jnp.int32), 0, S - 1
    )

    # bf16 table rounding can flip a borderline CDF comparison on a few
    # entries; the states must agree except for rare +-1 borderline jumps
    got, want = np.asarray(got), np.asarray(want)
    frac_diff = np.mean(got != want)
    assert frac_diff < 0.02, frac_diff
    assert np.max(np.abs(got.astype(int) - want.astype(int))) <= S


_TPU_ONLY = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="in-kernel PRNG (pltpu.prng_random_bits) is a zero-stub in the "
    "CPU interpreters; exercised on hardware via scripts/bench_fused_update.py",
)


@_TPU_ONLY
def test_poisson_mode_kernel_deterministic_in_seed():
    logits, qt0, rate, x = _inputs(seed=3)
    kw = dict(mode="poisson", tile_r=64)
    a = fu.fused_tau_leap_update(logits, x, x, qt0, rate, 0.05, 1e-9, 11, **kw)
    b = fu.fused_tau_leap_update(logits, x, x, qt0, rate, 0.05, 1e-9, 11, **kw)
    c = fu.fused_tau_leap_update(logits, x, x, qt0, rate, 0.05, 1e-9, 12, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.any(np.asarray(a) != np.asarray(c))


@_TPU_ONLY
def test_poisson_mode_kernel_statistics_match_mirror():
    """Mean jump magnitude of the kernel's PRNG stream matches the mirror's
    threefry stream (both are Poisson(rev*h) thinnings)."""
    logits, qt0, rate, x = _inputs(N=4, D=128, S=128, seed=4)
    h = 0.08
    got = fu.fused_tau_leap_update(
        logits, x, x, qt0, rate, h, 1e-9, 5,
        mode="poisson", tile_r=128,
    )
    want = fu.fused_tau_leap_update_xla(
        logits, x, x, qt0, rate, h, 1e-9,
        key=jax.random.PRNGKey(5), mode="poisson",
    )
    dg = np.abs(np.asarray(got) - np.asarray(x)).mean()
    dw = np.abs(np.asarray(want) - np.asarray(x)).mean()
    # both are means over 4*128 dims of the same jump distribution
    assert abs(dg - dw) / max(dw, 1e-9) < 0.15, (dg, dw)


def test_nonordinal_rejection():
    logits, qt0, rate, x = _inputs(seed=5)
    u = jnp.zeros(logits.shape)  # u=0 -> zero jumps everywhere
    got = fu.fused_tau_leap_update_xla(
        logits, x, x, qt0, rate, 0.5, 1e-9, u=u,
        mode="poisson", is_ordinal=False,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(x))


def test_pad_path():
    # N*D not a multiple of tile_r exercises the padded rows
    logits, qt0, rate, x = _inputs(N=1, D=50, S=128, seed=6)
    got = fu.fused_tau_leap_update(
        logits, x, x, qt0, rate, 0.1, 1e-9, 0,
        mode="expected", tile_r=64, interpret=True,
    )
    want = fu.fused_tau_leap_update_xla(
        logits, x, x, qt0, rate, 0.1, 1e-9, mode="expected"
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
