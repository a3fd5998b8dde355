"""Pallas kernels == XLA references (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from ctdd_tpu.ops import pallas_kernels as pk


def _inputs(N=2, D=140, S=8, seed=0):
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 5)
    logits = jax.random.normal(ks[0], (N, D, S))
    qt0_cols = jax.random.uniform(ks[1], (N, D, S)) + 0.1
    qt0 = jax.random.uniform(ks[2], (N, S, S)) + 0.1
    rate_cols = jax.random.uniform(ks[3], (N, D, S))
    x = jax.random.randint(ks[4], (N, D), 0, S)
    return logits, qt0_cols, qt0, rate_cols, x


def test_reverse_rates_kernel_matches_xla():
    logits, qt0_cols, qt0, rate_cols, x = _inputs()
    want = pk.reverse_rates_xla(logits, qt0_cols, qt0, rate_cols, x)
    got = pk.reverse_rates_pallas(
        logits, qt0_cols, qt0, rate_cols, x, tile_d=64, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_euler_posterior_kernel_matches_xla():
    logits, qt0_cols, qt0, rate_cols, x = _inputs(seed=1)
    rev = pk.reverse_rates_xla(logits, qt0_cols, qt0, rate_cols, x)
    h = 0.013
    want = pk.euler_posterior_xla(rev, x, h)
    got = pk.euler_posterior_pallas(rev, x, h, tile_d=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
