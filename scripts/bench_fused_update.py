"""Race the fused Pallas tau-leap update against the live XLA composite.

Run on a free TPU (one axon client at a time!):
    python scripts/bench_fused_update.py [--n 256] [--d 784] [--s 256]

Measures, at the flagship sampling geometry, the per-step cost of everything
BETWEEN the network forward passes: reverse rates (shared-t p0t path) +
Poisson tau-leap state update. Prints one JSON line with both timings so the
win/lose call on VERDICT item 8 is a recorded number.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ctdd_tpu.ops import fused_update as fu
from ctdd_tpu.ops import indexing
from ctdd_tpu.sampling.samplers import (
    _poisson_jump_update,
    reverse_rates_shared,
)


def timeit(fn, *args, iters=50):
    fn(*args)  # compile
    jax.block_until_ready(fn(*args))
    t = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t) / iters


class _Proc:
    """Minimal process shim exposing shared-t transition/rate tables."""

    def __init__(self, qt0, rate):
        self._qt0, self._rate = qt0, rate

    def transition(self, t):
        return jnp.broadcast_to(self._qt0, (t.shape[0],) + self._qt0.shape)

    def rate(self, t):
        return jnp.broadcast_to(self._rate, (t.shape[0],) + self._rate.shape)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--d", type=int, default=784)
    ap.add_argument("--s", type=int, default=256)
    ap.add_argument("--tile-r", type=int, default=256)
    args = ap.parse_args()
    N, D, S = args.n, args.d, args.s

    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    logits = 2.0 * jax.random.normal(ks[0], (N, D, S))
    qt0 = jax.random.uniform(ks[1], (S, S)) * 0.1 + 1e-3
    qt0 = qt0 / jnp.sum(qt0, axis=-1, keepdims=True)
    rate = jax.random.uniform(ks[2], (S, S)) * 3.0
    x = jax.random.randint(ks[3], (N, D), 0, S)
    h, eps = 1e-3, 1e-9
    proc = _Proc(qt0, rate)

    @jax.jit
    def xla_step(logits, x, key):
        rev = reverse_rates_shared(
            proc, logits, x, jnp.float32(0.5),
            rate_param="p0t", logit_type="direct", eps=eps,
        )
        rev = rev * indexing.onehot_mask(x, S)
        return _poisson_jump_update(key, x, rev, h, S, True)

    @jax.jit
    def pallas_step(logits, x, seed):
        return fu.fused_tau_leap_update(
            logits, x, x, qt0, rate, h, eps, seed,
            mode="poisson", tile_r=args.tile_r,
        )

    @jax.jit
    def pallas_expected(logits, x):
        return fu.fused_tau_leap_update(
            logits, x, x, qt0, rate, 0.5 * h, eps, 0,
            mode="expected", tile_r=args.tile_r,
        )

    t_xla = timeit(xla_step, logits, x, jax.random.PRNGKey(1))
    t_pal = timeit(pallas_step, logits, x, 7)
    t_exp = timeit(pallas_expected, logits, x)

    # correctness on hardware (the pytest variants are TPU-gated because the
    # CPU interpreters stub the on-core PRNG): deterministic in seed, and
    # state statistics agree between the two stochastic paths
    a = pallas_step(logits, x, 3)
    a2 = pallas_step(logits, x, 3)
    a3 = pallas_step(logits, x, 4)
    assert bool(jnp.all(a == a2)), "kernel not deterministic in seed"
    assert bool(jnp.any(a != a3)), "kernel ignores seed"
    b = xla_step(logits, x, jax.random.PRNGKey(3))
    da = float(jnp.abs(a - x).mean())
    db = float(jnp.abs(b - x).mean())

    print(json.dumps({
        "geometry": [N, D, S],
        "xla_composite_ms": round(t_xla * 1e3, 4),
        "pallas_fused_ms": round(t_pal * 1e3, 4),
        "pallas_expected_ms": round(t_exp * 1e3, 4),
        "speedup": round(t_xla / t_pal, 3),
        "mean_jump_pallas": round(da, 5),
        "mean_jump_xla": round(db, 5),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
