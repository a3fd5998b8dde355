"""MMD metric tests (SURVEY.md §4f: identical sets ≈ 0, discrimination)."""

import jax.numpy as jnp
import numpy as np

from ctdd_tpu.config.presets import get_preset
from ctdd_tpu.metrics.mmd import (
    binary_exp_hamming_mmd,
    binary_hamming_mmd,
    eval_mmd,
    exp_hamming_mmd,
    mmd_rbf,
)


def _bits(n, d, p, seed):
    return jnp.asarray(
        (np.random.RandomState(seed).rand(n, d) < p).astype(np.int32)
    )


def test_identical_distributions_near_zero():
    x = _bits(512, 16, 0.3, 0)
    y = _bits(512, 16, 0.3, 1)
    assert abs(float(binary_exp_hamming_mmd(x, y))) < 2e-3


def test_different_distributions_positive():
    x = _bits(512, 16, 0.2, 0)
    y = _bits(512, 16, 0.8, 1)
    far = float(binary_exp_hamming_mmd(x, y))
    near = float(binary_exp_hamming_mmd(x, _bits(512, 16, 0.2, 2)))
    assert far > 10 * abs(near)
    assert float(binary_hamming_mmd(x, y)) > 0


def test_float_space_variants():
    cfg = get_preset("mlp_synthetic")
    cfg.model.concat_dim = 32
    x = _bits(64, 32, 0.5, 0)
    y = _bits(64, 32, 0.5, 1)
    assert np.isfinite(float(exp_hamming_mmd(x, y, cfg)))
    assert np.isfinite(mmd_rbf(np.asarray(x), np.asarray(y), cfg))


def test_eval_mmd_loop():
    class DS:
        data = np.asarray((np.random.RandomState(0).rand(512, 16) < 0.3)).astype(
            np.int32
        )

        def __len__(self):
            return 512

    cfg = get_preset("mlp_synthetic")

    def sample_fn(key, n):
        return (np.random.RandomState(int(key[1]) % 2**31).rand(n, 16) < 0.3).astype(
            np.int32
        )

    mmd = eval_mmd(cfg, sample_fn, DS(), n_rounds=2, n_samples=128)
    assert abs(mmd) < 0.01
