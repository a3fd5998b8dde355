"""Optimizer registry: schedules (constant/cosine/linear + warmup).

The reference uses constant-lr Adam with a linear warmup only
(ref lib/training/training.py:28-33). `optimizer.schedule` is beyond-ref,
motivated by the round-5 two-attractor collapse (DESIGN_NOTES "Round 5").
"""

import numpy as np
import pytest

from ctdd_tpu.config.presets import get_preset
from ctdd_tpu.training.optimizers import _schedule, get_optimizer


def cfg_with(schedule=None, warmup=0, n_iters=1000, lr=1e-3):
    cfg = get_preset("mlp_synthetic")
    cfg.optimizer.lr = lr
    cfg.training.n_iters = n_iters
    with cfg.unlocked():
        cfg.training.warmup = warmup
        if schedule is not None:
            cfg.optimizer.schedule = schedule
    return cfg


def as_fn(s):
    return s if callable(s) else (lambda _: s)


def test_constant_default_matches_reference():
    s = as_fn(_schedule(cfg_with()))
    assert float(s(0)) == float(s(999)) == 1e-3


def test_warmup_ramp_then_hold():
    s = as_fn(_schedule(cfg_with(warmup=100)))
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(50)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s(100)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(s(999)), 1e-3, rtol=1e-6)


@pytest.mark.parametrize("kind", ["cosine", "linear"])
def test_decay_reaches_end_factor(kind):
    s = as_fn(_schedule(cfg_with(schedule=kind, n_iters=1000)))
    np.testing.assert_allclose(float(s(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(s(1000)), 1e-4, rtol=1e-2)
    assert float(s(500)) < 1e-3


def test_warmup_composes_with_decay():
    s = as_fn(_schedule(cfg_with(schedule="cosine", warmup=100, n_iters=1000)))
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(100)), 1e-3, rtol=1e-6)
    assert float(s(600)) < 1e-3


def test_unknown_schedule_raises():
    with pytest.raises(ValueError, match="schedule"):
        _schedule(cfg_with(schedule="exponential"))


def test_optimizer_builds_and_steps():
    import jax.numpy as jnp

    cfg = cfg_with(schedule="cosine", warmup=10)
    tx = get_optimizer(cfg)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.ones((3,))}, state, params)
    assert updates["w"].shape == (3,)
