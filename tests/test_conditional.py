"""Conditional pipeline: CondCTElbo loss + conditional samplers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctdd_tpu.config.presets import get_preset
from ctdd_tpu.losses.losses import CondCTElbo, get_loss
from ctdd_tpu.models.base import create_model
from ctdd_tpu.sampling.samplers import get_sampler


def cond_cfg(sampler_name="ConditionalTauLeaping"):
    cfg = get_preset("bert_synthetic")
    cfg.data.shape = [10]
    cfg.data.S = 4
    cfg.model.concat_dim = 10
    cfg.model.embed_dim = 16
    cfg.model.qkv_dim = 16
    cfg.model.mlp_dim = 32
    cfg.model.num_layers = 1
    cfg.model.num_heads = 2
    cfg.model.num_output_ffresiduals = 1
    cfg.model.readout = "resnet"
    cfg.model.is_ebm = False
    cfg.model.rate_const = 1.0
    cfg.model.t_func = "log_sqr"
    cfg.loss.name = "CondCTElbo"
    cfg.loss.condition_dim = 3
    cfg.sampler.name = sampler_name
    cfg.sampler.num_steps = 5
    cfg.sampler.condition_dim = 3
    cfg.sampler.reject_multiple_jumps = False
    cfg.sampler.num_corrector_steps = 0
    return cfg


@pytest.fixture(scope="module")
def setup():
    cfg = cond_cfg()
    model = create_model(cfg)
    x = jnp.zeros((2, 10), jnp.int32)
    t = jnp.full((2,), 0.5)
    params = model.init(jax.random.PRNGKey(0), x, t)
    return cfg, model, params


def test_cond_ctelbo_finite(setup):
    cfg, model, params = setup
    loss = CondCTElbo(cfg)
    batch = jax.random.randint(jax.random.PRNGKey(1), (4, 10), 0, 4)
    val = loss.calc_loss(model, params, jax.random.PRNGKey(2), batch, train=False)
    assert np.isfinite(float(val))


def test_cond_nll_finite_and_registered(setup):
    cfg, model, params = setup
    cfg = cond_cfg()
    cfg.loss.name = "CondNLL"
    loss = get_loss(cfg)
    assert type(loss).__name__ == "CondNLL"
    batch = jax.random.randint(jax.random.PRNGKey(1), (4, 10), 0, 4)
    val = loss.calc_loss(model, params, jax.random.PRNGKey(2), batch, train=False)
    # a cross-entropy over S=4 classes: finite, nonnegative, bounded by a
    # few nats at init
    assert np.isfinite(float(val))
    assert 0.0 <= float(val) < 10.0


def test_cond_nll_is_suffix_ce(setup):
    """CondNLL == mean CE of the suffix logits under the same corruption."""
    cfg, model, params = setup
    cfg = cond_cfg()
    cfg.loss.name = "CondNLL"
    loss = get_loss(cfg)
    batch = jax.random.randint(jax.random.PRNGKey(5), (4, 10), 0, 4)
    key = jax.random.PRNGKey(7)
    val = loss.calc_loss(model, params, key, batch, train=False)

    # replicate by hand with the shared helpers
    from ctdd_tpu.losses.losses import _sample_ts, sample_xt_xtilde
    from ctdd_tpu.utils.math import mean_cross_entropy

    x0 = batch
    cond, data = x0[:, :3], x0[:, 3:]
    kt, ks = jax.random.split(key)
    ts = _sample_ts(kt, 4, cfg.loss.min_time, 1.0)
    qt0 = model.transition(ts)
    rate = model.rate(ts)
    x_t, x_tilde = sample_xt_xtilde(ks, qt0, rate, data)
    reg_x = x_tilde if cfg.loss.one_forward_pass else x_t
    logits = model.apply(params, jnp.concatenate([cond, reg_x], axis=1), ts,
                         train=False)
    expect = mean_cross_entropy(logits[:, 3:, :], data)
    np.testing.assert_allclose(float(val), float(expect), rtol=1e-6)


@pytest.mark.parametrize(
    "sampler_name",
    ["ConditionalTauLeaping", "ConditionalPCTauLeaping", "ConditionalLBJF"],
)
def test_conditional_samplers_preserve_conditioner(setup, sampler_name):
    cfg, model, params = setup
    cfg.sampler.name = sampler_name
    sampler = get_sampler(cfg)
    conditioner = jax.random.randint(jax.random.PRNGKey(3), (6, 3), 0, 4)
    out = sampler.sample(model, params, jax.random.PRNGKey(4), N=6,
                         conditioner=conditioner)
    assert out.shape == (6, 10)
    # the conditioner prefix is returned verbatim (sampling.py:757)
    np.testing.assert_array_equal(out[:, :3], np.asarray(conditioner))
    assert out.min() >= 0 and out.max() < 4
