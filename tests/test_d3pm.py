"""D3PM baseline tests (SURVEY.md §4d: cumulative-product identities etc.)."""

import jax
import jax.numpy as jnp
import ml_collections
import numpy as np
import pytest

from ctdd_tpu.d3pm.diffusion import (
    CategoricalDiffusion,
    D3PMLoss,
    get_diffusion_betas,
    make_diffusion,
)


def model_cfg(T=8, S=4, mat="uniform", loss_type="kl"):
    return ml_collections.ConfigDict(
        {
            "type": "linear",
            "start": 0.02,
            "stop": 0.5,
            "num_timesteps": T,
            "model_prediction": "x_start",
            "model_output": "logits",
            "transition_mat_type": mat,
            "transition_bands": None,
            "loss_type": loss_type,
            "hybrid_coeff": 0.01,
            "num_pixel_vals": S,
        }
    )


@pytest.mark.parametrize("mat", ["uniform", "gaussian", "absorbing"])
def test_onestep_mats_are_stochastic(mat):
    d = make_diffusion(model_cfg(mat=mat))
    q = np.asarray(d.q_onestep_mats)
    np.testing.assert_allclose(q.sum(-1), 1.0, atol=1e-5)
    assert (q >= -1e-9).all()


def test_cumulative_product_identity():
    d = make_diffusion(model_cfg())
    # q_mats[t] == q_onestep[0] @ ... @ q_onestep[t]
    acc = np.asarray(d.q_onestep_mats[0], np.float64)
    for t in range(d.num_timesteps):
        if t > 0:
            acc = acc @ np.asarray(d.q_onestep_mats[t], np.float64)
        np.testing.assert_allclose(np.asarray(d.q_mats[t]), acc, atol=1e-5)


def test_betas_schedules():
    for kind in ["linear", "cosine", "jsd"]:
        cfg = model_cfg()
        cfg.type = kind
        b = get_diffusion_betas(cfg)
        assert len(b) == cfg.num_timesteps
        assert (b > 0).all() and (b <= 1).all()


def test_q_posterior_bayes_identity():
    """q(x_{t-1}|x_t, x0) ∝ q(x_t|x_{t-1}) q(x_{t-1}|x0) — check normalization."""
    d = make_diffusion(model_cfg())
    B, D = 2, 3
    key = jax.random.PRNGKey(0)
    x0 = jax.random.randint(key, (B, D), 0, 4)
    xt = jax.random.randint(jax.random.PRNGKey(1), (B, D), 0, 4)
    t = jnp.array([3, 5])
    logits = d.q_posterior_logits(x0, xt, t, x_start_logits=False)
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    # manual bayes for one element
    b, dd = 0, 0
    tt = int(t[0])
    q_os = np.asarray(d.q_onestep_mats[tt], np.float64)
    q_bar = np.asarray(d.q_mats[tt - 1], np.float64)
    post = q_os[:, int(xt[b, dd])] * q_bar[int(x0[b, dd]), :]
    post = post / post.sum()
    np.testing.assert_allclose(probs[b, dd], post, atol=1e-4)


def _dummy_model_fn(S):
    def fn(x, t):
        B, D = x.shape
        return jnp.tile(
            jnp.arange(S, dtype=jnp.float32)[None, None, :] * 0.1, (B, D, 1)
        )

    return fn


@pytest.mark.parametrize("loss_type", ["kl", "cross_entropy_x_start", "hybrid"])
def test_training_losses_finite(loss_type):
    d = make_diffusion(model_cfg(loss_type=loss_type))
    x0 = jax.random.randint(jax.random.PRNGKey(0), (4, 6), 0, 4)
    t = jax.random.randint(jax.random.PRNGKey(1), (4,), 0, d.num_timesteps)
    losses = d.training_losses(jax.random.PRNGKey(2), _dummy_model_fn(4), x0, t)
    assert losses.shape == (4,)
    assert np.isfinite(np.asarray(losses)).all()


def test_p_sample_loop_runs():
    d = make_diffusion(model_cfg())
    x = d.p_sample_loop(jax.random.PRNGKey(0), _dummy_model_fn(4), (3, 5))
    assert x.shape == (3, 5)
    assert (np.asarray(x) >= 0).all() and (np.asarray(x) < 4).all()


def test_calc_bpd_loop():
    d = make_diffusion(model_cfg())
    x0 = jax.random.randint(jax.random.PRNGKey(0), (2, 4), 0, 4)
    out = d.calc_bpd_loop(jax.random.PRNGKey(1), _dummy_model_fn(4), x0)
    assert out["total"].shape == (2,)
    assert out["vbterms"].shape == (2, d.num_timesteps)
    assert np.isfinite(np.asarray(out["total"])).all()


def test_d3pm_loss_with_model():
    from ctdd_tpu.models.base import create_model

    cfg = ml_collections.ConfigDict()
    cfg.data = ml_collections.ConfigDict(
        {"S": 2, "shape": [6], "batch_size": 4, "num_samples": 16}
    )
    cfg.model = ml_collections.ConfigDict(
        {
            "name": "UniBertD3PM", "concat_dim": 6, "embed_dim": 16,
            "qkv_dim": 16, "mlp_dim": 32, "num_layers": 1, "num_heads": 2,
            "num_output_ffresiduals": 1, "dropout_rate": 0.0,
            "attention_dropout_rate": 0.0, "transformer_norm_type": "prenorm",
            "use_cat": False, "use_one_hot_input": False, "readout": "resnet",
            "is_ebm": False, "time_scale_factor": 1000, "ema_decay": 0.999,
            # d3pm section
            "type": "linear", "start": 0.02, "stop": 0.5, "num_timesteps": 6,
            "model_prediction": "x_start", "model_output": "logits",
            "transition_mat_type": "uniform", "transition_bands": None,
            "loss_type": "hybrid", "hybrid_coeff": 0.01, "num_pixel_vals": 2,
        }
    )
    cfg.loss = ml_collections.ConfigDict({"logit_type": "direct"})
    model = create_model(cfg)
    x = jnp.zeros((2, 6), jnp.int32)
    t = jnp.full((2,), 1.0)
    params = model.init(jax.random.PRNGKey(0), x, t)
    diffusion = make_diffusion(cfg.model)
    loss = D3PMLoss(cfg, diffusion)
    batch = jax.random.randint(jax.random.PRNGKey(1), (4, 6), 0, 2)
    val = loss.calc_loss(model, params, jax.random.PRNGKey(2), batch, train=False)
    assert np.isfinite(float(val))
