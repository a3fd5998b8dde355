"""DiT / U-ViT / tau-UNet wrapper tests."""

import jax
import jax.numpy as jnp
import ml_collections
import numpy as np
import pytest

from ctdd_tpu.models.base import create_model


def img_cfg(name, model_output="logits", S=8, size=8):
    cfg = ml_collections.ConfigDict()
    cfg.data = ml_collections.ConfigDict(
        {"S": S, "image_size": size, "shape": [1, size, size],
         "batch_size": 4, "num_samples": 16}
    )
    cfg.model = ml_collections.ConfigDict(
        {
            "name": name, "concat_dim": size * size,
            # vit-ish knobs
            "patch_size": 2, "input_channel": 1, "hidden_dim": 16,
            "depth": 2, "num_heads": 2, "mlp_ratio": 2.0, "dropout": 0.1,
            "model_output": model_output, "fix_logistic": False,
            # gaussian process knobs
            "rate_sigma": 6.0, "Q_sigma": 32.0, "time_exp": 100.0,
            "time_base": 3.0, "ema_decay": 0.999,
            # tau-unet knobs
            "ch": 8, "num_res_blocks": 1, "num_scales": 2, "ch_mult": [1, 2],
            "input_channels": 1, "scale_count_to_put_attn": 1,
            "data_min_max": [0, S - 1], "skip_rescale": True,
            "time_scale_factor": 1000, "time_embed_dim": 8,
        }
    )
    cfg.loss = ml_collections.ConfigDict({"logit_type": "direct"})
    return cfg


@pytest.mark.parametrize(
    "name,output",
    [
        ("GaussianDiTEMA", "logits"),
        ("GaussianDiTEMA", "logistic_pars"),
        ("GaussianUViTEMA", "logits"),
        ("GaussianTargetRateImageX0PredEMA", "logistic_pars"),
    ],
)
def test_image_wrappers(name, output):
    cfg = img_cfg(name, model_output=output)
    model = create_model(cfg)
    D = cfg.model.concat_dim
    x = jnp.zeros((2, D), jnp.int32)
    t = jnp.full((2,), 0.5)
    params = model.init(jax.random.PRNGKey(0), x, t)
    logits = model.apply(params, x, t)
    assert logits.shape == (2, D, cfg.data.S)
    assert np.isfinite(np.asarray(logits)).all()


def test_dit_adaln_zero_init():
    """adaLN-Zero: at init the DiT is (almost) input-independent through the
    gates; final layer zero-init means logits come only from final_conv(0+x)."""
    cfg = img_cfg("GaussianDiTEMA")
    model = create_model(cfg)
    D = cfg.model.concat_dim
    t = jnp.full((1,), 0.5)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, D), jnp.int32), t)
    # gradient flows
    def f(p):
        return jnp.sum(model.apply(p, jnp.zeros((1, D), jnp.int32), t) ** 2)

    g = jax.grad(f)(params)
    assert np.isfinite(
        sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(g))
    )


@pytest.mark.parametrize(
    "name",
    [
        "GaussianDiTEMA",
        "GaussianUViTEMA",
        "GaussianTargetRateImageX0PredEMA",   # tau-UNet (logistic head)
        "GaussianTargetRateImageX0PredEMAPaul",  # plain UNet
    ],
)
def test_compute_dtype_bf16_close_to_f32(name):
    """cfg.model.compute_dtype=bfloat16 keeps params f32 (same pytree) and
    produces logits close to the f32 forward (matmuls/convs on the MXU fast
    path, norms and heads in f32)."""
    cfg = img_cfg(name)
    if name == "GaussianTargetRateImageX0PredEMAPaul":
        cfg.model.model_output = "logits"
        cfg.model.attn_resolutions = [4]
        cfg.model.num_heads = 2
        cfg.model.padding = False
        cfg.data.shape = [1, 8, 8]
    model32 = create_model(cfg)
    D = cfg.model.concat_dim
    x = jax.random.randint(jax.random.PRNGKey(1), (2, D), 0, cfg.data.S)
    t = jnp.full((2,), 0.5)
    params = model32.init(jax.random.PRNGKey(0), x, t)
    out32 = model32.apply(params, x, t)

    cfg.model.compute_dtype = "bfloat16"
    model16 = create_model(cfg)
    params16 = model16.init(jax.random.PRNGKey(0), x, t)
    # same param pytree (f32 master weights) regardless of compute dtype
    assert jax.tree.structure(params) == jax.tree.structure(params16)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params16)):
        assert a.dtype == b.dtype == jnp.float32 or a.dtype == b.dtype

    out16 = model16.apply(params, x, t)
    a, b = np.asarray(out32), np.asarray(out16)
    assert np.isfinite(b).all()
    # bf16 mantissa is 8 bits; logits live in O(1..10) range here
    scale = max(1.0, float(np.abs(a).max()))
    assert np.abs(a - b).max() / scale < 0.1, np.abs(a - b).max()
