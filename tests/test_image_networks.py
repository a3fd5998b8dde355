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
