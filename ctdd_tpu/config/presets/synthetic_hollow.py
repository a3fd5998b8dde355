"""Synthetic 2spirals + hollow transformer + ScoreElbo + LBJF.

Mirrors reference config/synthetic_config/config_hollow_synthetic.py (its
"CRMLBJF" sampler name is unregistered there; LBJF is the working path).
"""

import ml_collections

from ctdd_tpu.config.presets._base import (
    adam, base_config, hollow_model_section, loss_section, sampler_section,
    saving_section, training_section,
)


def synthetic_data_section(config, **kw):
    d = dict(
        name="SyntheticData", type="2spirals", is_img=False, S=2,
        binmode="gray", int_scale=6003.0107336488345,
        plot_size=4.458594271092115, batch_size=128, shuffle=True,
        shape=[32], location="data/synthetic/data_2spirals.npy",
        num_samples=100000,
    )
    d.update(kw)
    config.data = ml_collections.ConfigDict(d)
    return config.data


def get_config():
    config = base_config("synthetic_hollow")
    loss_section(
        config, name="ScoreElbo", logit_type="reverse_prob", loss_type="rm",
        nll_weight=0.01, min_time=0.007,
    )
    training_section(config, n_iters=200000, grad_norm=1.0)
    synthetic_data_section(config)
    hollow_model_section(
        config, S=2, D=32, embed_dim=64, num_layers=2, mlp_dim=256,
        num_heads=8, Q_sigma=512.0,
    )
    adam(config, 1.5e-4)
    saving_section(config)
    sampler_section(config, name="LBJF", num_steps=500)
    return config
