"""Synthetic + Bert enum transformer + D3PM baseline
(ref config/synthetic_config/config_synthetic_d3pm.py)."""

from ctdd_tpu.config.presets._base import (
    adam, base_config, hollow_model_section, loss_section, sampler_section,
    saving_section, training_section,
)
from ctdd_tpu.config.presets.synthetic_hollow import synthetic_data_section


def get_config():
    config = base_config("synthetic_d3pm")
    loss_section(config, name="d3pm", min_time=0.007)
    training_section(config, n_iters=200000, grad_norm=1.0)
    synthetic_data_section(config)
    hollow_model_section(
        config, S=2, D=32, name="UniBertD3PM", rate_const=2.0,
        embed_dim=64, num_layers=3, mlp_dim=256, readout="resnet",
        use_one_hot_input=True, use_cat=True, is_ebm=False,
    )
    # d3pm section
    config.model.type = "linear"
    config.model.start = 0.02
    config.model.stop = 1.0
    config.model.num_timesteps = 500
    config.model.model_prediction = "x_start"
    config.model.transition_mat_type = "uniform"
    config.model.transition_bands = None
    config.model.loss_type = "hybrid"
    config.model.hybrid_coeff = 0.01
    config.model.num_pixel_vals = 2
    config.model.model_output = "logits"
    adam(config, 1.5e-4)
    saving_section(config)
    sampler_section(config, name="LBJF", num_steps=500, is_ordinal=False)
    return config
