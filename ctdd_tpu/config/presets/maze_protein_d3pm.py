"""Maze + protein dilated-conv score net + D3PM baseline
(ref config/maze_config/config_protein_maze_d3pm.py: UniProteinD3PM, cosine
betas, uniform transitions, hybrid loss, T=1000 — the one D3PM family config
missing from round 1; driven by the reference's train_maze_d3pm.py)."""

import ml_collections

from ctdd_tpu.config.presets._base import (
    adam, base_config, loss_section, sampler_section, saving_section,
    training_section,
)
from ctdd_tpu.config.presets.maze_protein import maze_data_section


def get_config():
    config = base_config("maze_protein_d3pm")
    loss_section(config, name="d3pm", min_time=0.007)
    training_section(config, n_iters=300000, grad_norm=35.0, max_t=0.99999)
    maze_data_section(config)
    config.model = ml_collections.ConfigDict(
        dict(
            name="UniProteinD3PM", is_ebm=False, rate_const=1.7,
            t_func="sqrt_cos", embed_dim=200, dropout_rate=0.1,
            concat_dim=225, ema_decay=0.9999, Q_sigma=20.0,
            # d3pm section (ref config lines: model.type='cosine' ...)
            type="cosine", start=0.02, stop=1.0, num_timesteps=1000,
            model_prediction="x_start", transition_mat_type="uniform",
            transition_bands=None, loss_type="hybrid", hybrid_coeff=0.01,
            model_output="logits", num_pixel_vals=3, is_img=True,
        )
    )
    adam(config, 1.5e-4)
    saving_section(config)
    sampler_section(
        config, name="ElboTauL", num_steps=1000, is_ordinal=False,
        num_corrector_steps=10, sample_freq=200000000,
    )
    return config
