"""Maze 3-state + hollow transformer + ScoreElbo + LBJF.

Mirrors reference config/maze_config/config_hollow_maze.py. The reference's
sampler name "CRMLBJF" is unregistered there (SURVEY.md §7 quirks); the
functioning equivalent is LBJF on the CRM rate path.
"""

import ml_collections

from ctdd_tpu.config.presets._base import (
    adam, base_config, hollow_model_section, loss_section, sampler_section,
    saving_section, training_section,
)


def get_config():
    config = base_config("maze_hollow")
    loss_section(
        config, name="ScoreElbo", logit_type="reverse_prob", nll_weight=0.01,
        min_time=0.007,
    )
    training_section(config, n_iters=300000, grad_norm=3.0)
    config.data = ml_collections.ConfigDict(
        dict(
            name="Maze3S", S=3, is_img=True, batch_size=128, shuffle=True, stream_fresh=True,
            image_size=15, shape=[1, 15, 15], use_augm=False, crop_wall=False,
            limit=1, random_transform=True, num_samples=6400,
        )
    )
    hollow_model_section(
        config, S=3, D=225, rate_const=1.7, embed_dim=128, num_layers=8,
        mlp_dim=1024,
    )
    adam(config, 2e-4)
    saving_section(config)
    sampler_section(config, name="LBJF", num_steps=750)
    return config
