"""Maze + Bert enum transformer + CTElbo + TauL
(ref config/maze_config/config_bert_maze.py; "ElboTauL" -> TauL)."""

import ml_collections

from ctdd_tpu.config.presets._base import (
    adam, base_config, hollow_model_section, loss_section, sampler_section,
    saving_section, training_section,
)


def get_config():
    config = base_config("maze_bert")
    loss_section(config, name="CTElbo", nll_weight=0.001, min_time=0.007)
    training_section(config, n_iters=400000, grad_norm=1.0, max_t=0.995)
    config.data = ml_collections.ConfigDict(
        dict(
            name="Maze3S", is_img=True, S=3, batch_size=128, shuffle=True, stream_fresh=True,
            train=True, download=False, image_size=15, shape=[1, 15, 15],
            use_augm=False, crop_wall=False, limit=1, random_transform=True,
            num_samples=6400,
        )
    )
    hollow_model_section(
        config, S=3, D=225, name="UniVarBertEMA", rate_const=1.55,
        embed_dim=128, num_layers=12, mlp_dim=1024, readout="resnet",
        num_output_ffresiduals=4, Q_sigma=20.0, is_ebm=False,
    )
    adam(config, 2e-4)
    saving_section(config)
    sampler_section(config, name="TauL", num_steps=1000, is_ordinal=False)
    return config
