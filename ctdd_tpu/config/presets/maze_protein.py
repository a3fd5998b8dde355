"""Maze + protein dilated-conv score net + CTElbo + tau-leaping
(ref config/maze_config/config_protein_maze.py: UniVarProteinScoreNetEMA,
min_time 0.007, grad_norm 35, lr 1.5e-4, sampler "ElboTauL" — an alias the
reference never registers; it resolves to TauL here)."""

import ml_collections

from ctdd_tpu.config.presets._base import (
    adam, base_config, loss_section, sampler_section, saving_section,
    training_section,
)


def maze_data_section(config, **kw):
    d = dict(
        name="Maze3S", is_img=True, S=3, batch_size=128, shuffle=True, stream_fresh=True,
        train=True, download=False, image_size=15, shape=[1, 15, 15],
        use_augm=False, crop_wall=False, limit=1, random_transform=True,
        num_samples=6400,
    )
    d.update(kw)
    config.data = ml_collections.ConfigDict(d)
    return config.data


def get_config():
    config = base_config("maze_protein")
    loss_section(config, name="CTElbo", nll_weight=0.0, min_time=0.007)
    training_section(config, n_iters=300000, grad_norm=35.0, max_t=0.99999)
    maze_data_section(config)
    config.model = ml_collections.ConfigDict(
        dict(
            name="UniVarProteinScoreNetEMA", is_ebm=False, rate_const=1.7,
            t_func="sqrt_cos", embed_dim=200, dropout_rate=0.1,
            concat_dim=225, ema_decay=0.9999, Q_sigma=20.0,
        )
    )
    adam(config, 1.5e-4)
    saving_section(config)
    sampler_section(
        config, name="ElboTauL", num_steps=1000, is_ordinal=False,
        num_corrector_steps=10, sample_freq=200000000,
    )
    return config
