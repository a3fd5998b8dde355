"""Maze 3-state + padded UNet + CTElbo + LBJF/200 decode.

Mirrors reference config/maze_config/config_tauUnet_maze.py for the
net/process/training recipe. The reference's sampler name "ElboTauL" is
unregistered there; the functioning equivalent family is {TauL, LBJF} on the
CTElbo rate path.

Decode default deviates from the reference, measured (round-3 sweep,
docs/assets/round3/maze_sweep.jsonl + maze_500k_full_schedule.jsonl): on the
240k checkpoint LBJF/200/EMA decodes 44.5% exact-solvable vs TauL/1000's
37.1%, and on the 500k fresh-stream run 39.9% vs 33.6% — LBJF at 5x fewer
steps beats TauL everywhere we measured on maze. TauL/1000 stays one
``--set sampler.name=TauL sampler.num_steps=1000`` away for reference
bit-parity.
"""

import ml_collections

from ctdd_tpu.config.presets._base import (
    adam, base_config, loss_section, sampler_section, saving_section,
    training_section,
)


def get_config():
    config = base_config("maze_unet")
    loss_section(config, name="CTElbo", nll_weight=0.001, min_time=0.001)
    training_section(config, n_iters=500000, grad_norm=1.0, max_t=1.0)
    config.data = ml_collections.ConfigDict(
        dict(
            name="Maze3S", train=True, download=False, S=3, batch_size=64, stream_fresh=True,
            shuffle=True, image_size=15, shape=[1, 15, 15], use_augm=False,
            crop_wall=False, limit=1, random_transform=True, num_samples=6400,
        )
    )
    config.model = ml_collections.ConfigDict(
        dict(
            name="UniVarUnetEMA", ema_decay=0.9999, padding=True, ch=64,
            num_res_blocks=3, ch_mult=[1, 2, 2], input_channels=1,
            scale_count_to_put_attn=1, data_min_max=[0, 2], dropout=0.1,
            skip_rescale=True, time_embed_dim=64, time_scale_factor=1000,
            fix_logistic=False, model_output="logits", num_heads=8,
            attn_resolutions=[32], concat_dim=225, rate_const=2.0,
            t_func="log_sqr", Q_sigma=512.0, image_size=15,
        )
    )
    adam(config, 2e-4)
    saving_section(config)
    sampler_section(config, name="LBJF", num_steps=200, is_ordinal=False)
    return config
