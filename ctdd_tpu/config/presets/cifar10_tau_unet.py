"""CIFAR10 + UNet + CTElboLambda + TauL
(ref config/cifar10_config/config_tauUnet_cifar10.py)."""

import ml_collections

from ctdd_tpu.config.presets._base import (
    adam, base_config, loss_section, sampler_section, saving_section,
    training_section,
)


def get_config():
    config = base_config("cifar10")
    loss_section(config, name="CTElboLambda", min_time=0.01)
    training_section(config, n_iters=500000, grad_norm=1.0, max_t=1.0)
    config.data = ml_collections.ConfigDict(
        dict(
            name="DiscreteCIFAR10", train=True, download=False, S=256,
            batch_size=64, shuffle=True, image_size=32, shape=[3, 32, 32],
            random_flips=True, use_augm=False, location="data/cifar10/cifar10.npz",
        )
    )
    config.model = ml_collections.ConfigDict(
        dict(
            name="GaussianTargetRateImageX0PredEMAPaul", padding=False,
            ema_decay=0.9999, ch=128, num_res_blocks=2, ch_mult=[1, 2, 2, 2],
            input_channels=3, scale_count_to_put_attn=1, data_min_max=[0, 255],
            dropout=0.1, skip_rescale=True, time_embed_dim=128,
            time_scale_factor=1000, fix_logistic=False,
            model_output="logistic_pars", num_heads=8, attn_resolutions=[64],
            concat_dim=3072, rate_sigma=6.0, Q_sigma=512.0, time_exp=100.0,
            time_base=3.0,
        )
    )
    adam(config, 2e-4)
    saving_section(config, checkpoint_freq=1000)
    sampler_section(
        config, name="TauL", num_steps=1000, initial_dist="gaussian",
        is_ordinal=True,
    )
    return config
