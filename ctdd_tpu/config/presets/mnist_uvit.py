"""MNIST + U-ViT + NLL loss + TauL (ref config/mnist_config/config_uvit_mnist.py)."""

import ml_collections

from ctdd_tpu.config.presets._base import (
    adam, base_config, loss_section, sampler_section, saving_section,
    training_section,
)


def get_config():
    config = base_config("mnist_uvit")
    loss_section(config, name="NLL", min_time=0.01)
    training_section(config, n_iters=600000, grad_norm=1.0, max_t=1.0)
    config.data = ml_collections.ConfigDict(
        dict(
            name="DiscreteMNIST", train=True, download=False, S=256,
            batch_size=64, shuffle=True, image_size=28, shape=[1, 28, 28],
            use_augm=False, random_flips=False, location="data/mnist/mnist.npz",
        )
    )
    config.model = ml_collections.ConfigDict(
        dict(
            name="GaussianUViTEMA", ema_decay=0.9999, patch_size=2,
            input_channel=1, concat_dim=784, hidden_dim=512, depth=14,
            num_heads=16, mlp_ratio=4.0, dropout=0.1, time_scale_factor=1000,
            model_output="logits", fix_logistic=False, data_min_max=[0, 255],
            rate_sigma=6.0, Q_sigma=512.0, time_exp=100.0, time_base=3.0,
        )
    )
    adam(config, 3e-4)
    saving_section(config)
    sampler_section(
        config, name="TauL", num_steps=1000, initial_dist="gaussian",
        is_ordinal=True,
    )
    return config
