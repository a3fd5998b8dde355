"""MNIST + hollow transformer + ScoreElbo + TauL.

Mirrors reference config/mnist_config/config_hollow_mnist.py.
"""

from ctdd_tpu.config.presets._base import (
    adam, base_config, hollow_model_section, loss_section, sampler_section,
    saving_section, training_section,
)

import ml_collections


def get_config():
    config = base_config("mnist_hollow")
    loss_section(
        config, name="ScoreElbo", logit_type="reverse_prob", nll_weight=0.01,
        min_time=0.007,
    )
    training_section(config, n_iters=600000, grad_norm=1.0)
    config.data = ml_collections.ConfigDict(
        dict(
            name="DiscreteMNIST", is_img=True, train=True, download=False,
            S=256, batch_size=32, shuffle=True, image_size=28,
            shape=[1, 28, 28], use_augm=False, random_flips=False,
            location="data/mnist/mnist.npz",
        )
    )
    hollow_model_section(
        config, S=256, D=784, name="GaussianHollowEMA", embed_dim=256,
        num_layers=9, mlp_dim=512, rate_sigma=6.0, time_exp=100.0,
        time_base=3.0, rate_const=2.1,
    )
    adam(config, 2e-4)
    saving_section(config)
    sampler_section(
        config, name="TauL", num_steps=1000, initial_dist="gaussian",
        num_corrector_steps=0, is_ordinal=True,
    )
    return config
