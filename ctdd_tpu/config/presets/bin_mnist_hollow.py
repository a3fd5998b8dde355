"""Binarized MNIST + hollow transformer + CatRM + LBJF
(ref config/bin_mnist_config/config_hollow_binmnist.py; "CRMLBJF" -> LBJF)."""

import ml_collections

from ctdd_tpu.config.presets._base import (
    adam, base_config, hollow_model_section, loss_section, sampler_section,
    saving_section, training_section,
)


def get_config():
    config = base_config("bin_mnist_hollow")
    loss_section(
        config, name="CatRM", logit_type="reverse_prob", loss_type="rm",
        ce_coeff=0.0, min_time=0.005,
    )
    training_section(config, n_iters=500000, grad_norm=2.0)
    config.data = ml_collections.ConfigDict(
        dict(
            name="BinMNIST", is_img=True, train=True, download=False, S=2,
            batch_size=16, shuffle=True, image_size=28, shape=[1, 28, 28],
            use_augm=False, location="data/mnist/binarized_mnist.npy",
            num_samples=8192,
        )
    )
    hollow_model_section(
        config, S=2, D=784, rate_const=2.3, embed_dim=64, num_layers=12,
        mlp_dim=1024, Q_sigma=512.0,
    )
    adam(config, 2e-4)
    saving_section(config)
    sampler_section(config, name="LBJF", num_steps=1000, is_ordinal=False)
    return config
