"""MNIST + Bert enum transformer + CTElbo + TauL.

Mirrors reference config/mnist_config/config_bert_mnist.py. Its model name
"UniformBertMLPResEMA" is unregistered in the reference (dead config,
SURVEY.md §2.2); the registered equivalent is UniformBertEMA.
"""

import ml_collections

from ctdd_tpu.config.presets._base import (
    adam, base_config, hollow_model_section, loss_section, sampler_section,
    saving_section, training_section,
)


def get_config():
    config = base_config("mnist_bert")
    loss_section(config, name="CTElbo", nll_weight=0.001, min_time=0.01)
    training_section(config, n_iters=50000, grad_norm=3.0)
    config.data = ml_collections.ConfigDict(
        dict(
            name="DiscreteMNIST", is_img=True, S=256, batch_size=64,
            shuffle=True, train=True, download=False, image_size=28,
            shape=[1, 28, 28], use_augm=False, random_flips=False,
            location="data/mnist/mnist.npz",
        )
    )
    hollow_model_section(
        config, S=256, D=784, name="UniformBertEMA", rate_const=0.007,
        t_func="log", time_base=3.0, time_exp=100.0, rate_sigma=6.0,
        embed_dim=512, readout="resnet", dropout_rate=0.01, num_layers=2,
        mlp_dim=1024, is_ebm=False,
    )
    adam(config, 2e-4)
    saving_section(config)
    sampler_section(config, name="TauL", num_steps=1000, is_ordinal=False)
    return config
