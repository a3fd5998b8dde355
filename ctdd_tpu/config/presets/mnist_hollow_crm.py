"""MNIST + hollow transformer + CatRM(mle) + LBJF.

Mirrors reference config/mnist_config/config_holvisual_mnist.py — the
categorical-ratio-matching MNIST variant (GaussianHollowEMA, loss CatRM
loss_type=mle logit_type=reverse_prob, 300k iters, grad_norm 3,
min_time 0.005, embed_dim 32, attention readout, sampler "CRMLBJF"
= LBJF via the reference-alias table).

Runnable-semantics note: that config sets `model.nets = "visual"`
(BiVisualTransformer), but the reference's HollowTransformer wrapper has
the visual branch commented out (models.py:502-503,539-540 — and
BiVisualTransformer itself reshapes 49 patch-token logits to 784 dims,
a runtime shape error), so the config actually runs the standard
bidirectional hollow transformer; this preset mirrors that behavior.
"""

import ml_collections

from ctdd_tpu.config.presets._base import (
    adam, base_config, hollow_model_section, loss_section, sampler_section,
    saving_section, training_section,
)


def get_config():
    config = base_config("mnist_hollow_crm")
    loss_section(
        config, name="CatRM", loss_type="mle", logit_type="reverse_prob",
        ce_coeff=0.0, min_time=0.005,
    )
    training_section(config, n_iters=300000, grad_norm=3.0)
    config.data = ml_collections.ConfigDict(
        dict(
            name="DiscreteMNIST", is_img=True, train=True, download=False,
            S=256, batch_size=64, shuffle=True, image_size=28,
            shape=[1, 28, 28], use_augm=False, random_flips=False,
            location="data/mnist/mnist.npz",
        )
    )
    hollow_model_section(
        config, S=256, D=784, name="GaussianHollowEMA", embed_dim=32,
        bidir_readout="attention", num_layers=6, mlp_dim=512,
        rate_sigma=6.0, time_exp=100.0, time_base=3.0, rate_const=2.1,
        t_func="sqrt_cos", Q_sigma=512.0,
    )
    adam(config, 2e-4)
    saving_section(config, checkpoint_freq=5000)
    sampler_section(
        config, name="CRMLBJF", num_steps=1000, min_t=0.005,
        initial_dist="gaussian", num_corrector_steps=10,
    )
    return config
