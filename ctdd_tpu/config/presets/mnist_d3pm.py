"""MNIST + UNet + D3PM (discrete time) baseline
(ref config/mnist_config/config_mnist_d3pm.py)."""

import ml_collections

from ctdd_tpu.config.presets._base import (
    adam, base_config, loss_section, sampler_section, saving_section,
    training_section,
)


def get_config():
    config = base_config("mnist_d3pm")
    loss_section(config, name="d3pm", min_time=0.01)
    training_section(config, n_iters=600000, grad_norm=2.0, max_t=1.0)
    config.data = ml_collections.ConfigDict(
        dict(
            name="DiscreteMNIST", train=True, download=False, S=256,
            batch_size=64, shuffle=True, image_size=28, shape=[1, 28, 28],
            random_flips=True, use_augm=False, location="data/mnist/mnist.npz",
        )
    )
    config.model = ml_collections.ConfigDict(
        dict(
            name="GaussianTargetRateImageX0PredEMAPaul", padding=False,
            ema_decay=0.9999, ch=96, num_res_blocks=2, ch_mult=[1, 2, 2],
            input_channels=1, scale_count_to_put_attn=1, data_min_max=[0, 255],
            dropout=0.1, skip_rescale=True, time_embed_dim=96,
            time_scale_factor=1000, fix_logistic=False, model_output="logits",
            num_heads=8, attn_resolutions=[48], concat_dim=784, is_img=True,
            rate_sigma=6.0, Q_sigma=512.0, time_exp=100.0, time_base=3.0,
            # d3pm section
            type="linear", start=1e-4, stop=0.02, num_timesteps=1000,
            model_prediction="x_start", transition_mat_type="gaussian",
            transition_bands=None, loss_type="hybrid", hybrid_coeff=0.001,
            num_pixel_vals=256,
        )
    )
    adam(config, 2e-4)
    saving_section(config, checkpoint_freq=1000)
    sampler_section(config, name="TauL", num_steps=1000, initial_dist="gaussian")
    return config
