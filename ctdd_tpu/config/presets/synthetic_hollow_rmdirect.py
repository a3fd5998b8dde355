"""Synthetic 2spirals + hollow transformer + CatRM with DIRECT logits + LBJF
(ref config/synthetic_config/config_hollow_synthetic_rmdirect.py: the
logit_type=direct CatRM variant; sampler "CRMLBJF" resolves via alias)."""

from ctdd_tpu.config.presets._base import (
    adam, base_config, hollow_model_section, loss_section, sampler_section,
    saving_section, training_section,
)
from ctdd_tpu.config.presets.synthetic_hollow import synthetic_data_section


def get_config():
    config = base_config("synthetic_hollow_rmdirect")
    loss_section(
        config, name="CatRM", logit_type="direct", loss_type="rm",
        ce_coeff=0.0, nll_weight=0.001, min_time=0.007,
    )
    training_section(config, n_iters=50000, grad_norm=3.0)
    synthetic_data_section(config)
    hollow_model_section(
        config, S=2, D=32, rate_const=2.1, embed_dim=64,
        bidir_readout="attention", num_layers=2, num_heads=8, mlp_dim=256,
        Q_sigma=512.0,
    )
    adam(config, 1.5e-4)
    saving_section(config)
    sampler_section(
        config, name="CRMLBJF", num_steps=500, is_ordinal=True,
        num_corrector_steps=10, sample_freq=200000000,
    )
    return config
