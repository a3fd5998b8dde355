"""Synthetic + enumerative masked transformer + CatRMNLL + LBJF.

Mirrors reference config/synthetic_config/config_masked_synthetic.py.
Note its training.max_t = 0.007 is kept verbatim (quirk preserved: training
times collapse to ~min_time).
"""

from ctdd_tpu.config.presets._base import (
    adam, base_config, hollow_model_section, loss_section, sampler_section,
    saving_section, training_section,
)
from ctdd_tpu.config.presets.synthetic_hollow import synthetic_data_section


def get_config():
    config = base_config("synthetic_masked")
    loss_section(
        config, name="CatRMNLL", loss_type="rm", logit_type="reverse_prob",
        nll_weight=0.001, min_time=0.007,
    )
    training_section(config, n_iters=200000, grad_norm=3.0, max_t=0.007)
    synthetic_data_section(config)
    hollow_model_section(
        config, S=2, D=32, name="UniVarMaskedEMA", rate_const=1.7,
        embed_dim=64, num_layers=4, mlp_dim=256, readout="resnet",
        Q_sigma=20.0, is_ebm=False,
    )
    adam(config, 1.5e-4)
    saving_section(config)
    sampler_section(config, name="LBJF", num_steps=500, is_ordinal=False)
    return config
