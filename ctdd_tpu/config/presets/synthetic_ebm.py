"""Synthetic + binary transformer EBM + EBMAux + LBJF on EBM logits.

Mirrors reference config/synthetic_config/config_ebm_synthetic.py (its
"CRMebmLBJF" sampler name is unregistered there; LBJF with
model.log_prob='bin_ebm' is the working path).
"""

from ctdd_tpu.config.presets._base import (
    adam, base_config, hollow_model_section, loss_section, sampler_section,
    saving_section, training_section,
)
from ctdd_tpu.config.presets.synthetic_hollow import synthetic_data_section


def get_config():
    config = base_config("synthetic_ebm")
    loss_section(
        config, name="BinEBMAux", loss_type="rm", logit_type="direct",
        nll_weight=0.001, min_time=0.01, ce_coeff=1.0,
    )
    training_section(config, n_iters=3000, grad_norm=5.0)
    synthetic_data_section(config)
    hollow_model_section(
        config, S=2, D=32, name="UniVarBinaryEBMEMA", rate_const=2.7,
        t_func="log_sqr", embed_dim=256, num_layers=3, mlp_dim=512,
        readout="mlp", Q_sigma=20.0, is_ebm=True, log_prob="bin_ebm",
    )
    adam(config, 1e-4)
    saving_section(config)
    sampler_section(config, name="ExactSampling", num_steps=750, is_ordinal=False)
    return config
