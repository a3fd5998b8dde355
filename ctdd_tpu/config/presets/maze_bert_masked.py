"""Maze + masked (enumerative) transformer + CatRM + LBJF
(ref config/maze_config/config_bert_mazemasked.py: UniVarMaskedEMA,
CatRM loss_type=rm with logit_type=reverse_prob, batch 16, lr 2e-4)."""

from ctdd_tpu.config.presets._base import (
    adam, base_config, hollow_model_section, loss_section, sampler_section,
    saving_section, training_section,
)
from ctdd_tpu.config.presets.maze_protein import maze_data_section


def get_config():
    config = base_config("maze_bert_masked")
    loss_section(
        config, name="CatRM", loss_type="rm", logit_type="reverse_prob",
        nll_weight=0.001, ce_coeff=0.0, min_time=0.007,
    )
    training_section(config, n_iters=400000, grad_norm=1.0, max_t=0.9999)
    maze_data_section(config, batch_size=16)
    hollow_model_section(
        config, S=3, D=225, name="UniVarMaskedEMA", rate_const=1.7,
        t_func="sqrt_cos", embed_dim=64, readout="resnet",
        use_one_hot_input=False, use_cat=False, is_ebm=False, log_prob="cat",
        num_layers=4, num_heads=8, mlp_dim=256, num_output_ffresiduals=2,
        Q_sigma=20.0,
    )
    adam(config, 2e-4)
    saving_section(config, checkpoint_freq=5000)
    sampler_section(
        config, name="LBJF", num_steps=1000, is_ordinal=True,
        num_corrector_steps=10, sample_freq=200000000,
    )
    return config
