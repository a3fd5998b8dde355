"""Maze + hollow bidirectional transformer on a plain UniformRate process
(ref config/maze_config/config_hollow_maze_distr.py: UniformBDTEMA).

The reference config is a debugging artifact that cannot run as-is: it names
loss "HollowAux" (never registered there) and carries NO data.name. We
normalize: the hollow aux loss is ScoreElbo (SDDM ELBO + ratio-matching aux —
the loss every other hollow maze/synthetic config uses), the dataset is
Maze3S (S=3; the ref file's data.S=2 contradicts 3-state maze data), and the
"TauLeaping" sampler name resolves via alias. Everything else (UniformBDTEMA
net, rate_const, res_concat readout, postnorm, layer sizes) is verbatim."""

from ctdd_tpu.config.presets._base import (
    adam, base_config, hollow_model_section, loss_section, sampler_section,
    saving_section, training_section,
)
from ctdd_tpu.config.presets.maze_protein import maze_data_section


def get_config():
    config = base_config("maze_hollow_distr")
    loss_section(
        config, name="ScoreElbo", logit_type="reverse_prob", loss_type="rm",
        nll_weight=0.001, ce_coeff=1.0, min_time=0.01,
    )
    training_section(config, n_iters=300000, grad_norm=5.0)
    maze_data_section(config, batch_size=32)
    hollow_model_section(
        config, S=3, D=225, name="UniformBDTEMA", rate_const=0.01,
        t_func="log_sqr", embed_dim=64, bidir_readout="res_concat",
        use_one_hot_input=False, dropout_rate=0.1, num_layers=2, num_heads=4,
        transformer_norm_type="postnorm", mlp_dim=256,
        num_output_ffresiduals=1, Q_sigma=20.0,
    )
    adam(config, 1.5e-4)
    saving_section(config)
    sampler_section(config, name="TauLeaping", num_steps=1000)
    return config
