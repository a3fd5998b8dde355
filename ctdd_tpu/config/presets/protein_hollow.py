"""GRAMPA protein sequences + hollow transformer + CatRM + LBJF
(ref config/protein_config/config_hollow_protein.py; its "LBJFSampling"
sampler name is unregistered there -> LBJF; dataset name "ProteinDataset"
is unregistered there -> ProteinGrampa)."""

import ml_collections

from ctdd_tpu.config.presets._base import (
    adam, base_config, hollow_model_section, loss_section, sampler_section,
    saving_section, training_section,
)


def get_config():
    config = base_config("protein_hollow")
    loss_section(
        config, name="CatRM", logit_type="reverse_prob", loss_type="rm",
        ce_coeff=0.0, nll_weight=0.001, min_time=0.01,
    )
    training_section(config, n_iters=100000, grad_norm=5.0)
    config.data = ml_collections.ConfigDict(
        dict(
            name="ProteinGrampa", is_img=False, S=21, batch_size=32,
            shuffle=True, shape=[48], num_samples=8192,
            location="data/protein/grampa_numarr.npy",
        )
    )
    hollow_model_section(
        config, S=21, D=48, name="UniformHollowEMA", rate_const=0.33,
        t_func="log_sqr", embed_dim=64, bidir_readout="res_concat",
        use_one_hot_input=True, use_cat=True, dropout_rate=0.01,
        num_layers=1, num_heads=1, transformer_norm_type="postnorm",
        mlp_dim=128, num_output_ffresiduals=1, Q_sigma=20.0,
    )
    adam(config, 1.5e-4)
    saving_section(config)
    sampler_section(config, name="LBJF", num_steps=100, is_ordinal=False)
    return config
