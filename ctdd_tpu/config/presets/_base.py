"""Shared preset builders (loss/training/sampler section boilerplate)."""

from __future__ import annotations

import ml_collections


def base_config(name: str) -> ml_collections.ConfigDict:
    config = ml_collections.ConfigDict()
    config.experiment_name = name
    config.save_location = f"runs/{name}"
    config.distributed = False
    return config


def loss_section(config, **kw):
    defaults = dict(
        name="CTElbo", eps_ratio=1e-9, nll_weight=0.0, min_time=0.01,
        one_forward_pass=True, logit_type="direct", loss_type="rm", ce_coeff=0.0,
    )
    defaults.update(kw)
    config.loss = ml_collections.ConfigDict(defaults)
    return config.loss


def training_section(config, **kw):
    defaults = dict(
        train_step_name="Standard", n_iters=300000, clip_grad=True,
        grad_norm=1.0, warmup=0, max_t=0.99999,
    )
    defaults.update(kw)
    config.training = ml_collections.ConfigDict(defaults)
    return config.training


def sampler_section(config, **kw):
    defaults = dict(
        name="TauL", num_steps=1000, min_t=config.loss.min_time,
        eps_ratio=1e-9, initial_dist="uniform", num_corrector_steps=0,
        corrector_step_size_multiplier=1.5, corrector_entry_time=0.0,
        is_ordinal=True, sample_freq=10000,
        # perf path: whole tau-leap update in one Pallas kernel on TPU
        # (ops/fused_update.py); XLA mirror elsewhere
        use_fused_update=False,
        # conditional decode: q_{t|0}-noise the clamped prefix to the
        # chain's t each step (in-distribution conditioning for models
        # trained unconditionally; see samplers._ConditionalBase._prefix_at_t)
        noise_prefix=False,
    )
    defaults.update(kw)
    config.sampler = ml_collections.ConfigDict(defaults)
    return config.sampler


def saving_section(config, checkpoint_freq=10000):
    config.saving = ml_collections.ConfigDict(
        dict(
            checkpoint_freq=checkpoint_freq,
            sample_plot_path=f"{config.save_location}/pngs",
        )
    )
    return config.saving


def adam(config, lr=2e-4):
    config.optimizer = ml_collections.ConfigDict(dict(name="Adam", lr=lr))
    return config.optimizer


def hollow_model_section(config, S, D, **kw):
    defaults = dict(
        name="UniVarHollowEMA", log_prob="cat", rate_const=2.0,
        Q_sigma=512.0, t_func="sqrt_cos", net_arch="bidir_transformer",
        nets="bidir_transformer2", use_cat=False, fix_logistic=False,
        embed_dim=128, bidir_readout="attention", use_one_hot_input=False,
        dropout_rate=0.1, concat_dim=D, num_layers=8, num_heads=8,
        attention_dropout_rate=0.1, transformer_norm_type="prenorm",
        mlp_dim=1024, out_dim=S, readout_dim=S, num_output_ffresiduals=2,
        ema_decay=0.9999, time_scale_factor=1000,
    )
    defaults.update(kw)
    defaults["qkv_dim"] = defaults["embed_dim"]
    config.model = ml_collections.ConfigDict(defaults)
    return config.model
