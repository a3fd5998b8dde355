"""Synthetic 2spirals + ResidualMLP + CTElbo + LBJF — the minimal e2e slice.

A small, CPU-runnable preset (SURVEY.md §7 build step 2); process/loss/sampler
settings follow the synthetic family of reference configs. CTElbo (not CatRM):
ratio-matching losses require hollow/masked architectures — a plain MLP sees
its own input dim and ll_xt degenerates to the identity (the reference pairs
CatRM only with hollow/masked/Bert nets for the same reason).
"""

import ml_collections


def get_config():
    config = ml_collections.ConfigDict()
    config.experiment_name = "synthetic_mlp"
    config.save_location = "runs/synthetic_mlp"
    config.distributed = False

    config.loss = loss = ml_collections.ConfigDict()
    loss.name = "CTElbo"
    loss.logit_type = "direct"
    loss.loss_type = "rm"
    loss.ce_coeff = 0.0
    loss.eps_ratio = 1e-9
    loss.nll_weight = 0.0
    loss.min_time = 0.007
    loss.one_forward_pass = True

    config.training = training = ml_collections.ConfigDict()
    training.train_step_name = "Standard"
    training.n_iters = 20000
    training.clip_grad = True
    training.grad_norm = 1.0
    training.warmup = 0
    training.max_t = 0.99999

    config.data = data = ml_collections.ConfigDict()
    data.name = "SyntheticData"
    data.type = "2spirals"
    data.is_img = False
    data.S = 2
    data.binmode = "gray"
    data.int_scale = 6003.0107336488345
    data.plot_size = 4.458594271092115
    data.batch_size = 128
    data.shuffle = True
    data.shape = [32]
    data.location = "data/synthetic/data_2spirals.npy"

    config.model = model = ml_collections.ConfigDict()
    model.name = "UniformRateResMLP"
    model.concat_dim = data.shape[0]
    model.rate_const = 2.0
    model.Q_sigma = 20.0
    model.num_layers = 3
    model.d_model = 128
    model.hidden_dim = 256
    model.time_scale_factor = 1000
    model.temb_dim = 32
    model.ema_decay = 0.9999
    model.log_prob = "cat"

    config.optimizer = optimizer = ml_collections.ConfigDict()
    optimizer.name = "Adam"
    optimizer.lr = 1.5e-4

    config.saving = saving = ml_collections.ConfigDict()
    saving.sample_plot_path = "runs/synthetic_mlp/pngs"
    saving.checkpoint_freq = 5000

    config.sampler = sampler = ml_collections.ConfigDict()
    sampler.name = "LBJF"
    sampler.num_steps = 100
    sampler.min_t = loss.min_time
    sampler.eps_ratio = 1e-9
    sampler.initial_dist = "uniform"
    sampler.num_corrector_steps = 0
    sampler.corrector_step_size_multiplier = 1.5
    sampler.corrector_entry_time = 0.0
    sampler.sample_freq = 200000000
    sampler.is_ordinal = False

    return config
