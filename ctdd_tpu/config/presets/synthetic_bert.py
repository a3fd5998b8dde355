"""Synthetic 2spirals + BERT-style enum transformer + CTElbo + LBJF.

Mirrors reference config/synthetic_config/config_bert_synthetic.py.
"""

import ml_collections


def get_config():
    config = ml_collections.ConfigDict()
    config.experiment_name = "synthetic_bert"
    config.save_location = "runs/synthetic_bert"
    config.distributed = False

    config.loss = loss = ml_collections.ConfigDict()
    loss.name = "CTElbo"
    loss.eps_ratio = 1e-9
    loss.nll_weight = 0.0
    loss.min_time = 0.007
    loss.ce_coeff = 0
    loss.one_forward_pass = True
    loss.logit_type = "direct"

    config.training = training = ml_collections.ConfigDict()
    training.train_step_name = "Standard"
    training.n_iters = 200000
    training.clip_grad = True
    training.grad_norm = 1.0
    training.warmup = 0
    training.max_t = 0.9999

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
    model.concat_dim = data.shape[0]
    model.name = "UniVarBertEMA"
    model.rate_const = 2.0
    model.t_func = "sqrt_cos"
    model.embed_dim = 64
    model.readout = "resnet"
    model.use_one_hot_input = False
    model.use_cat = False
    model.is_ebm = False
    model.log_prob = "cat"
    model.dropout_rate = 0.1
    model.num_layers = 3
    model.num_heads = 8
    model.attention_dropout_rate = 0.1
    model.transformer_norm_type = "prenorm"
    model.mlp_dim = 256
    model.out_dim = data.S
    model.readout_dim = data.S
    model.num_output_ffresiduals = 2
    model.qkv_dim = model.embed_dim
    model.ema_decay = 0.9999
    model.Q_sigma = 20.0
    model.time_scale_factor = 1000

    config.optimizer = optimizer = ml_collections.ConfigDict()
    optimizer.name = "Adam"
    optimizer.lr = 1.5e-4

    config.saving = saving = ml_collections.ConfigDict()
    saving.sample_plot_path = "runs/synthetic_bert/pngs"
    saving.checkpoint_freq = 20000

    config.sampler = sampler = ml_collections.ConfigDict()
    sampler.name = "LBJF"
    sampler.num_steps = 500
    sampler.min_t = loss.min_time
    sampler.eps_ratio = 1e-9
    sampler.initial_dist = "uniform"
    sampler.num_corrector_steps = 10
    sampler.corrector_step_size_multiplier = 1.5
    sampler.corrector_entry_time = 0.0
    sampler.sample_freq = 200000000
    sampler.is_ordinal = False

    return config
