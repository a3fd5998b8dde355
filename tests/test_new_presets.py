"""Training smokes for the round-2 preset additions.

Each of the five reference configs that had no preset in round 1
(VERDICT.md "Missing" #2) gets a shrunken end-to-end run: real dataset
pipeline, real loss, the preset's own (alias-named) sampler, 2 optimizer
steps through the data-parallel loop, finite losses, valid samples.
"""

import numpy as np
import pytest

from ctdd_tpu.config.presets import get_preset


def _shrink_net(cfg):
    for k, v in dict(
        embed_dim=16, num_layers=1, num_heads=2, mlp_dim=32,
        num_output_ffresiduals=1,
    ).items():
        if k in cfg.model:
            cfg.model[k] = v
    if "qkv_dim" in cfg.model:
        cfg.model.qkv_dim = cfg.model.embed_dim


def _run(cfg, tmp_path, n_iters=2):
    from ctdd_tpu.training.loop import train

    cfg.save_location = str(tmp_path)
    cfg.saving.sample_plot_path = str(tmp_path)
    cfg.saving.checkpoint_freq = 1000
    cfg.sampler.sample_freq = 0
    state, info = train(cfg, n_iters=n_iters, writer_kind="none", log_every=1)
    assert all(np.isfinite(v) for v in info["losses"]), info["losses"]
    return state, info


def _sample(cfg, state, info, n=4):
    if cfg.loss.name == "d3pm":
        import jax

        from ctdd_tpu.d3pm.diffusion import make_diffusion

        diffusion = make_diffusion(cfg.model)
        model, params = info["model"], state.ema_params

        def model_fn(x, t):
            return model.apply(params, x, t)

        return np.asarray(diffusion.p_sample_loop(
            jax.random.PRNGKey(0), model_fn, (n, cfg.model.concat_dim)
        ))
    import jax

    from ctdd_tpu.sampling.samplers import get_sampler

    sampler = get_sampler(cfg)
    out = sampler.sample(info["model"], state.ema_params,
                         jax.random.PRNGKey(0), N=n)
    return out[0] if isinstance(out, tuple) else out


def test_protein_maze_smoke(tmp_path):
    cfg = get_preset("protein_maze")
    cfg.data.num_samples = 32
    cfg.data.batch_size = 8
    cfg.model.embed_dim = 16
    cfg.sampler.num_steps = 4
    state, info = _run(cfg, tmp_path)
    s = _sample(cfg, state, info)
    assert s.shape == (4, 225) and s.min() >= 0 and s.max() < 3


def test_protein_maze_d3pm_smoke(tmp_path):
    cfg = get_preset("protein_maze_d3pm")
    cfg.data.num_samples = 32
    cfg.data.batch_size = 8
    cfg.model.embed_dim = 16
    cfg.model.num_timesteps = 8
    state, info = _run(cfg, tmp_path)
    s = _sample(cfg, state, info)
    assert s.shape == (4, 225) and s.min() >= 0 and s.max() < 3


def test_bert_mazemasked_smoke(tmp_path):
    cfg = get_preset("bert_mazemasked")
    cfg.data.num_samples = 16
    cfg.data.batch_size = 8
    _shrink_net(cfg)
    cfg.sampler.num_steps = 2
    state, info = _run(cfg, tmp_path)
    s = _sample(cfg, state, info, n=2)
    assert s.shape == (2, 225) and s.min() >= 0 and s.max() < 3


def test_hollow_synthetic_rmdirect_smoke(tmp_path):
    cfg = get_preset("hollow_synthetic_rmdirect")
    cfg.data.num_samples = 128
    cfg.data.batch_size = 16
    cfg.data.shape = [8]
    cfg.data.location = ""
    cfg.model.concat_dim = 8
    _shrink_net(cfg)
    cfg.sampler.num_steps = 4
    state, info = _run(cfg, tmp_path)
    s = _sample(cfg, state, info)
    assert s.shape == (4, 8) and set(np.unique(s)) <= {0, 1}


def test_hollow_maze_distr_smoke(tmp_path):
    cfg = get_preset("hollow_maze_distr")
    cfg.data.num_samples = 16
    cfg.data.batch_size = 8
    _shrink_net(cfg)
    cfg.sampler.num_steps = 4
    state, info = _run(cfg, tmp_path)
    s = _sample(cfg, state, info)
    assert s.shape == (4, 225) and s.min() >= 0 and s.max() < 3


@pytest.mark.parametrize(
    "name", ["protein_maze", "protein_maze_d3pm", "bert_mazemasked",
             "hollow_synthetic_rmdirect", "hollow_maze_distr"],
)
def test_new_presets_resolve(name):
    cfg = get_preset(name)
    assert cfg.experiment_name
