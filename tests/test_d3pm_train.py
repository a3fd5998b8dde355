"""D3PM end-to-end: preset -> train loop -> ancestral sampling."""

import jax
import jax.numpy as jnp
import numpy as np

from ctdd_tpu.config.presets import get_preset
from ctdd_tpu.parallel.mesh import make_mesh


def tiny_d3pm_cfg():
    cfg = get_preset("synthetic_d3pm")
    cfg.data.shape = [8]
    cfg.data.num_samples = 128
    cfg.data.location = ""
    cfg.data.batch_size = 16
    cfg.model.concat_dim = 8
    cfg.model.embed_dim = 16
    cfg.model.qkv_dim = 16
    cfg.model.mlp_dim = 32
    cfg.model.num_layers = 1
    cfg.model.num_heads = 2
    cfg.model.num_output_ffresiduals = 1
    cfg.model.num_timesteps = 8
    return cfg


def test_d3pm_train_loop_and_sampling(tmp_path):
    from ctdd_tpu.d3pm.diffusion import make_diffusion
    from ctdd_tpu.training.loop import train

    cfg = tiny_d3pm_cfg()
    cfg.save_location = str(tmp_path)
    cfg.saving.checkpoint_freq = 100
    state, info = train(
        cfg, n_iters=10, mesh=make_mesh(8), writer_kind="none", log_every=5
    )
    assert int(state.step) == 10
    assert all(np.isfinite(v) for v in info["losses"])

    # ancestral sampling from the trained params
    model = info["model"]
    diffusion = make_diffusion(cfg.model)

    def model_fn(x, t):
        return model.apply(state.ema_params, x, t)

    samples = diffusion.p_sample_loop(jax.random.PRNGKey(0), model_fn, (4, 8))
    assert samples.shape == (4, 8)
    assert samples.min() >= 0 and samples.max() < cfg.data.S
