"""Label-conditional training + classifier-free-guided sampling (DiT).

The reference carries a CFG-ready LabelEmbedder in DiT (lib/networks/dit.py:
240-258) and passes labels through its train scripts (train_image.py:104 ->
losses), but never wires a conditional sampling path. Here the whole loop is
drivable: labels thread from the dataset through the (data-parallel) train
step into the loss, and samplers accept (label, cfg_scale) for conditional /
guided generation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctdd_tpu.config.presets import get_preset
from ctdd_tpu.models.base import create_model


def tiny_dit_cfg(tmp_path):
    cfg = get_preset("dit_mnist")
    cfg.data.image_size = 8
    cfg.data.shape = [1, 8, 8]
    cfg.data.S = 8
    cfg.data.batch_size = 8
    cfg.data.num_samples = 64
    cfg.model.concat_dim = 64
    cfg.model.hidden_dim = 32
    cfg.model.depth = 1
    cfg.model.num_heads = 2
    cfg.model.patch_size = 4
    cfg.model.model_output = "logits"
    cfg.loss.name = "NLLOriginal"
    cfg.sampler.num_steps = 4
    cfg.sampler.sample_freq = 0
    cfg.save_location = str(tmp_path)
    cfg.saving.checkpoint_freq = 1000
    cfg.saving.sample_plot_path = str(tmp_path)
    return cfg


def test_dit_model_is_label_capable():
    cfg = get_preset("dit_mnist")
    model = create_model(cfg)
    assert model.has_label


def test_cfg_scale_zero_equals_plain_conditional(tmp_path):
    """apply with bound_label and cfg_scale=0 == apply with explicit label."""
    import dataclasses

    cfg = tiny_dit_cfg(tmp_path)
    model = create_model(cfg)
    x = jnp.zeros((4, 64), jnp.int32)
    t = jnp.full((4,), 0.5)
    y = jnp.arange(4, dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t, label=y)
    direct = model.apply(params, x, t, label=y)
    bound = dataclasses.replace(model, bound_label=y, cfg_scale=0.0)
    np.testing.assert_allclose(
        np.asarray(direct), np.asarray(bound.apply(params, x, t)), rtol=1e-6
    )


def test_cfg_guidance_interpolates_logits(tmp_path):
    """u + s(c-u): at s=1 guidance returns the conditional logits exactly."""
    import dataclasses

    cfg = tiny_dit_cfg(tmp_path)
    model = create_model(cfg)
    x = jnp.zeros((4, 64), jnp.int32)
    t = jnp.full((4,), 0.5)
    y = jnp.arange(4, dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t, label=y)
    # DiT zero-inits its final adaLN layer (logits identically 0 at init);
    # perturb so the conditional and null paths actually differ
    leaves, treedef = jax.tree_util.tree_flatten(params)
    params = jax.tree_util.tree_unflatten(
        treedef,
        [l + 0.05 * jnp.sin(jnp.arange(l.size, dtype=jnp.float32)).reshape(l.shape)
         for l in leaves],
    )
    cond = model.apply(params, x, t, label=y)
    guided = dataclasses.replace(
        model, bound_label=y, cfg_scale=1.0, null_label=cfg.data.S
    ).apply(params, x, t)
    np.testing.assert_allclose(np.asarray(guided), np.asarray(cond), rtol=1e-5,
                               atol=1e-5)
    # and at s=2 it differs from the conditional pass (null path contributes)
    guided2 = dataclasses.replace(
        model, bound_label=y, cfg_scale=2.0, null_label=cfg.data.S
    ).apply(params, x, t)
    assert not np.allclose(np.asarray(guided2), np.asarray(cond))


def test_label_conditional_train_and_cfg_sample(tmp_path):
    """End-to-end: labels flow through the DP train step into the loss; a
    label-trained DiT samples class-conditionally with guidance."""
    from ctdd_tpu.sampling.samplers import get_sampler
    from ctdd_tpu.training.loop import train

    cfg = tiny_dit_cfg(tmp_path)
    state, info = train(cfg, n_iters=3, writer_kind="none")
    assert all(np.isfinite(v) for v in info["losses"] or [0.0])

    # LabelEmbedder params were created (labels actually reached the model)
    flat = jax.tree_util.tree_leaves_with_path(state.params)
    names = "/".join(str(p) for p, _ in flat)
    assert "LabelEmbedder" in names

    model = info["model"]
    sampler = get_sampler(cfg)
    label = np.arange(8, dtype=np.int32) % 10
    out = sampler.sample(
        model, state.ema_params, jax.random.PRNGKey(0), N=8,
        label=label, cfg_scale=1.5,
    )
    samples = out[0] if isinstance(out, tuple) else out
    assert samples.shape == (8, 64)
    assert samples.min() >= 0 and samples.max() < cfg.data.S
