"""UNet wrapper tests: shapes, heads, padding, loss/train integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctdd_tpu.config.presets import get_preset
from ctdd_tpu.losses.losses import get_loss
from ctdd_tpu.models.base import create_model


def tiny_mnist_cfg(model_output="logits", padding=False, image_size=8):
    cfg = get_preset("tauUnet_mnist")
    cfg.data.image_size = image_size
    cfg.data.shape = [1, image_size, image_size]
    cfg.data.S = 8
    cfg.data.num_samples = 64
    cfg.data.location = ""
    cfg.model.concat_dim = image_size * image_size
    cfg.model.ch = 8
    cfg.model.num_res_blocks = 1
    cfg.model.ch_mult = [1, 2]
    cfg.model.num_heads = 2
    cfg.model.attn_resolutions = [int(image_size / 2)]
    cfg.model.model_output = model_output
    cfg.model.padding = padding
    cfg.sampler.num_steps = 3
    return cfg


@pytest.mark.parametrize("model_output", ["logits", "logistic_pars"])
def test_unet_shapes(model_output):
    cfg = tiny_mnist_cfg(model_output=model_output)
    model = create_model(cfg)
    D = cfg.model.concat_dim
    x = jnp.zeros((2, D), jnp.int32)
    t = jnp.full((2,), 0.5)
    params = model.init(jax.random.PRNGKey(0), x, t)
    logits = model.apply(params, x, t)
    assert logits.shape == (2, D, cfg.data.S)
    assert np.isfinite(np.asarray(logits)).all()


def test_unet_padding_mode():
    cfg = tiny_mnist_cfg(padding=True, image_size=7)  # odd size needs padding
    model = create_model(cfg)
    D = cfg.model.concat_dim
    x = jnp.zeros((2, D), jnp.int32)
    t = jnp.full((2,), 0.5)
    params = model.init(jax.random.PRNGKey(0), x, t)
    logits = model.apply(params, x, t)
    assert logits.shape == (2, D, cfg.data.S)


def test_unet_ctelbo_loss_and_grad():
    cfg = tiny_mnist_cfg()
    model = create_model(cfg)
    D = cfg.model.concat_dim
    x = jnp.zeros((2, D), jnp.int32)
    t = jnp.full((2,), 0.5)
    params = model.init(jax.random.PRNGKey(0), x, t)
    loss = get_loss(cfg)
    batch = jax.random.randint(jax.random.PRNGKey(1), (4, D), 0, cfg.data.S)

    def f(p):
        return loss.calc_loss(model, p, jax.random.PRNGKey(2), batch, train=False)

    val, grads = jax.value_and_grad(f)(params)
    assert np.isfinite(float(val))
    gnorm = sum(float(jnp.sum(g**2)) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_unet_taul_sampler():
    from ctdd_tpu.sampling.samplers import get_sampler

    cfg = tiny_mnist_cfg()
    model = create_model(cfg)
    D = cfg.model.concat_dim
    x = jnp.zeros((2, D), jnp.int32)
    t = jnp.full((2,), 0.5)
    params = model.init(jax.random.PRNGKey(0), x, t)
    sampler = get_sampler(cfg)
    samples, _ = sampler.sample(model, params, jax.random.PRNGKey(0), N=2)
    assert samples.shape == (2, D)
    assert samples.min() >= 0 and samples.max() < cfg.data.S


def test_mnist_dataset_standin():
    from ctdd_tpu.data.loaders import get_dataset

    cfg = tiny_mnist_cfg()
    ds = get_dataset(cfg)
    assert ds.data.ndim == 4 and ds.data.shape[1] == 1
    assert ds.data.dtype == np.uint8
