"""Figure logger tests (denoisingImages / ConditionalDenoisingNoteSeq)."""

import jax
import jax.numpy as jnp
import numpy as np

from ctdd_tpu.config.presets import get_preset
from ctdd_tpu.loggers.loggers import (
    ConditionalDenoisingNoteSeq,
    denoisingImages,
    sample_grid_figure,
)
from ctdd_tpu.models.base import create_model
from ctdd_tpu.training.optimizers import get_optimizer
from ctdd_tpu.training.state import create_train_state


class _CaptureWriter:
    def __init__(self):
        self.figures = []

    def add_figure(self, tag, fig, step):
        self.figures.append((tag, step))

    def add_scalar(self, *a):
        ...


def test_denoising_images_logger():
    cfg = get_preset("tauUnet_mnist")
    cfg.data.image_size = 8
    cfg.data.shape = [1, 8, 8]
    cfg.data.S = 8
    cfg.model.concat_dim = 64
    cfg.model.ch = 8
    cfg.model.num_res_blocks = 1
    cfg.model.ch_mult = [1, 2]
    cfg.model.num_heads = 2
    cfg.model.attn_resolutions = [4]
    model = create_model(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 64), jnp.int32), jnp.full((2,), 0.5)
    )
    state = create_train_state(params, get_optimizer(cfg))
    writer = _CaptureWriter()
    minibatch = np.random.randint(0, 8, (4, 1, 8, 8))
    denoisingImages(
        state=state, cfg=cfg, writer=writer, minibatch=minibatch, model=model
    )
    assert writer.figures == [("denoisingImages", 0)]


def test_conditional_noteseq_logger():
    cfg = get_preset("bert_synthetic")
    cfg.data.shape = [10]
    cfg.data.S = 4
    cfg.model.concat_dim = 10
    cfg.model.embed_dim = 16
    cfg.model.qkv_dim = 16
    cfg.model.mlp_dim = 32
    cfg.model.num_layers = 1
    cfg.model.num_heads = 2
    cfg.model.num_output_ffresiduals = 1
    cfg.model.readout = "resnet"
    cfg.model.is_ebm = False
    cfg.model.t_func = "log_sqr"
    cfg.loss.condition_dim = 3
    model = create_model(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 10), jnp.int32), jnp.full((2,), 0.5)
    )
    state = create_train_state(params, get_optimizer(cfg))
    writer = _CaptureWriter()
    minibatch = np.random.randint(0, 4, (2, 10))
    ConditionalDenoisingNoteSeq(
        state=state, cfg=cfg, writer=writer, minibatch=minibatch, model=model
    )
    assert writer.figures == [("ConditionalDenoisingNoteSeq", 0)]


def test_sample_grid_figure():
    samples = np.random.randint(0, 8, (6, 64))
    fig = sample_grid_figure(samples, (1, 8, 8))
    assert fig is not None
