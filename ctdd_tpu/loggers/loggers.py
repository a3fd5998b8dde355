"""Figure loggers: noise→denoise grids for images and note sequences.

Counterpart of reference lib/loggers/loggers.py: `denoisingImages` (:19-59)
and `ConditionalDenoisingNoteSeq` (:62-113), registered in the logger
registry and writing matplotlib figures to the configured writer. The
noising + one-step denoise happens on device; only the final small grids
cross to host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ctdd_tpu import registry
from ctdd_tpu.ops import indexing
from ctdd_tpu.utils.math import safe_log


def get_logger(name: str):
    return registry.loggers.get(name)


def _noise_and_denoise(model, params, x0_flat, t, key):
    """x_t ~ q_{t|0}(·|x0); x̂0 = argmax p0t(·|x_t) (ref loggers.py:40-51)."""
    t_ones = jnp.full((x0_flat.shape[0],), t, jnp.float32)
    qt0 = model.transition(t_ones)
    qt0_rows = indexing.rows(qt0, x0_flat)
    x_t = jax.random.categorical(key, safe_log(qt0_rows), axis=-1)
    logits = model.apply(params, x_t, t_ones)
    return x_t, jnp.argmax(logits, axis=-1)


@registry.loggers.register(name="denoisingImages")
def denoisingImages(*, state, cfg, writer, minibatch, model, params=None, **kw):
    """3 images × ts grid of (noised, one-step denoised) (ref :19-59)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    params = params if params is not None else state.ema_params
    ts = [0.01, 0.3, 0.5, 0.6, 0.7, 0.8, 1.0]
    C, H, W = cfg.data.shape
    key = jax.random.PRNGKey(int(state.step))
    fig, ax = plt.subplots(6, len(ts), figsize=(2 * len(ts), 12))
    x0 = jnp.asarray(minibatch[:3]).reshape(3, -1)
    for t_idx, t in enumerate(ts):
        key, sub = jax.random.split(key)
        x_t, x_hat = _noise_and_denoise(model, params, x0, t, sub)
        for img_idx in range(3):
            xt_img = np.asarray(x_t[img_idx]).reshape(C, H, W).transpose(1, 2, 0)
            xh_img = np.asarray(x_hat[img_idx]).reshape(C, H, W).transpose(1, 2, 0)
            ax[2 * img_idx, t_idx].imshow(xt_img.squeeze())
            ax[2 * img_idx, t_idx].axis("off")
            ax[2 * img_idx + 1, t_idx].imshow(xh_img.squeeze())
            ax[2 * img_idx + 1, t_idx].axis("off")
    writer.add_figure("denoisingImages", fig, int(state.step))
    plt.close(fig)


@registry.loggers.register(name="ConditionalDenoisingNoteSeq")
def ConditionalDenoisingNoteSeq(*, state, cfg, writer, minibatch, model,
                                params=None, **kw):
    """Prefix-conditioned sequence denoise scatter plots (ref :62-113)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    params = params if params is not None else state.ema_params
    ts = [0.01, 0.1, 0.3, 0.7, 1.0]
    cond_dim = cfg.loss.condition_dim
    total_L = cfg.data.shape[0]
    S = cfg.data.S
    key = jax.random.PRNGKey(int(state.step))
    fig, ax = plt.subplots(2, len(ts), figsize=(2 * len(ts), 4))
    x = jnp.asarray(minibatch[:1]).reshape(1, -1)
    cond, data = x[:, :cond_dim], x[:, cond_dim:]
    for t_idx, t in enumerate(ts):
        key, sub = jax.random.split(key)
        t_ones = jnp.full((1,), t, jnp.float32)
        qt0 = model.transition(t_ones)
        x_t = jax.random.categorical(
            sub, safe_log(indexing.rows(qt0, data)), axis=-1
        )
        model_in = jnp.concatenate([cond, x_t], axis=1)
        logits = model.apply(params, model_in, t_ones)[:, cond_dim:, :]
        x_hat = jnp.argmax(logits, axis=-1)
        xs = np.arange(total_L)
        ax[0, t_idx].scatter(
            xs, np.concatenate([np.asarray(cond[0]), np.asarray(x_t[0])]), s=0.1
        )
        ax[0, t_idx].set_ylim(0, S)
        ax[0, t_idx].axis("off")
        ax[1, t_idx].scatter(
            xs, np.concatenate([np.asarray(cond[0]), np.asarray(x_hat[0])]), s=0.1
        )
        ax[1, t_idx].set_ylim(0, S)
        ax[1, t_idx].axis("off")
    writer.add_figure("ConditionalDenoisingNoteSeq", fig, int(state.step))
    plt.close(fig)


def sample_grid_figure(samples: np.ndarray, shape, nrow: int = 4):
    """PNG sample grid like the train loops save (train_image.py:123-145)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    C, H, W = shape
    n = len(samples)
    ncol = int(np.ceil(n / nrow))
    fig, axes = plt.subplots(nrow, ncol, figsize=(ncol, nrow))
    axes = np.atleast_2d(axes)
    for i in range(nrow * ncol):
        ax = axes[i // ncol, i % ncol]
        ax.axis("off")
        if i < n:
            img = samples[i].reshape(C, H, W).transpose(1, 2, 0)
            ax.imshow(img.squeeze(), cmap="gray")
    fig.tight_layout()
    return fig
