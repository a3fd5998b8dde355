"""FID: Fréchet distance between feature distributions.

Counterpart of reference lib/datasets/mnist_fid.py (`get_activations`,
`calculate_frechet_distance`, `evaluate_fid_score`, :21-193) and its
InceptionV3 port (mnist_is.py:18-332). The statistics math is ported exactly;
the feature extractor is pluggable:

- "inception": a flax InceptionV3-pool3 extractor whose params are loaded
  from a local npz/msgpack (this box is zero-egress, so pretrained weights
  must be dropped in; the reference downloads them at runtime).
- "lenet": a small randomly-initialized conv feature net — deterministic
  per seed; useful as a *relative* quality signal and for pipeline tests
  (random-projection FIDs are rank-preserving in practice).
- any callable(images_f32_nhwc3) -> (N, F) features.

Preprocessing follows the reference protocol (BASELINE.md): inputs normalized
to [0, 1] and tiled to 3 channels.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy import linalg


def preprocess_images(images: np.ndarray) -> np.ndarray:
    """uint8/float (N, C, H, W) or (N, H, W) -> float32 (N, H, W, 3) in [0,1]."""
    x = np.asarray(images, np.float32)
    if x.ndim == 3:
        x = x[:, None, :, :]
    if x.max() > 1.0 + 1e-6:
        x = x / 255.0
    x = np.transpose(x, (0, 2, 3, 1))
    if x.shape[-1] == 1:
        x = np.repeat(x, 3, axis=-1)
    return x


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6):
    """Exact port of the reference FID formula (mnist_fid.py:57-104)."""
    mu1 = np.atleast_1d(mu1)
    mu2 = np.atleast_1d(mu2)
    sigma1 = np.atleast_2d(sigma1)
    sigma2 = np.atleast_2d(sigma2)
    diff = mu1 - mu2

    # scipy >= 1.16 deprecates disp= and returns just the array; the
    # reference's (sqrtm, errest) unpacking (mnist_fid.py:76) is version-bound.
    covmean = linalg.sqrtm(sigma1.dot(sigma2))
    if isinstance(covmean, tuple):
        covmean = covmean[0]
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real
    return (
        diff.dot(diff)
        + np.trace(sigma1)
        + np.trace(sigma2)
        - 2 * np.trace(covmean)
    )


def activation_statistics(features: np.ndarray):
    mu = np.mean(features, axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def _lenet_features(seed: int = 0, feature_dim: int = 256) -> Callable:
    """Random conv feature extractor (fixed seed): cheap FID stand-in."""
    import flax.linen as nn

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(32, (3, 3), strides=(2, 2))(x)
            x = nn.relu(x)
            x = nn.Conv(64, (3, 3), strides=(2, 2))(x)
            x = nn.relu(x)
            x = nn.Conv(128, (3, 3), strides=(2, 2))(x)
            x = nn.relu(x)
            x = jnp.mean(x, axis=(1, 2))
            return nn.Dense(feature_dim)(x)

    net = Net()
    params = None

    def fn(images: np.ndarray) -> np.ndarray:
        nonlocal params
        x = jnp.asarray(images)
        if params is None:
            params = net.init(jax.random.PRNGKey(seed), x[:1])
        return np.asarray(jax.jit(net.apply)(params, x))

    return fn


def trained_classifier_features(
    images: np.ndarray, labels: np.ndarray, seed: int = 0,
    steps: int = 500, batch: int = 256, feature_dim: int = 256,
    n_classes: int = 10,
) -> Callable:
    """Feature net TRAINED as a classifier on the eval dataset.

    Random-conv ("lenet") features saturate on small stand-in datasets: a
    well-trained generator reaches the real-vs-real noise floor early and
    the FID trajectory goes flat. Training the same conv trunk for a few
    hundred classification steps makes the features class- and
    stroke-discriminative, so the metric keeps resolving quality
    differences. Deterministic in (seed, steps, data); the reference has no
    counterpart (its FID always uses downloaded InceptionV3 weights,
    mnist_fid.py:107-154 — use those when available)."""
    import flax.linen as nn
    import optax

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(32, (3, 3), strides=(2, 2))(x)
            x = nn.relu(x)
            x = nn.Conv(64, (3, 3), strides=(2, 2))(x)
            x = nn.relu(x)
            x = nn.Conv(128, (3, 3), strides=(2, 2))(x)
            x = nn.relu(x)
            x = jnp.mean(x, axis=(1, 2))
            feats = nn.Dense(feature_dim)(x)
            logits = nn.Dense(n_classes)(nn.relu(feats))
            return feats, logits

    net = Net()
    x_all = preprocess_images(images)
    y_all = np.asarray(labels, np.int32)
    key = jax.random.PRNGKey(seed)
    params = net.init(key, jnp.asarray(x_all[:2]))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            _, logits = net.apply(p, xb)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yb
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(seed)
    for _ in range(steps):
        idx = rng.randint(0, len(x_all), size=batch)
        params, opt_state, _ = step(
            params, opt_state, jnp.asarray(x_all[idx]), jnp.asarray(y_all[idx])
        )

    @jax.jit
    def features(xb):
        f, _ = net.apply(params, xb)
        return f

    def fn(images_pre: np.ndarray) -> np.ndarray:
        return np.asarray(features(jnp.asarray(images_pre)))

    return fn


def get_feature_fn(kind="lenet", weights_path: Optional[str] = None) -> Callable:
    if callable(kind):
        return kind
    if kind == "lenet":
        return _lenet_features()
    if kind == "inception":
        from ctdd_tpu.metrics.inception import inception_pool3_features

        return inception_pool3_features(weights_path)
    raise ValueError(f"unknown feature extractor {kind}")


def get_activations(images: np.ndarray, feature_fn: Callable,
                    batch_size: int = 128) -> np.ndarray:
    """Batched feature extraction (ref mnist_fid.py:21-54)."""
    x = preprocess_images(images)
    feats = []
    for s in range(0, len(x), batch_size):
        feats.append(np.asarray(feature_fn(x[s : s + batch_size])))
    return np.concatenate(feats, axis=0)


def evaluate_fid_score(
    images1: np.ndarray,
    images2: np.ndarray,
    feature_kind="lenet",
    batch_size: int = 128,
    weights_path: Optional[str] = None,
) -> float:
    """FID between two image sets (ref mnist_fid.py:156-193)."""
    fn = get_feature_fn(feature_kind, weights_path)
    f1 = get_activations(images1, fn, batch_size)
    f2 = get_activations(images2, fn, batch_size)
    mu1, s1 = activation_statistics(f1)
    mu2, s2 = activation_statistics(f2)
    return float(calculate_frechet_distance(mu1, s1, mu2, s2))
