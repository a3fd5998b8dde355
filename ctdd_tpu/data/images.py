"""Image dataset pipelines (MNIST / CIFAR10 / binarized MNIST / pianoroll).

Counterpart of reference lib/datasets/mnist.py (DiscreteMNIST :57-87,
DiscreteCIFAR10 :15-54, BinMNIST :167-224, LakhPianoroll :90-103). The
reference preloads torchvision datasets onto the GPU; here datasets are host
numpy (uint8 states in [0, S-1]) fed to the device via the sharded training
loop. This box has no torchvision and zero egress, so loading order is:

1. a local npz/npy at cfg.data.location (mnist.npz with x_train/y_train, or
   CIFAR batches already decoded to (N,C,H,W) uint8),
2. fallback: sklearn's bundled 8x8 digits upsampled to the target resolution
   — a shape/dtype-exact stand-in so training and benchmarks run anywhere
   (quality metrics against real MNIST require dropping the real npz in).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from ctdd_tpu import registry
from ctdd_tpu.data.loaders import ArrayDataset


def _load_mnist_npz(path: str) -> Tuple[np.ndarray, np.ndarray]:
    with np.load(path) as f:
        if "x_train" in f:
            return f["x_train"], f.get("y_train", np.zeros(len(f["x_train"])))
        if "images" in f:
            return f["images"], f.get("labels", np.zeros(len(f["images"])))
    raise KeyError(f"unrecognized npz keys in {path}")


def _digits_standin(n: int, image_size: int, seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """sklearn 8x8 digits -> (n, image_size, image_size) uint8 in [0,255]."""
    from sklearn.datasets import load_digits

    X, y = load_digits(return_X_y=True)
    imgs = (X.reshape(-1, 8, 8) * (255.0 / 16.0)).astype(np.uint8)
    reps = int(np.ceil(image_size / 8))
    imgs = np.repeat(np.repeat(imgs, reps, axis=1), reps, axis=2)
    imgs = imgs[:, :image_size, :image_size]
    rng = np.random.RandomState(seed)
    idx = rng.randint(0, len(imgs), size=n)
    return imgs[idx], y[idx]


# NOTE: use_augm transforms (MNIST RandomRotation / CIFAR RandomHorizontal-
# Flip, ref mnist.py:29-31,67-69) run ON DEVICE inside the jitted train step
# (ctdd_tpu/data/augment.py) — a fresh random transform per item per step,
# not a static pre-generated pool. Datasets here return raw images.


@registry.datasets.register(name="DiscreteMNIST")
def discrete_mnist(cfg, root: Optional[str] = None) -> ArrayDataset:
    """Ints 0..255, shape (N, 1, H, W) (ref mnist.py:57-87)."""
    size = cfg.data.image_size
    path = root or cfg.data.get("location", "")
    candidates = [path, os.path.join(path or ".", "mnist.npz")]
    imgs = labels = None
    for c in candidates:
        if c and os.path.isfile(c) and c.endswith(".npz"):
            imgs, labels = _load_mnist_npz(c)
            break
    if imgs is None:
        imgs, labels = _digits_standin(
            int(cfg.data.get("num_samples", 8192)), size
        )
    if imgs.shape[-1] != size:
        reps = int(np.ceil(size / imgs.shape[-1]))
        imgs = np.repeat(np.repeat(imgs, reps, axis=1), reps, axis=2)[
            :, :size, :size
        ]
    data = imgs[:, None, :, :].astype(np.uint8)  # (N, 1, H, W)
    return ArrayDataset(data, np.asarray(labels).astype(np.int32))


@registry.datasets.register(name="DiscreteCIFAR10")
def discrete_cifar10(cfg, root: Optional[str] = None) -> ArrayDataset:
    """Ints 0..255, shape (N, 3, 32, 32) (ref mnist.py:15-54)."""
    path = root or cfg.data.get("location", "")
    if path and os.path.isfile(path):
        with np.load(path) as f:
            imgs = f["x_train"] if "x_train" in f else f["images"]
            labels = f["y_train"] if "y_train" in f else f.get("labels")
        if imgs.shape[-1] == 3:  # NHWC -> NCHW
            imgs = imgs.transpose(0, 3, 1, 2)
    else:
        grey, labels = _digits_standin(int(cfg.data.get("num_samples", 8192)), 32)
        imgs = np.repeat(grey[:, None, :, :], 3, axis=1)
    return ArrayDataset(imgs.astype(np.uint8), np.asarray(labels).astype(np.int32))


@registry.datasets.register(name="BinMNIST")
def bin_mnist(cfg, root: Optional[str] = None) -> ArrayDataset:
    """Binarized MNIST {0,1} (ref mnist.py:167-224, Larochelle split).

    Loads a local binarized npy/amat if present; else thresholds the MNIST /
    stand-in pipeline at 0.5.
    """
    path = root or cfg.data.get("location", "")
    if path and os.path.isfile(path) and path.endswith(".npy"):
        data = np.load(path)
        data = data.reshape(len(data), 1, cfg.data.image_size, cfg.data.image_size)
        return ArrayDataset(data.astype(np.uint8))
    base = discrete_mnist(cfg, root=None)
    data = (base.data > 127).astype(np.uint8)
    return ArrayDataset(data, base.labels)


@registry.datasets.register(name="LakhPianoroll")
def lakh_pianoroll(cfg, root: Optional[str] = None) -> ArrayDataset:
    """(N, L) int npy loader (ref mnist.py:90-103).

    Falls back to the documented music-structured stand-in
    (data/pianoroll.py) when the Lakh npy artifact is absent, so the
    conditional stack trains and evaluates anywhere. PARITY-GAP: stand-in
    numbers are not comparable to real-Lakh results.
    """
    path = root or cfg.data.location
    if path and os.path.isfile(path):
        data = np.load(path)
        return ArrayDataset(data.astype(np.int32))
    from ctdd_tpu.data.pianoroll import generate_standin

    data = generate_standin(
        int(cfg.data.get("num_samples", 8192)), length=int(cfg.data.shape[0]),
        seed=int(cfg.data.get("seed", 0)),
    )
    return ArrayDataset(data)
