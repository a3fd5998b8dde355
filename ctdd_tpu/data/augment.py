"""On-device data augmentation, fused into the compiled train step.

The reference applies torchvision transforms per __getitem__ on the GPU-
resident dataset: RandomRotation((-10, 10)) for DiscreteMNIST and
RandomHorizontalFlip for DiscreteCIFAR10, both gated on cfg.data.use_augm
(lib/datasets/mnist.py:29-31,67-69). A host-side per-item transform would
starve a TPU fed by an in-jit batch gather, so the same transforms run
INSIDE the jitted step: a fresh random rotation/flip per item per step —
the reference's exact augmentation distribution at zero host cost.

Rotation uses nearest-neighbor resampling (torchvision RandomRotation's
default InterpolationMode.NEAREST), which also keeps discrete states valid;
out-of-frame pixels fill with 0, torchvision's default."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def make_rotation_fn(shape, max_deg: float = 10.0):
    """Per-item random rotation in (-max_deg, max_deg) on flat int batches."""
    C, H, W = shape

    def aug(key, batch):
        B = batch.shape[0]
        img = batch.reshape(B, C, H, W)
        ang = jax.random.uniform(
            key, (B,), minval=-max_deg, maxval=max_deg
        ) * (np.pi / 180.0)
        cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
        yy, xx = jnp.meshgrid(
            jnp.arange(H, dtype=jnp.float32) - cy,
            jnp.arange(W, dtype=jnp.float32) - cx,
            indexing="ij",
        )
        cos = jnp.cos(ang)[:, None, None]
        sin = jnp.sin(ang)[:, None, None]
        # inverse map: destination (yy, xx) pulls from source coords
        src_y = cos * yy - sin * xx + cy
        src_x = sin * yy + cos * xx + cx
        iy = jnp.round(src_y).astype(jnp.int32)
        ix = jnp.round(src_x).astype(jnp.int32)
        inb = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
        flat_idx = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
        img_flat = img.reshape(B, C, H * W)
        idx = jnp.broadcast_to(flat_idx.reshape(B, 1, H * W), (B, C, H * W))
        rot = jnp.take_along_axis(img_flat, idx, axis=2).reshape(B, C, H, W)
        rot = jnp.where(inb[:, None, :, :], rot, 0)
        return rot.reshape(batch.shape).astype(batch.dtype)

    return aug


def make_flip_fn(shape):
    """Per-item random horizontal flip (p = 0.5) on flat int batches."""
    C, H, W = shape

    def aug(key, batch):
        B = batch.shape[0]
        img = batch.reshape(B, C, H, W)
        flip = jax.random.bernoulli(key, 0.5, (B,))
        out = jnp.where(flip[:, None, None, None], img[..., ::-1], img)
        return out.reshape(batch.shape).astype(batch.dtype)

    return aug


def make_augment_fn(cfg):
    """The reference's use_augm transform for this dataset, or None."""
    if not cfg.data.get("use_augm", False):
        return None
    shape = tuple(cfg.data.get("shape", ()))
    if len(shape) != 3:
        return None
    name = cfg.data.name
    if name in ("DiscreteMNIST", "BinMNIST"):
        return make_rotation_fn(shape)  # ref mnist.py:67-69
    if name == "DiscreteCIFAR10":
        return make_flip_fn(shape)  # ref mnist.py:29-31
    return None
