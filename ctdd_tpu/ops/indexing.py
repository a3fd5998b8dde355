"""Batched gathers over (B, S, S) transition/rate tensors.

The reference expresses these as arange/repeat_interleave fancy indexing
(e.g. lib/losses/losses.py:46-63,133-146,192-270). Here each pattern is one
`take_along_axis`, which XLA lowers to a single efficient gather — and when a
matmul with the gathered tensor follows, fuses into the surrounding kernel.

Conventions: `mat` is (B, S, S); `idx` is integer (B, D) with values in [0,S).
"""

from __future__ import annotations

import jax.numpy as jnp


def rows(mat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """out[b, d, :] = mat[b, idx[b, d], :]  -> (B, D, S).

    Reference pattern: mat[arange(B).repeat_interleave(D), idx.flatten(), :]
    (losses.py:46-52).
    """
    B, S, _ = mat.shape
    return jnp.take_along_axis(mat, idx.astype(jnp.int32)[:, :, None], axis=1)


def cols(mat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """out[b, d, :] = mat[b, :, idx[b, d]]  -> (B, D, S).

    Reference pattern: mat[arange(B).repeat_interleave(D), :, idx.flatten()]
    (losses.py:133-140).
    """
    return rows(jnp.swapaxes(mat, 1, 2), idx)


def elems(mat: jnp.ndarray, ridx: jnp.ndarray, cidx: jnp.ndarray) -> jnp.ndarray:
    """out[b, d] = mat[b, ridx[b, d], cidx[b, d]]  -> (B, D).

    Reference pattern: mat[arange(B).rep(D), r.flatten(), c.flatten()]
    (losses.py:206-213).
    """
    picked = rows(mat, ridx)  # (B, D, S)
    return jnp.take_along_axis(picked, cidx.astype(jnp.int32)[:, :, None], axis=2)[
        ..., 0
    ]


def diag(mat: jnp.ndarray) -> jnp.ndarray:
    """out[b, s] = mat[b, s, s]  -> (B, S) (losses.py:225-229)."""
    return jnp.diagonal(mat, axis1=1, axis2=2)


def zero_at(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """x with x[b, d, idx[b, d]] = 0 (the ubiquitous diagonal-mask pattern)."""
    S = x.shape[-1]
    mask = jnp.arange(S, dtype=jnp.int32)[None, None, :] == idx[:, :, None]
    return jnp.where(mask, 0.0, x)


def onehot_mask(idx: jnp.ndarray, S: int) -> jnp.ndarray:
    """(B, D, S) float mask that is 0 at idx and 1 elsewhere (1 - one_hot)."""
    return 1.0 - (jnp.arange(S, dtype=jnp.int32)[None, None, :] == idx[:, :, None]).astype(
        jnp.float32
    )
