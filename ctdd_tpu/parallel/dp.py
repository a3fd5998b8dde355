"""Data-parallel training and sampling via shard_map.

One program, N chips: params/optimizer state replicated, batch sharded over
the 'data' mesh axis, gradients pmean-reduced over ICI. This is the complete
parity surface for the reference's (uninitialized) DDP path (SURVEY.md §2.9),
and is multi-host ready — the same specs work over DCN-connected slices.
RNG: each shard folds its mesh index into the step key, so per-device noise
is independent while params stay replicated.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ctdd_tpu.parallel.mesh import DATA_AXIS
from ctdd_tpu.training.state import TrainState
from ctdd_tpu.training.train_step import apply_update, make_loss_fn


def make_dp_train_step(
    model,
    loss,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    ema_decay: float = 0.0,
    has_label: bool = False,
    axis: str = DATA_AXIS,
    augment_fn=None,
) -> Callable:
    """Build `step(state, batch, key[, label]) -> (state, loss)` over a mesh."""
    loss_fn = make_loss_fn(model, loss, augment_fn)

    def per_shard(state: TrainState, batch, key, label):
        idx = jax.lax.axis_index(axis)
        # per-shard AND per-step fold-in: one base key serves the whole run
        key = jax.random.fold_in(jax.random.fold_in(key, state.step), idx)
        l, grads = jax.value_and_grad(loss_fn)(
            state.params, batch, key, label if has_label else None, state.step
        )
        # gradient all-reduce over ICI (the one collective needed for parity)
        grads = jax.lax.pmean(grads, axis)
        l = jax.lax.pmean(l, axis)
        return apply_update(state, l, grads, tx, ema_decay)

    label_spec = P(axis) if has_label else P()
    shard_fn = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(axis), P(), label_spec),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(state, batch, key, label=None):
        if label is None:
            label = jnp.zeros((), jnp.int32)
        return shard_fn(state, batch, key, label)

    return step


def make_device_data_train_step(
    model,
    loss,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    batch_size: int,
    ema_decay: float = 0.0,
    has_label: bool = False,
    axis: str = DATA_AXIS,
    augment_fn=None,
) -> Callable:
    """DP train step over a device-resident dataset: batch selection happens
    INSIDE the compiled step (uniform-with-replacement indices per shard), so
    the host loop does zero per-step data work. The reference preloads its
    datasets onto the accelerator the same way (mnist.py:62: data .to(device));
    this is the TPU equivalent with the batch gather fused into the step.

    Returns step(state, data, key) where `data` is the full (N, ...) dataset
    already sharded/replicated on the mesh — an (x, labels) tuple when
    `has_label` is set.
    """
    loss_fn = make_loss_fn(model, loss, augment_fn)

    n_dev = mesh.devices.size
    per_shard_batch = batch_size // n_dev
    assert per_shard_batch > 0, "batch_size must cover the mesh"

    def per_shard(state: TrainState, data, key):
        idx_dev = jax.lax.axis_index(axis)
        key = jax.random.fold_in(jax.random.fold_in(key, state.step), idx_dev)
        k_idx, k_loss = jax.random.split(key)
        x = data[0] if has_label else data
        idx = jax.random.randint(k_idx, (per_shard_batch,), 0, x.shape[0])
        batch = jnp.take(x, idx, axis=0)
        label = jnp.take(data[1], idx, axis=0) if has_label else None
        l, grads = jax.value_and_grad(loss_fn)(
            state.params, batch, k_loss, label, state.step
        )
        grads = jax.lax.pmean(grads, axis)
        l = jax.lax.pmean(l, axis)
        return apply_update(state, l, grads, tx, ema_decay)

    shard_fn = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(), P()),  # dataset replicated across shards
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(shard_fn, donate_argnums=(0,))


def make_dp_sampler(sampler, mesh: Mesh, axis: str = DATA_AXIS) -> Callable:
    """Shard an N-sample generation across the mesh (each chip runs the full
    scan on N/n_devices samples — sampling is embarrassingly parallel)."""

    def sample(model, params, key, N: int):
        n_dev = mesh.devices.size
        assert N % n_dev == 0, f"N={N} must divide over {n_dev} devices"
        n_local = N // n_dev

        def per_shard(process, params, key):
            idx = jax.lax.axis_index(axis)
            key = jax.random.fold_in(key, idx)
            from ctdd_tpu.models.base import DiffusionModel

            m = DiffusionModel(
                module=model.module, process=process, cfg=sampler.cfg
            )
            x, diag = sampler._sample_loop(m, params, key, n_local)
            return x

        fn = jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(), P(), P()),
            out_specs=P(axis),
            check_vma=False,
        )
        out = jax.jit(fn)(model.process, params, key)
        import numpy as np

        return np.asarray(jax.device_get(out)).astype(int)

    return sample
