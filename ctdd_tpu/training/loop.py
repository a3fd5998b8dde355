"""The training loop driver.

Counterpart of the reference's per-script `main()` loops (train_image.py:99-150
et al.): iterate batches -> jitted (data-parallel) train step -> periodic
checkpoint + sample grid + loss logging, with preemption-safe checkpointing.
One loop serves every dataset family; the config picks the pieces.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ctdd_tpu.config.base import save_config
from ctdd_tpu.data.loaders import get_dataset, iterate_batches
from ctdd_tpu.losses.losses import get_loss
from ctdd_tpu.models.base import create_model
from ctdd_tpu.parallel.dp import make_device_data_train_step, make_dp_train_step
from ctdd_tpu.parallel.mesh import make_mesh, shard_batch
from ctdd_tpu.sampling.samplers import get_sampler
from ctdd_tpu.training.optimizers import get_optimizer
from ctdd_tpu.training.state import create_train_state
from ctdd_tpu.utils import bookkeeping


def _save_sample_grid(cfg, model, state, sampler, writer, png_dir, step,
                      n_samples: int = 16, dataset=None):
    """Sample with EMA weights, save a PNG grid (train_image.py:123-145).

    Label-conditional models get one row per class: a class-conditionally
    trained DiT never sees a no-embedding forward (train always adds a real
    or null label embedding), so unconditional sampling would be off-
    distribution."""
    kwargs = {}
    if getattr(model, "has_label", False):
        n_classes = int(cfg.data.get("num_classes", 10))
        kwargs["label"] = np.arange(n_samples, dtype=np.int32) % n_classes
        kwargs["cfg_scale"] = float(cfg.sampler.get("cfg_scale", 0.0))
    if getattr(sampler, "condition_dim", None):
        # prefix-conditional samplers (ConditionalTauLeaping et al.) need a
        # conditioner; use training-set prefixes (ref notebooks do the same)
        if dataset is None or len(dataset) < n_samples:
            return
        cond_dim = int(sampler.condition_dim)
        kwargs["conditioner"] = jnp.asarray(
            np.asarray(dataset.data[:n_samples]).reshape(n_samples, -1)
            [:, :cond_dim]
        )
    out = sampler.sample(
        model, state.ema_params, jax.random.PRNGKey(step), N=n_samples, **kwargs
    )
    samples = out[0] if isinstance(out, tuple) else out
    shape = cfg.data.get("shape", None)
    if shape is not None and len(shape) == 3:
        from ctdd_tpu.loggers.loggers import sample_grid_figure

        fig = sample_grid_figure(samples, shape)
        fig.savefig(os.path.join(png_dir, f"samples_{step}.png"))
        writer.add_figure("samples", fig, step)
        import matplotlib.pyplot as plt

        plt.close(fig)
    else:
        np.save(os.path.join(png_dir, f"samples_{step}.npy"), samples)


def train(
    cfg,
    *,
    n_iters: Optional[int] = None,
    seed: int = 0,
    resume_from: Optional[str] = None,
    writer_kind: str = "tensorboard",
    mesh=None,
    log_every: int = 100,
    profile_steps: Optional[tuple] = None,
):
    """Run training; returns (state, run_paths)."""
    n_iters = n_iters if n_iters is not None else cfg.training.n_iters
    mesh = mesh if mesh is not None else make_mesh()

    paths = bookkeeping.create_experiment_folder(
        cfg.save_location, cfg.experiment_name
    )
    save_config(cfg, os.path.join(paths["config"], "config.yaml"))
    writer = bookkeeping.setup_writer(writer_kind, paths["root"])
    ckpt = bookkeeping.CheckpointManager(paths["checkpoints"])

    model = create_model(cfg)
    if cfg.loss.name == "d3pm":
        # constructed directly, as the reference's d3pm scripts do
        # (train_synthetic_d3pm.py:72-74)
        from ctdd_tpu.d3pm.diffusion import D3PMLoss, make_diffusion

        loss = D3PMLoss(cfg, make_diffusion(cfg.model))
    else:
        loss = get_loss(cfg)
    tx = get_optimizer(cfg)

    dataset = get_dataset(cfg)
    batches = iterate_batches(
        dataset, cfg.data.batch_size, shuffle=cfg.data.get("shuffle", True),
        seed=seed,
    )

    # label-conditional training path (ref train_image.py:104 passes label
    # into calc_loss; only label-capable models consume it)
    has_label = bool(getattr(model, "has_label", False)) and (
        dataset.labels is not None
    )

    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    first_batch, first_label = next(batches)
    x0 = jnp.asarray(first_batch)
    if x0.ndim == 4:
        x0 = x0.reshape(x0.shape[0], -1)
    t0 = jnp.ones((x0.shape[0],), jnp.float32) * 0.5
    init_label = (
        jnp.asarray(first_label[:2], jnp.int32) if has_label else None
    )
    params = model.init(k_init, x0[:2], t0[:2], label=init_label)
    state = create_train_state(params, tx)

    if resume_from is not None:
        mgr = bookkeeping.CheckpointManager(resume_from)
        state = mgr.restore(state)
        if mesh.devices.size > 1:
            # restored arrays land committed on the default device; the DP
            # step expects them replicated over the mesh like the data pool
            state = jax.device_put(
                state,
                jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
            )

    # Step-function selection (measured on the dev box, MNIST flagship):
    # - per-step host->device device_put costs ~175 ms through the tunnel,
    #   so datasets under the size cap live on the device and the batch
    #   gather happens INSIDE the compiled step (23.6 ms/step);
    # - single-device meshes use plain jit (shard_map with a replicated
    #   dataset arg measured ~2 s/step through the tunnel);
    # - multi-device meshes use the shard_map DP paths (the pod-scale path).
    device_data_cap = int(cfg.training.get("device_data_bytes", 512 * 2**20))
    device_data = (
        bool(cfg.training.get("device_data", True))
        and dataset.data.nbytes <= device_data_cap
    )
    ema_decay = float(cfg.model.get("ema_decay", 0.0))
    single = mesh.devices.size == 1
    # on-device augmentation (fresh per-item transform per step, the
    # reference's per-__getitem__ torchvision semantics; data/augment.py)
    from ctdd_tpu.data.augment import make_augment_fn

    augment_fn = make_augment_fn(cfg)
    if device_data and single:
        from ctdd_tpu.training.train_step import make_device_data_step

        flat = jnp.asarray(dataset.data.reshape(len(dataset), -1).astype(np.int32))
        data_on_device = (
            (flat, jnp.asarray(dataset.labels, jnp.int32)) if has_label else flat
        )
        step_fn = make_device_data_step(
            model, loss, tx, batch_size=cfg.data.batch_size,
            ema_decay=ema_decay, has_label=has_label, augment_fn=augment_fn,
        )
    elif device_data:
        flat = dataset.data.reshape(len(dataset), -1).astype(np.int32)
        repl = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        data_on_device = jax.device_put(flat, repl)
        if has_label:
            data_on_device = (
                data_on_device,
                jax.device_put(np.asarray(dataset.labels, np.int32), repl),
            )
        step_fn = make_device_data_train_step(
            model, loss, tx, mesh, batch_size=cfg.data.batch_size,
            ema_decay=ema_decay, has_label=has_label, augment_fn=augment_fn,
        )
    # stream_fresh: regenerate the on-device pool every epoch so long runs
    # see the reference's infinite-fresh-data distribution (its maze dataset
    # builds a maze per __getitem__, maze.py:945-966) instead of cycling one
    # finite pool — which measurably degrades sample exactness at the 500k
    # schedule. Deterministic: pool i is keyed by the absolute epoch index,
    # so preemption/resume replays the identical data stream.
    stream_fresh = (
        device_data
        and not has_label
        and bool(cfg.data.get("stream_fresh", False))
        and hasattr(dataset, "regenerate")
    )
    steps_per_epoch = max(1, len(dataset) // int(cfg.data.batch_size))
    # stream_refresh_period: epochs each pool lives for. Generators slower
    # than an epoch (sudoku: ~2.6s/pool vs ~1.3s/epoch on this host) set
    # period > 1 and get async prefetch: the next pool is generated on a
    # background thread (ctypes releases the GIL inside the C++ generator)
    # while the chip trains on the current one, and the swap blocks only if
    # generation couldn't keep up — the data stream itself stays
    # deterministic either way because pools are keyed by absolute epoch.
    refresh_period = max(1, int(cfg.data.get("stream_refresh_period", 1)))
    steps_per_pool = steps_per_epoch * refresh_period
    stream_async = bool(cfg.data.get("stream_async", refresh_period > 1))

    def _gen_host_pool(it: int) -> np.ndarray:
        # pool keyed by the epoch index of its boundary (absolute, so
        # preemption/resume replays the identical data stream)
        epoch = (it // steps_per_epoch) // refresh_period * refresh_period
        return (
            dataset.regenerate(epoch)
            .reshape(len(dataset), -1)
            .astype(np.int32)
        )

    def _put_pool(flat_new: np.ndarray):
        if single:
            return jnp.asarray(flat_new)
        return jax.device_put(
            flat_new,
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
        )

    def refresh_pool(it: int):
        return _put_pool(_gen_host_pool(it))

    _pool_box = {}

    def _prefetch_pool(it: int):
        import threading

        th = threading.Thread(
            target=lambda: _pool_box.update(flat=_gen_host_pool(it)),
            daemon=True,
        )
        th.start()
        _pool_box["thread"] = th

    def _collect_pool():
        _pool_box.pop("thread").join()
        return _put_pool(_pool_box.pop("flat"))

    if not device_data and single:
        from ctdd_tpu.training.train_step import make_train_step

        step_fn = make_train_step(
            model, loss, tx, ema_decay=ema_decay, augment_fn=augment_fn
        )
    elif not device_data:
        step_fn = make_dp_train_step(
            model, loss, tx, mesh, ema_decay=ema_decay, has_label=has_label,
            augment_fn=augment_fn,
        )

    preempt = bookkeeping.PreemptionHandler(paths["root"])
    preempt.set_save_fn(lambda: ckpt.save(int(state.step), state, force=True))
    preempt.install()

    checkpoint_freq = cfg.saving.get("checkpoint_freq", 10000)
    sample_freq = cfg.sampler.get("sample_freq", 0)
    # D3PM models carry no CTMC forward process (model.process is None); the
    # CTMC samplers here would crash mid-run (observed: AttributeError at the
    # iter-10k grid pass of a synthetic_d3pm train). Their ancestral sampling
    # lives in eval.py's d3pm branch; skip in-loop grids for them.
    has_process = getattr(model, "process", None) is not None
    sampler = (
        get_sampler(cfg)
        if sample_freq and sample_freq <= n_iters and has_process
        else None
    )
    if sample_freq and not has_process:
        print("in-loop sample grids disabled: model has no CTMC process "
              "(d3pm family) — use eval.py for sampling")
    losses = []
    t_start = time.time()
    t_post_compile = None  # set after the first step completes
    n_start = int(state.step)
    if stream_fresh and n_start > 0:
        # resume: the constructor pool is epoch 0; rebuild the pool for the
        # epoch the run restarts in so the resumed stream matches what an
        # uninterrupted run would have trained on (the in-loop refresh guard
        # below intentionally skips it == n_start)
        data_on_device = refresh_pool(n_start)
    if stream_fresh and stream_async:
        next_boundary = (n_start // steps_per_pool + 1) * steps_per_pool
        if next_boundary < n_iters:
            _prefetch_pool(next_boundary)
    for it in range(n_start, n_iters):
        # profiling window (SURVEY.md §5: jax.profiler replaces the
        # reference's vestigial torch profiler imports)
        if profile_steps and it == profile_steps[0]:
            jax.profiler.start_trace(os.path.join(paths["root"], "profile"))
        # one base key for the whole run; the step folds in state.step
        if device_data:
            if stream_fresh and it > n_start and it % steps_per_pool == 0:
                if stream_async:
                    data_on_device = _collect_pool()
                    if it + steps_per_pool < n_iters:
                        _prefetch_pool(it + steps_per_pool)
                else:
                    data_on_device = refresh_pool(it)
            state, l = step_fn(state, data_on_device, key)
        else:
            batch, label = next(batches)
            batch = shard_batch(np.asarray(batch), mesh)
            if has_label:
                label = shard_batch(np.asarray(label, np.int32), mesh)
                state, l = step_fn(state, batch, key, label)
            else:
                state, l = step_fn(state, batch, key)
        if profile_steps and it == profile_steps[1]:
            jax.block_until_ready(l)
            jax.profiler.stop_trace()
        if t_post_compile is None:
            jax.block_until_ready(l)
            t_post_compile = time.time()
        if (it + 1) % log_every == 0:
            lv = float(l)
            losses.append(lv)
            writer.add_scalar("loss", lv, it + 1)
            now = time.time()
            rate = (it + 1 - n_start) / max(now - (t_post_compile or t_start), 1e-9)
            print(
                f"iter {it + 1}/{n_iters} loss {lv:.5f} "
                f"({rate:.1f} steps/s)",
                flush=True,
            )
        if (it + 1) % checkpoint_freq == 0:
            ckpt.save(it + 1, state)
            # make scalar history durable at every checkpoint boundary, so a
            # killed/preempted run keeps a loss curve up to its last ckpt
            writer.flush()
        # periodic sample grids with EMA weights (train_image.py:123-145)
        if sampler is not None and (it + 1) % sample_freq == 0:
            _save_sample_grid(
                cfg, model, state, sampler, writer, paths["pngs"], it + 1,
                dataset=dataset,
            )
    jax.block_until_ready(l) if n_iters > n_start else None
    elapsed = time.time() - (t_post_compile or t_start)
    ckpt.save(n_iters, state, force=True)
    if losses:
        # loss-curve png like the reference train loops save
        # (train_image.py:108-121)
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        ax.plot(np.arange(len(losses)) * log_every + n_start, losses)
        ax.set_xlabel("iteration")
        ax.set_ylabel("loss")
        fig.savefig(os.path.join(paths["root"], "loss_curve.png"))
        plt.close(fig)
    writer.flush()
    return state, {
        "paths": paths,
        "losses": losses,
        # steady-state rate: excludes the first (compile) step
        "steps_per_sec": max(n_iters - n_start - 1, 1) / max(elapsed, 1e-9),
        "model": model,
    }
