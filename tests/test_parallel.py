"""Multi-device tests on the 8-way virtual CPU mesh (SURVEY.md §4e)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctdd_tpu.config.presets import get_preset
from ctdd_tpu.losses.losses import get_loss
from ctdd_tpu.models.base import create_model
from ctdd_tpu.parallel.dp import make_dp_sampler, make_dp_train_step
from ctdd_tpu.parallel.mesh import make_mesh, shard_batch
from ctdd_tpu.sampling.samplers import get_sampler
from ctdd_tpu.training.optimizers import get_optimizer
from ctdd_tpu.training.state import create_train_state


def tiny_cfg():
    cfg = get_preset("mlp_synthetic")
    cfg.data.shape = [8]
    cfg.data.num_samples = 256
    cfg.data.location = ""
    cfg.model.concat_dim = 8
    cfg.model.d_model = 16
    cfg.model.hidden_dim = 32
    cfg.model.num_layers = 1
    cfg.model.temb_dim = 8
    cfg.sampler.num_steps = 4
    return cfg


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, "conftest should force 8 cpu devices"
    cfg = tiny_cfg()
    model = create_model(cfg)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 8), jnp.int32)
    t = jnp.ones((2,), jnp.float32) * 0.5
    params = model.init(key, x, t)
    return cfg, model, params


def test_dp_train_step_runs_and_replicates(setup):
    cfg, model, params = setup
    mesh = make_mesh(8)
    loss = get_loss(cfg)
    tx = get_optimizer(cfg)
    state = create_train_state(params, tx)
    step = make_dp_train_step(model, loss, tx, mesh, ema_decay=0.9999)

    batch = shard_batch(
        np.random.RandomState(0).randint(0, 2, size=(32, 8)).astype(np.int32), mesh
    )
    for i in range(3):
        state, l = step(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(l))
    assert int(state.step) == 3
    # params must remain replicated (identical) across devices
    p0 = jax.tree.leaves(state.params)[0]
    assert p0.sharding.is_fully_replicated


def test_dp_grad_is_mean_over_shards(setup):
    """DP loss == mean of per-shard losses with the same per-shard keys."""
    cfg, model, params = setup
    mesh = make_mesh(8)
    loss = get_loss(cfg)
    tx = get_optimizer(cfg)
    state = create_train_state(params, tx)
    step = make_dp_train_step(model, loss, tx, mesh, ema_decay=0.0)
    rng = np.random.RandomState(1)
    batch_np = rng.randint(0, 2, size=(32, 8)).astype(np.int32)
    key = jax.random.PRNGKey(7)
    _, l_dp = step(state, shard_batch(batch_np, mesh), key)

    # reproduce on host: shard i gets rows [4i:4i+4] and key
    # fold_in(fold_in(key, step=0), i)
    per = []
    for i in range(8):
        ki = jax.random.fold_in(jax.random.fold_in(key, 0), i)
        k_loss, _ = jax.random.split(ki)
        shard = jnp.asarray(batch_np[4 * i : 4 * (i + 1)])
        per.append(
            float(loss.calc_loss(model, params, k_loss, shard, n_iter=0, train=False))
        )
    np.testing.assert_allclose(float(l_dp), np.mean(per), rtol=2e-4)


def test_dp_sampler_shards_generation(setup):
    cfg, model, params = setup
    mesh = make_mesh(8)
    sampler = get_sampler(cfg)
    dp_sample = make_dp_sampler(sampler, mesh)
    out = dp_sample(model, params, jax.random.PRNGKey(0), N=16)
    assert out.shape == (16, 8)
    assert out.min() >= 0 and out.max() < cfg.data.S


def test_train_loop_smoke(tmp_path):
    from ctdd_tpu.training.loop import train

    cfg = tiny_cfg()
    cfg.save_location = str(tmp_path)
    cfg.saving.checkpoint_freq = 50
    mesh = make_mesh(8)
    state, info = train(
        cfg, n_iters=20, mesh=mesh, writer_kind="numpy", log_every=5
    )
    assert int(state.step) == 20
    assert all(np.isfinite(v) for v in info["losses"])
    # checkpoint written at the end
    import os

    assert os.path.isdir(info["paths"]["checkpoints"])


def test_checkpoint_roundtrip(tmp_path, setup):
    from ctdd_tpu.utils.bookkeeping import CheckpointManager

    cfg, model, params = setup
    tx = get_optimizer(cfg)
    state = create_train_state(params, tx)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(5, state)
    restored = mgr.restore(state)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
