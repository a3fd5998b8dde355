"""Kill/resume produces the bit-identical training trajectory.

VERDICT r1 item 7: the reference's 600k-iter runs survive preemption by
checkpoint + restart; for that to be sound, resuming from step k must
reproduce the uninterrupted run exactly. The step folds `state.step` into a
fixed base key (train_step.py:94,125), so params, EMA, opt state and the
data/noise streams are all pure functions of (checkpointed state, base key)
— verified here bitwise on the device-data path the flagship uses.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ctdd_tpu.config.presets import get_preset
from ctdd_tpu.data.loaders import get_dataset
from ctdd_tpu.losses.losses import get_loss
from ctdd_tpu.models.base import create_model
from ctdd_tpu.training.optimizers import get_optimizer
from ctdd_tpu.training.state import create_train_state
from ctdd_tpu.training.train_step import make_device_data_step
from ctdd_tpu.utils.bookkeeping import CheckpointManager


def _setup():
    cfg = get_preset("mlp_synthetic")
    cfg.data.shape = [8]
    cfg.data.num_samples = 64
    cfg.data.location = ""
    cfg.data.batch_size = 8
    cfg.model.concat_dim = 8
    cfg.model.d_model = 16
    cfg.model.hidden_dim = 32
    cfg.model.num_layers = 1
    cfg.model.temb_dim = 8
    cfg.model.ema_decay = 0.99
    model = create_model(cfg)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 8), jnp.int32)
    t = jnp.full((2,), 0.5)
    params = model.init(key, x, t)
    tx = get_optimizer(cfg)
    state = create_train_state(params, tx)
    data = jnp.asarray(
        get_dataset(cfg).data.reshape(64, -1).astype(np.int32)
    )
    # donate=False default only exists on make_train_step; device-data step
    # donates, so keep independent states per trajectory
    step = make_device_data_step(
        model, get_loss(cfg), tx, batch_size=8, ema_decay=0.99
    )
    return state, step, data


def _tree_equal(a, b):
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_restart_bit_identical(tmp_path):
    base_key = jax.random.PRNGKey(42)

    # uninterrupted: 8 steps
    state, step, data = _setup()
    for _ in range(8):
        state, _ = step(state, data, base_key)
    full = jax.device_get(state)

    # interrupted: 4 steps -> checkpoint -> restore -> 4 steps
    state_b, step_b, data_b = _setup()
    for _ in range(4):
        state_b, _ = step_b(state_b, data_b, base_key)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(4, state_b, force=True)

    state_c, step_c, data_c = _setup()  # fresh template, fresh jit
    mgr2 = CheckpointManager(str(tmp_path / "ckpt"))
    state_c = mgr2.restore(state_c)
    assert int(state_c.step) == 4
    for _ in range(4):
        state_c, _ = step_c(state_c, data_c, base_key)
    resumed = jax.device_get(state_c)

    assert int(full.step) == int(resumed.step) == 8
    _tree_equal(full.params, resumed.params)
    _tree_equal(full.ema_params, resumed.ema_params)
    _tree_equal(full.opt_state, resumed.opt_state)
    assert int(full.ema_num_updates) == int(resumed.ema_num_updates)
