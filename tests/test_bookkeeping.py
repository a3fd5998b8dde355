"""Bookkeeping: run folders, writers, preemption, resume discovery."""

import os

import numpy as np
import pytest

from ctdd_tpu.config.base import save_config
from ctdd_tpu.config.presets import get_preset
from ctdd_tpu.utils import bookkeeping


def test_experiment_folder_layout(tmp_path):
    paths = bookkeeping.create_experiment_folder(str(tmp_path), "exp")
    for k in ("root", "checkpoints", "config", "pngs"):
        assert os.path.isdir(paths[k])


def test_experiment_folder_git_hash_stamp(tmp_path):
    # ref bookkeeping.py:63-68: run folders record the commit they ran from
    import subprocess

    paths = bookkeeping.create_experiment_folder(str(tmp_path), "exp")
    stamp = os.path.join(paths["root"], "git_hash.txt")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        head = subprocess.check_output(
            ["git", "rev-parse", "--verify", "HEAD"], cwd=repo
        ).decode()
    except Exception:
        pytest.skip("not a git checkout")
    assert os.path.exists(stamp)
    with open(stamp) as f:
        assert f.read().strip() == head.strip()


def test_numpy_writer(tmp_path):
    w = bookkeeping.NumpyWriter(str(tmp_path))
    for i in range(5):
        w.add_scalar("loss", 1.0 / (i + 1), i)
    w.flush()
    data = np.load(tmp_path / "loss.npz")
    assert len(data["steps"]) == 5
    np.testing.assert_allclose(data["values"][0], 1.0)


def test_preemption_handler_saves_and_exits(tmp_path):
    h = bookkeeping.PreemptionHandler(str(tmp_path))
    saved = []
    h.set_save_fn(lambda: saved.append(True))
    with pytest.raises(SystemExit):
        h._handler(15, None)
    assert saved == [True]
    log = (tmp_path / "preemption_log.txt").read_text()
    assert "signal 15" in log


def test_check_for_preempted_run(tmp_path):
    cfg = get_preset("mlp_synthetic")
    cfg.save_location = str(tmp_path)
    paths = bookkeeping.create_experiment_folder(
        str(tmp_path), cfg.experiment_name
    )
    save_config(cfg, os.path.join(paths["config"], "config.yaml"))
    # No finalized checkpoint step yet -> NOT resumable (regression: a run
    # that crashed before its first save used to be selected and then
    # crash-looped every watchdog relaunch on restore()).
    assert bookkeeping.check_for_preempted_run(
        str(tmp_path), cfg.experiment_name, cfg
    ) is None
    # an unfinalized orbax tmp dir alone is still not resumable
    os.makedirs(os.path.join(paths["checkpoints"], "2500.orbax-checkpoint-tmp"))
    assert bookkeeping.check_for_preempted_run(
        str(tmp_path), cfg.experiment_name, cfg
    ) is None
    os.makedirs(os.path.join(paths["checkpoints"], "2500"))
    found = bookkeeping.check_for_preempted_run(
        str(tmp_path), cfg.experiment_name, cfg
    )
    assert found == paths["root"]
    # a config mismatch must NOT match (ref bookkeeping.py:285-340 semantics)
    cfg2 = get_preset("mlp_synthetic")
    cfg2.save_location = str(tmp_path)
    cfg2.optimizer.lr = 9e-9
    assert bookkeeping.check_for_preempted_run(
        str(tmp_path), cfg.experiment_name, cfg2
    ) is None


def test_check_for_preempted_run_midnight_and_progress(tmp_path):
    """A run that crossed midnight must still be found, and among
    config-equal runs the one with the HIGHEST checkpoint step wins
    (regression: a fresh same-config run at step 3k must not shadow the
    yesterday run at 520k)."""
    import datetime

    cfg = get_preset("mlp_synthetic")
    cfg.save_location = str(tmp_path)
    yesterday = (
        datetime.datetime.now() - datetime.timedelta(days=1)
    ).strftime("%Y-%m-%d")
    old_root = os.path.join(tmp_path, yesterday, "exp_20-00-00")
    for sub in ("config", "checkpoints/520000"):
        os.makedirs(os.path.join(old_root, sub))
    save_config(cfg, os.path.join(old_root, "config", "config.yaml"))

    found = bookkeeping.check_for_preempted_run(
        str(tmp_path), "exp", cfg
    )
    assert found == old_root

    # a NEWER config-equal run with less progress must not win
    paths = bookkeeping.create_experiment_folder(str(tmp_path), "exp")
    save_config(cfg, os.path.join(paths["config"], "config.yaml"))
    os.makedirs(os.path.join(paths["checkpoints"], "3100"))
    found = bookkeeping.check_for_preempted_run(
        str(tmp_path), "exp", cfg
    )
    assert found == old_root


def test_ema_ramp_matches_reference():
    """decay ramp min(decay, (1+n)/(10+n)) (ref models.py:745-758)."""
    import jax.numpy as jnp

    from ctdd_tpu.training.state import TrainState

    state = TrainState(
        params={"w": jnp.ones(3)},
        ema_params={"w": jnp.zeros(3)},
        opt_state=None,
        step=jnp.int32(0),
        ema_num_updates=jnp.int32(0),
    )
    new_params = {"w": jnp.ones(3)}
    ema, n = state.ema_update(new_params, decay=0.9999)
    # n=1 -> d = min(0.9999, 2/11); ema = 0 - (1-d)(0-1) = 1-d... = (1-d)
    d = min(0.9999, 2.0 / 11.0)
    np.testing.assert_allclose(np.asarray(ema["w"]), 1.0 - d, rtol=1e-6)
    assert int(n) == 1
