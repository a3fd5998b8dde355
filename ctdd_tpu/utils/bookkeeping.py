"""Experiment bookkeeping: run folders, checkpoints, preemption, writers.

Counterpart of reference lib/utils/bookkeeping.py (394 LoC):
- experiment folders (:17-42) and config YAML save/load (:374-394)
- checkpoint save/load of {model, optimizer, n_iter} (:343-371) — here the
  whole TrainState pytree (params, ema_params, opt_state, step) via orbax
- rolling retention (:83-96)
- preemption: SIGCONT/SIGINT/SIGTERM handlers that checkpoint and exit
  (:216-283), plus resume discovery by config equality (:285-340)
- TensorBoard writer (rank-0) (:71-80) with a numpy/dummy fallback (:162-213)
"""

from __future__ import annotations

import datetime
import glob
import os
import signal
import sys
from typing import Any, Optional

import numpy as np
import orbax.checkpoint as ocp

from ctdd_tpu.config.base import load_config


def create_experiment_folder(save_location: str, experiment_name: str) -> dict:
    """Dated run folder with checkpoints/ and config/ (ref bookkeeping.py:17-42)."""
    now = datetime.datetime.now()
    folder = os.path.join(
        save_location, now.strftime("%Y-%m-%d"), experiment_name + now.strftime("_%H-%M-%S")
    )
    paths = {
        "root": folder,
        "checkpoints": os.path.join(folder, "checkpoints"),
        "config": os.path.join(folder, "config"),
        "pngs": os.path.join(folder, "pngs"),
    }
    for p in paths.values():
        os.makedirs(p, exist_ok=True)
    save_git_hash(folder)
    return paths


def save_git_hash(save_dir: str) -> None:
    """Stamp the run folder with the current commit (ref bookkeeping.py:63-68).

    Best-effort: silently skipped outside a git checkout."""
    import subprocess

    try:
        h = subprocess.check_output(
            ["git", "rev-parse", "--verify", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            stderr=subprocess.DEVNULL,
        ).decode()
        with open(os.path.join(save_dir, "git_hash.txt"), "w") as f:
            f.write(h)
    except Exception:
        pass


class CheckpointManager:
    """Orbax-backed rolling checkpoints of the TrainState pytree."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, force: bool = False) -> None:
        if self.manager.latest_step() == step:
            return  # already checkpointed at this step (idempotent save)
        self.manager.save(step, args=ocp.args.StandardSave(state), force=force)
        self.manager.wait_until_finished()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        if step is not None and step not in self.manager.all_steps():
            # orbax's own error for a missing step dir is a misleading
            # "Must provide `args` of type `Composite`" — say what happened
            # (rolling retention deletes old steps)
            raise FileNotFoundError(
                f"checkpoint step {step} not found; available: "
                f"{sorted(self.manager.all_steps())}"
            )
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self.manager.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()


class PreemptionHandler:
    """Checkpoint-on-signal (ref bookkeeping.py:216-283).

    Registers SIGCONT/SIGINT/SIGTERM handlers that append to
    preemption_log.txt, save a final checkpoint, and exit.
    """

    def __init__(self, run_dir: str):
        self.run_dir = run_dir
        self._save_fn = None
        self.preempted = False

    def set_save_fn(self, fn):
        self._save_fn = fn

    def install(self):
        for sig in (signal.SIGCONT, signal.SIGINT, signal.SIGTERM):
            signal.signal(sig, self._handler)

    def _handler(self, signum, frame):
        self.preempted = True
        log = os.path.join(self.run_dir, "preemption_log.txt")
        with open(log, "a") as f:
            f.write(f"{datetime.datetime.now().isoformat()} signal {signum}\n")
        if self._save_fn is not None:
            self._save_fn()
        sys.exit(0)


def check_for_preempted_run(
    save_location: str, experiment_name: str, cfg, lookback_days: int = 7
) -> Optional[str]:
    """Find the config-equal run folder with the most training progress
    (ref bookkeeping.py:285-340). Returns the run root or None.

    Scans the last `lookback_days` date folders (a run that crosses
    midnight must still be resumable) and, among config-equal candidates,
    picks the one whose checkpoints dir holds the HIGHEST step — a fresh
    same-config run must never shadow an older one with more progress."""
    want = cfg.to_dict()
    best, best_step = None, -1
    for back in range(lookback_days):
        day = (
            datetime.datetime.now() - datetime.timedelta(days=back)
        ).strftime("%Y-%m-%d")
        pattern = os.path.join(save_location, day, experiment_name + "_*")
        for folder in sorted(glob.glob(pattern), reverse=True):
            cfg_path = os.path.join(folder, "config", "config.yaml")
            if not os.path.exists(cfg_path):
                continue
            try:
                other = load_config(cfg_path).to_dict()
            except Exception:
                continue
            if other != want:
                continue
            ckpt_dir = os.path.join(folder, "checkpoints")
            steps = [
                int(d) for d in os.listdir(ckpt_dir)
                if d.isdigit()
            ] if os.path.isdir(ckpt_dir) else []
            # A run that died before finalizing any checkpoint (empty dir or
            # only *.orbax-checkpoint-tmp) is not resumable; selecting it
            # crash-loops every relaunch on restore(). Start fresh instead.
            if not steps:
                continue
            step = max(steps)
            if step > best_step:
                best, best_step = folder, step
    return best


# ---------------------------------------------------------------------------
# Writers (ref bookkeeping.py:71-80, 162-213)
# ---------------------------------------------------------------------------


class DummyWriter:
    def add_scalar(self, *a, **k): ...

    def add_figure(self, *a, **k): ...

    def add_image(self, *a, **k): ...

    def flush(self): ...

    def close(self): ...


class NumpyWriter:
    """Accumulates scalars into .npz files (ref bookkeeping.py:162-199)."""

    def __init__(self, directory: str):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)
        self._scalars: dict = {}

    def add_scalar(self, tag: str, value, step: int):
        self._scalars.setdefault(tag, []).append((step, float(value)))

    def add_figure(self, tag, fig, step):
        path = os.path.join(self.directory, f"{tag.replace('/', '_')}_{step}.png")
        fig.savefig(path)

    def add_image(self, *a, **k): ...

    def flush(self):
        for tag, vals in self._scalars.items():
            arr = np.asarray(vals)
            np.savez(
                os.path.join(self.directory, tag.replace("/", "_") + ".npz"),
                steps=arr[:, 0],
                values=arr[:, 1],
            )

    def close(self):
        self.flush()


def setup_writer(kind: str, directory: str):
    """'tensorboard' | 'numpy' | 'none' (ref setup_tensorboard, :71-80)."""
    if kind == "tensorboard":
        try:
            from torch.utils.tensorboard import SummaryWriter

            return SummaryWriter(directory, flush_secs=30)
        except Exception:
            return NumpyWriter(directory)
    if kind == "numpy":
        return NumpyWriter(directory)
    return DummyWriter()
