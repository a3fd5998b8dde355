"""Multi-process (multi-host) dry run: 2 processes x 4 virtual CPU devices.

Exercises the DCN-ready assembly path that single-process dryruns cannot:
`jax.distributed.initialize` bootstrap, a global 8-device mesh spanning both
processes, `make_array_from_process_local_data` batch assembly (each process
contributes its local half of the global batch), the shard_map DP train step
with cross-process gradient pmean, and an orbax checkpoint save/restore
coordinated across the mesh.

Run as a worker (one per process):
    python scripts/multihost_dryrun.py --nprocs 2 --pid {0,1} --port 12355 \
        --ckpt /tmp/ckpt
or as the launcher that spawns both workers and checks their agreement:
    python scripts/multihost_dryrun.py --launch
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile

DEVS_PER_PROC = 4


def worker(nprocs: int, pid: int, port: int, ckpt_dir: str, steps: int = 2):
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEVS_PER_PROC}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    from ctdd_tpu.parallel.mesh import initialize_multihost

    initialize_multihost(f"localhost:{port}", nprocs, pid)
    assert jax.process_count() == nprocs, jax.process_count()
    n_global = nprocs * DEVS_PER_PROC
    assert len(jax.devices()) == n_global, jax.devices()

    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_cfg

    from ctdd_tpu.losses.losses import get_loss
    from ctdd_tpu.models.base import create_model
    from ctdd_tpu.parallel.dp import make_dp_train_step
    from ctdd_tpu.parallel.mesh import make_mesh, shard_batch
    from ctdd_tpu.training.optimizers import get_optimizer
    from ctdd_tpu.training.state import create_train_state
    from ctdd_tpu.utils.bookkeeping import CheckpointManager

    cfg = _flagship_cfg(tiny=True)
    model = create_model(cfg)
    D = cfg.model.concat_dim
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, D), jnp.int32), jnp.full((2,), 0.5)
    )
    mesh = make_mesh(n_global)
    tx = get_optimizer(cfg)
    state = create_train_state(params, tx)
    step = make_dp_train_step(model, get_loss(cfg), tx, mesh, ema_decay=0.9999)

    # global batch of 2 per device; each process passes only ITS local rows
    # (the multi-host contract of shard_batch / make_array_from_process_local_data)
    global_batch = (
        np.random.RandomState(0)
        .randint(0, cfg.data.S, size=(2 * n_global, D))
        .astype(np.int32)
    )
    per_proc = len(global_batch) // nprocs
    local = global_batch[pid * per_proc : (pid + 1) * per_proc]
    losses = []
    for i in range(steps):
        batch = shard_batch(local, mesh)
        state, l = step(state, batch, jax.random.PRNGKey(1 + i))
        losses.append(float(l))
    assert all(np.isfinite(v) for v in losses), losses

    # cross-process checkpoint roundtrip (orbax coordinates all processes)
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(int(state.step), state, force=True)
    restored = mgr.restore(
        jax.tree.map(np.zeros_like, jax.device_get(state))
    )
    np.testing.assert_allclose(
        np.asarray(jax.device_get(state.params))
        if not isinstance(state.params, dict)
        else np.asarray(
            jax.tree_util.tree_leaves(jax.device_get(state.params))[0]
        ),
        np.asarray(jax.tree_util.tree_leaves(jax.device_get(restored.params))[0]),
        rtol=1e-6,
    )
    assert int(restored.step) == int(state.step)
    print(f"MULTIHOST_OK pid={pid} losses={losses}")


def launch():
    port = 12358
    with tempfile.TemporaryDirectory() as ckpt_dir:
        procs = [
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--nprocs", "2",
                 "--pid", str(pid), "--port", str(port), "--ckpt", ckpt_dir],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            for pid in range(2)
        ]
        outs = [p.communicate(timeout=2400)[0] for p in procs]
    ok = all(p.returncode == 0 for p in procs) and all(
        "MULTIHOST_OK" in o for o in outs
    )
    # both processes must see identical (pmean-reduced) losses
    import re

    loss_lines = [re.search(r"losses=\[([^\]]*)\]", o) for o in outs]
    agree = (
        all(m is not None for m in loss_lines)
        and loss_lines[0].group(1) == loss_lines[1].group(1)
    )
    for i, o in enumerate(outs):
        tail = "\n".join(o.strip().splitlines()[-3:])
        print(f"--- proc {i} rc={procs[i].returncode}\n{tail}")
    if not (ok and agree):
        print("MULTIHOST DRYRUN FAILED")
        sys.exit(1)
    print("multihost dryrun ok: 2 procs x 4 devices, losses agree")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--launch", action="store_true")
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--port", type=int, default=12355)
    ap.add_argument("--ckpt", default="/tmp/multihost_ckpt")
    a = ap.parse_args()
    if a.launch:
        launch()
    else:
        worker(a.nprocs, a.pid, a.port, a.ckpt)
