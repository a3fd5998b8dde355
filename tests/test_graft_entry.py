"""Pin the driver entry points in __graft_entry__.py.

The round driver compile-checks entry() single-chip and executes
dryrun_multichip(N) on a virtual CPU mesh at the end of every round; a
regression there is an infra failure the normal suite would otherwise not
see. Both run here on the suite's 8-device CPU mesh (conftest.py).
"""

import sys
import os

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as ge  # noqa: E402


def test_dryrun_multichip_8_devices():
    # conftest already provides >=8 virtual CPU devices; the function must
    # run one full DP train step and assert a finite loss itself.
    ge.dryrun_multichip(8)


def test_entry_tiny_forward_jits():
    # entry() builds the full-size flagship UNet — too slow for the suite on
    # 1 vCPU. Compile the identical code path at the tiny geometry instead.
    from ctdd_tpu.models.base import create_model

    cfg = ge._flagship_cfg(tiny=True)
    model = create_model(cfg)
    B, D = 2, cfg.model.concat_dim
    x = jax.numpy.zeros((B, D), jax.numpy.int32)
    t = jax.numpy.full((B,), 0.5, jax.numpy.float32)
    params = model.init(jax.random.PRNGKey(0), x, t)
    out = jax.jit(lambda p, x, t: model.apply(p, x, t))(params, x, t)
    assert out.shape == (B, D, cfg.data.S)
    assert np.isfinite(np.asarray(out)).all()
