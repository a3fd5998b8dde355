"""Multi-process (DCN) dryrun: jax.distributed bootstrap + cross-process DP.

The launcher spawns 2 worker processes x 4 virtual CPU devices and checks
loss agreement (scripts/multihost_dryrun.py; covers initialize_multihost,
make_array_from_process_local_data, shard_map pmean across processes, and a
cross-process orbax checkpoint roundtrip). ~20 min wall on the 1-vCPU dev
box, so gated behind CTDD_RUN_MULTIHOST=1 — run manually per round:

    CTDD_RUN_MULTIHOST=1 python -m pytest tests/test_multihost_dryrun.py -q
"""

import os
import subprocess
import sys

import pytest


@pytest.mark.skipif(
    os.environ.get("CTDD_RUN_MULTIHOST") != "1",
    reason="2-process launcher takes ~20 min on the 1-vCPU box; "
    "set CTDD_RUN_MULTIHOST=1. Last green run committed at "
    "docs/assets/round3/multihost_dryrun.log",
)
def test_multihost_launcher():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "multihost_dryrun.py"),
         "--launch"],
        capture_output=True, text=True, timeout=3600, cwd=root,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "multihost dryrun ok" in out.stdout
