"""Test config: force an 8-device virtual CPU mesh.

SURVEY.md §4(e): multi-device tests run on CPU via
--xla_force_host_platform_device_count=8 to exercise mesh/psum paths
without TPU hardware.

Note: this machine's sitecustomize force-registers a TPU PJRT plugin and
sets jax_platforms itself, so the env var alone is not enough — we override
the config after import, before any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
