"""device_guard: the normal path must return devices and disarm cleanly.

The timeout path (process abort) was live-verified against a genuinely
wedged axon tunnel (round 3, 2026-08-17 19:32 outage) — it can't be
simulated here without blocking jax.devices() itself.
"""

import jax

from ctdd_tpu.utils.device_guard import guard_device_init


def test_guard_returns_devices_and_disarms():
    devices = guard_device_init(timeout=60.0)
    assert devices == jax.devices()
    assert len(devices) >= 1


def test_guard_reads_env_default(monkeypatch):
    monkeypatch.setenv("CTDD_DEVICE_TIMEOUT", "45")
    devices = guard_device_init()
    assert len(devices) >= 1
