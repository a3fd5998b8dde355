"""Persistent XLA compilation cache.

Compiles dominate iteration latency on small hosts (the dev box's 1-vCPU
frontend takes 5-10 min for the MNIST UNet train step and the 1000-step
sampler scan). Every CLI entry point enables the on-disk executable cache so
a resume / eval / bench of an already-compiled program loads in seconds.

Disable with CTDD_COMPILE_CACHE=0; point elsewhere with CTDD_COMPILE_CACHE=
/path. Errors (e.g. a PJRT plugin that cannot serialize executables) are
swallowed by JAX — the cache is best-effort by design.
"""

from __future__ import annotations

import os


def enable_compile_cache() -> str | None:
    loc = os.environ.get("CTDD_COMPILE_CACHE", "")
    if loc == "0":
        return None
    path = loc or os.path.expanduser("~/.cache/ctdd_jax_cache")
    os.makedirs(path, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_raise_persistent_cache_errors", False)
    return path
