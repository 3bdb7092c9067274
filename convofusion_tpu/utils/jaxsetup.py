"""Per-process jax runtime setup for the CLI entry points.

Applies the config's TPU block before any compilation happens:
  * ``TPU.COMPILATION_CACHE`` (default on): persistent XLA executable
    cache so repeat CLI invocations skip the 30-90 s sampler compiles —
    the CLI analogue of tests/conftest.py's cache.
  * ``TPU.PLATFORM``: force a jax platform (e.g. ``cpu`` for smoke runs;
    the container's TPU-tunnel backend otherwise wins).
  * ``TPU.MULTIHOST`` is handled by the train CLI itself
    (``jax.distributed.initialize``).
"""
from __future__ import annotations

import os


def setup_jax(cfg) -> None:
    import jax

    tpu = cfg.get("TPU", {}) if hasattr(cfg, "get") else {}
    platform = tpu.get("PLATFORM") if hasattr(tpu, "get") else None
    if platform:
        jax.config.update("jax_platforms", str(platform))

    cache = tpu.get("COMPILATION_CACHE", True) if hasattr(tpu, "get") \
        else True
    if cache:
        cache_dir = cache if isinstance(cache, str) else os.path.join(
            os.path.expanduser("~"), ".cache", "convofusion_tpu",
            "jax_cache")
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 2)
        except Exception:
            pass  # older jax without the persistent cache knobs
