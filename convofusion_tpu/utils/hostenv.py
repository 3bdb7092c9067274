"""Host environment helpers usable BEFORE jax initializes (stdlib only).

Shared by ``__graft_entry__`` and ``bench.py`` — keep this module free of
jax imports so it can adjust ``XLA_FLAGS`` ahead of backend creation.
"""
from __future__ import annotations

import os
import re


def set_host_device_count(n: int) -> None:
    """Request ``n`` virtual host (CPU) devices via ``XLA_FLAGS``.

    Rewrites an existing ``--xla_force_host_platform_device_count`` flag
    (which may carry a smaller count) instead of appending a duplicate —
    XLA's duplicate-flag resolution is unspecified.  Only effective before
    the CPU backend is created; post-init callers must also use
    ``jax.config.update('jax_num_cpu_devices', n)`` + clear_backends (see
    ``__graft_entry__._ensure_devices``).
    """
    flags = os.environ.get("XLA_FLAGS", "")
    flag = f"--xla_force_host_platform_device_count={n}"
    if "xla_force_host_platform_device_count" in flags:
        flags = re.sub(
            r"--xla_force_host_platform_device_count=\d+", flag, flags)
    else:
        flags = (flags + " " + flag).strip()
    os.environ["XLA_FLAGS"] = flags
