"""Test harness: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on virtual CPU devices; bench.py runs on
real TPU hardware separately (SURVEY.md §4).

Note: the container's ``sitecustomize`` registers an experimental TPU-tunnel
backend at interpreter start, so env vars alone are not enough — we override
``jax_platforms`` via the config API before any backend is used.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite is compile-dominated (samplers,
# WEG while_loops); repeat runs reuse executables
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
except Exception:
    pass

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# the reference repo is used as a read-only torch oracle for parity tests
REFERENCE = "/root/reference"

# reference modules import `omegaconf`, which is absent in this image; our
# config system implements a compatible subset — register it as a shim
if "omegaconf" not in sys.modules:
    import types

    from convofusion_tpu.config import omega as _omega

    shim = types.ModuleType("omegaconf")
    shim.OmegaConf = _omega.OmegaConf
    shim.DictConfig = _omega.DictConfig
    sys.modules["omegaconf"] = shim

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_path():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference repo not mounted")
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    return REFERENCE


def pytest_report_header(config):
    """Make the tier split visible in every run: the default addopts
    (-m 'not slow', pyproject.toml) deselects the compile/oracle-heavy
    parity tier unless the marker expression includes it."""
    expr = (config.getoption("-m") or "").strip()
    if expr == "not slow":
        return ("tier: fast only — slow tier (torch-oracle goldens, "
                "production parity, multi-host) DESELECTED; run "
                "pytest -m 'slow or not slow' for the full suite")
    return f"tier: marker expression {expr!r}"
