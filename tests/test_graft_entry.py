"""Driver-contract regression tests for __graft_entry__.

Round 1 failed the driver's multichip check on an environment bug in this
exact file (MULTICHIP_r01.json rc=1) — keep both entry() and
dryrun_multichip() exercised in-suite so a regression is caught before
the driver runs them.
"""
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile/oracle heavy (see pyproject addopts)
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402


def test_ensure_devices_is_idempotent():
    devices = graft._ensure_devices(8)
    assert len(devices) == 8
    # second call must not disturb an already-sufficient backend
    assert len(graft._ensure_devices(8)) == 8
    assert len(graft._ensure_devices(4)) == 4


def test_entry_contract():
    fn, args = graft.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_dryrun_multichip_contract(capsys):
    graft.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "dp: loss=" in out
    assert "dp x tp" in out
