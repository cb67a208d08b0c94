"""Regression tests for the driver entry points in __graft_entry__.py.

The multichip dryrun MUST be run the way the driver runs it: a fresh
interpreter with no conftest config mutation (round-1 failure mode: the
8-device CPU override was dead because jax.devices() initialized the axon
backend first — VERDICT.md round 1, item 1).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_fresh_interpreter():
    """Invoke dryrun_multichip(8) in a pristine subprocess, like the driver."""
    env = dict(os.environ)
    # Do NOT set JAX_PLATFORMS / XLA_FLAGS: the driver doesn't either; the
    # entry point itself must defeat the axon platform pin.
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=580,
    )
    assert proc.returncode == 0, f"stdout={proc.stdout}\nstderr={proc.stderr}"
    assert "dryrun_multichip(8): ok" in proc.stdout
