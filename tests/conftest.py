"""Test configuration: force a LOCAL CPU backend with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware (the TPU-native
answer to the reference's untested DDP paths, SURVEY.md §4).

This environment ships an `axon` PJRT plugin (loaded by a sitecustomize on
PYTHONPATH at interpreter boot) that tunnels compiles/executions to one
remote TPU chip and sets ``jax.config.jax_platforms = "axon,cpu"`` — which
silently overrides the JAX_PLATFORMS env var.  Tests must run on the local
CPU backend, so we override the config back before any backend initializes.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Override with TPUSEG_REFERENCE_DIR=/nonexistent to prove the suite is
# self-contained without the mirror (parity tests skip, all else passes).
REFERENCE_DIR = os.environ.get("TPUSEG_REFERENCE_DIR", "/root/reference")
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# vendored RBGP config set (tpuseg.tools.gen_configs) — self-contained,
# present whether or not the reference mirror is mounted
VENDORED_CONFIGS = os.path.join(REPO_ROOT, "optimal_configs")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_DIR)


requires_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_DIR),
    reason="reference repo not mounted",
)
