"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (multi-chip sharding is validated
without TPU hardware) and in float64 where parity demands it. These env vars
MUST be set before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize registers (and may eagerly initialise) the TPU
# tunnel backend before any user code runs, so the env var alone is not
# enough — force the platform through the config API as well.
jax.config.update("jax_platforms", "cpu")

import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_dynamics():
    """Import the reference (read-only mount) Dynamics for parity testing.

    Skips gracefully if the mount or torch is unavailable.
    """
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference repo not mounted")
    sys.path.insert(0, "/root")
    try:
        from reference.envs.base.dynamics import Dynamics  # type: ignore
    except Exception as e:  # pragma: no cover
        pytest.skip(f"cannot import reference dynamics: {e}")
    return Dynamics
