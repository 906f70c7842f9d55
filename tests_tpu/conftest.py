"""On-TPU test lane (VERDICT r4 #5).

The main suite (`tests/`) forces the CPU backend and runs every Pallas
kernel in interpret mode — Mosaic lowering is never exercised there. This
lane runs the same kernel-vs-XLA parity checks on REAL hardware:

    python -m pytest tests_tpu/ -q        # ~3-5 min on one v5e

Skips everything when no TPU is attached (CI hosts), so it is always safe
to invoke. Unlike `tests/conftest.py`, the platform is NOT overridden.
"""
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() == "tpu":
        return
    skip = pytest.mark.skip(reason="no TPU attached (backend="
                            f"{jax.default_backend()})")
    for item in items:
        item.add_marker(skip)
