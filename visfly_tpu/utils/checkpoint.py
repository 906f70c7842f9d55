"""Pytree checkpointing via orbax (fallback: pickle of device_get'd arrays).

Replaces the reference's SB3 zip / ``th.save(self.policy)`` checkpoints
(`/root/reference/utils/algorithms/PPO.py:418-431`, `shac.py:328-348`).
"""
from __future__ import annotations

import os
import pickle
from typing import Any

import jax


def save_pytree(path: str, tree: Any) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), tree, force=True)
        ckptr.wait_until_finished()
    except Exception:
        with open(path if path.endswith(".pkl") else path + ".pkl", "wb") as f:
            pickle.dump(jax.device_get(tree), f)


def load_pytree(path: str, template: Any) -> Any:
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(path), template)
    except Exception:
        p = path if os.path.exists(path) else path + ".pkl"
        with open(p, "rb") as f:
            return pickle.load(f)


def unique_path(base: str, comment: str | None, name: str) -> str:
    """Auto-incrementing save path ``{base}/{name}_{comment}_{i}``
    (`PPO.py:89-100`)."""
    index = 1
    stem = f"{name}_{comment}" if comment else name
    path = os.path.join(base, f"{stem}_{index}")
    while os.path.exists(path):
        index += 1
        path = os.path.join(base, f"{stem}_{index}")
    return path
