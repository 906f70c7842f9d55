"""Debugging helpers: network weight statistics.

Counterpart of `/root/reference/utils/test/debug.py:9-26`
(``get_network_statistics`` / ``check_none_parameters``) for flax param
pytrees.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def get_network_statistics(params: Any, logger=None, prefix: str = "weights",
                           is_record: bool = True) -> Dict[str, float]:
    """Per-layer mean/std/absmax of a parameter pytree; optionally records
    into a Logger."""
    stats: Dict[str, float] = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = "/".join(
            str(getattr(p, "key", getattr(p, "name", p))) for p in path
        )
        arr = np.asarray(leaf)
        stats[f"{prefix}/{name}/mean"] = float(arr.mean())
        stats[f"{prefix}/{name}/std"] = float(arr.std())
        stats[f"{prefix}/{name}/absmax"] = float(np.abs(arr).max())
    if logger is not None and is_record:
        for k, v in stats.items():
            logger.record(k, v)
    return stats


def check_nan_parameters(params: Any) -> Dict[str, bool]:
    """Report which leaves contain non-finite values (the reference's
    ``check_none_parameters`` analogue)."""
    out: Dict[str, bool] = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)
        out[name] = bool(np.isfinite(np.asarray(leaf)).all())
    return out
