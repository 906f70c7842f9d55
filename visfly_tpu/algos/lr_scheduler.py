"""Learning-rate schedules.

Counterpart of `/root/reference/utils/algorithms/lr_scheduler.py:4-91`
(linear / exponential / cosine + dict-config dispatcher), expressed as optax
schedules (step-indexed callables usable with ``optax.adam(sched)``).
"""
from __future__ import annotations

from typing import Any, Callable, Union

import optax


def linear_schedule(initial: float, final: float = 0.0, total_steps: int = 1):
    return optax.linear_schedule(initial, final, total_steps)


def exponential_schedule(initial: float, decay_rate: float = 0.99,
                         transition_steps: int = 1000):
    return optax.exponential_decay(initial, transition_steps, decay_rate)


def cosine_schedule(initial: float, total_steps: int = 1, final_scale: float = 0.0):
    return optax.cosine_decay_schedule(initial, total_steps, alpha=final_scale)


def transfer_schedule(cfg: Union[float, dict, Callable]) -> Any:
    """Dict-config dispatcher (`lr_scheduler.py:60-91`): a float is constant,
    a dict {"class": "linear"|"exponential"|"cosine", "kwargs": {…}} builds
    the schedule, a callable passes through."""
    if callable(cfg):
        return cfg
    if isinstance(cfg, (int, float)):
        return float(cfg)
    cls = cfg["class"].lower()
    kw = cfg.get("kwargs", {})
    if cls in ("linear",):
        return linear_schedule(**kw)
    if cls in ("exponential", "exp"):
        return exponential_schedule(**kw)
    if cls in ("cosine",):
        return cosine_schedule(**kw)
    raise ValueError(f"unknown schedule {cls!r}")
