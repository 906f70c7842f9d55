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


def save_train_state(path: str, st: Any) -> None:
    """Full training-state checkpoint: every field of the algorithm state
    NamedTuple (params, optimizer state, env state, RNG key, global_step,
    SAC's log_alpha/buffer…) so training resumes exactly — the counterpart
    of the reference's SB3 zips that carry the optimizer
    (`PPO.py:418-431,433-572`)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    payload = {f: jax.device_get(getattr(st, f)) for f in st._fields}
    p = path if path.endswith(".pkl") else path + ".pkl"
    with open(p, "wb") as f:
        pickle.dump(payload, f)


def _compatible(saved: Any, tmpl: Any) -> bool:
    """Same pytree structure and leaf shapes/dtypes."""
    try:
        s_leaves, s_def = jax.tree_util.tree_flatten(saved)
        t_leaves, t_def = jax.tree_util.tree_flatten(tmpl)
    except Exception:
        return False
    if s_def != t_def or len(s_leaves) != len(t_leaves):
        return False
    for s, t in zip(s_leaves, t_leaves):
        s_shape = getattr(s, "shape", None)
        t_shape = getattr(t, "shape", None)
        if s_shape != t_shape:
            return False
    return True


def load_train_state(path: str, st_template: Any):
    """Restore a full training state saved by :func:`save_train_state`.

    Field-wise partial restore: fields whose pytree structure/shapes match
    the template are taken from the checkpoint; mismatching fields (e.g. the
    env state when loading into a differently-sized eval env — the reference
    load's space-conversion concern, `PPO.py:433-572`) keep the template
    value. Returns ``(state, skipped_field_names)``."""
    p = path if os.path.exists(path) else (
        path + ".pkl" if os.path.exists(path + ".pkl") else path
    )
    with open(p, "rb") as f:
        payload = pickle.load(f)
    if not isinstance(payload, dict) or not hasattr(st_template, "_fields"):
        raise ValueError(f"not a train-state checkpoint: {p}")
    updates, skipped = {}, []
    for field in st_template._fields:
        tmpl = getattr(st_template, field)
        if field in payload and _compatible(payload[field], tmpl):
            updates[field] = jax.tree_util.tree_map(
                lambda s, t: jnp_asarray_like(s, t), payload[field], tmpl
            )
        else:
            updates[field] = tmpl
            skipped.append(field)
    return type(st_template)(**updates), skipped


def jnp_asarray_like(saved: Any, tmpl: Any) -> Any:
    import jax.numpy as jnp

    if hasattr(tmpl, "dtype") and hasattr(saved, "dtype"):
        return jnp.asarray(saved, tmpl.dtype)
    return saved


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
