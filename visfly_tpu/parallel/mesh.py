"""Multi-chip scale-out: shard the scenes×agents axis over a device mesh.

The reference is strictly single-process (SURVEY §2.3 — no distributed
machinery at all); here data parallelism over agents is a first-class,
TPU-native component: env state arrays shard over the ``env`` mesh axis,
policy/optimizer pytrees replicate, and XLA inserts the gradient psum over
ICI automatically under ``jit`` with sharding annotations (the pjit recipe —
pick a mesh, annotate shardings, let the compiler place collectives).

Works identically on a real TPU pod slice and on the virtual
``--xla_force_host_platform_device_count`` CPU mesh used in tests/dryruns.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "env") -> Mesh:
    devices = jax.devices()
    n = len(devices) if n_devices is None else n_devices
    return Mesh(np.asarray(devices[:n]), (axis_name,))


def shard_batch_pytree(tree: Any, mesh: Mesh, batch_size: int,
                       axis_name: str = "env") -> Any:
    """Place a pytree so that, in every leaf, the first axis whose length is
    ``batch_size`` is sharded over the mesh and everything else replicates.

    Handles the env-state layout: (N, …) state arrays, the (K, N, 4)
    comm-delay FIFO (axis 1), per-scene scalars (replicated)."""

    def place(x):
        if not hasattr(x, "shape"):
            return x
        spec = [None] * x.ndim
        for axis, dim in enumerate(x.shape):
            if dim == batch_size and dim % mesh.shape[axis_name] == 0:
                spec[axis] = axis_name
                break
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(place, tree)


def replicate_pytree(tree: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") else x, tree
    )


def shard_train_state(st: Any, mesh: Mesh, num_agent: int,
                      env_fields: Sequence[str] = ("env_state", "obs"),
                      axis_name: str = "env") -> Any:
    """Shard an algorithm state (BPTTState/SHACState/PPOState/…): env-derived
    fields over the batch axis, parameters/optimizer replicated."""
    updates = {}
    for field in st._fields:
        val = getattr(st, field)
        if field in env_fields:
            updates[field] = shard_batch_pytree(val, mesh, num_agent, axis_name)
        else:
            updates[field] = replicate_pytree(val, mesh)
    return type(st)(**updates)
