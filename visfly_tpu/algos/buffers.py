"""Device-resident replay buffer.

TPU-native counterpart of the reference tensorised replay buffers
(`/root/reference/utils/algorithms/common.py:713-890`): a preallocated
pytree ring buffer that lives in HBM; inserts and samples are pure functions
(jit-able), so off-policy training never round-trips to the host.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
from jax import Array


class ReplayBuffer(NamedTuple):
    obs: Any  # pytree of (C, ...) arrays
    next_obs: Any
    actions: Array  # (C, A)
    rewards: Array  # (C,)
    dones: Array  # (C,) bool (terminal, not timeout — SB3 convention)
    pos: Array  # () int32 next write index
    full: Array  # () bool
    full_states: Any = ()  # (C, 22) dynamics states (FullDictReplayBuffer,
    # `common.py:713-890` — enables env resets from the buffer)


def create(capacity: int, obs_example: Dict[str, Array], action_dim: int,
           store_full_state: bool = False) -> ReplayBuffer:
    def alloc(x):
        return jnp.zeros((capacity,) + x.shape[1:], x.dtype)

    return ReplayBuffer(
        obs=jax.tree_util.tree_map(alloc, obs_example),
        next_obs=jax.tree_util.tree_map(alloc, obs_example),
        actions=jnp.zeros((capacity, action_dim)),
        rewards=jnp.zeros((capacity,)),
        dones=jnp.zeros((capacity,), bool),
        pos=jnp.asarray(0, jnp.int32),
        full=jnp.asarray(False),
        full_states=jnp.zeros((capacity, 22)) if store_full_state else (),
    )


def insert(buf: ReplayBuffer, obs, next_obs, action, reward, done,
           full_state=None) -> ReplayBuffer:
    """Insert a batch of N transitions at the ring position."""
    n = reward.shape[0]
    capacity = buf.rewards.shape[0]
    idx = (buf.pos + jnp.arange(n)) % capacity

    def put(store, x):
        return store.at[idx].set(x)

    full_states = buf.full_states
    if full_state is not None and not isinstance(full_states, tuple):
        full_states = put(full_states, full_state)

    return ReplayBuffer(
        obs=jax.tree_util.tree_map(put, buf.obs, obs),
        next_obs=jax.tree_util.tree_map(put, buf.next_obs, next_obs),
        actions=put(buf.actions, action),
        rewards=put(buf.rewards, reward),
        dones=put(buf.dones, done),
        pos=(buf.pos + n) % capacity,
        full=buf.full | (buf.pos + n >= capacity),
        full_states=full_states,
    )


def sample_full_states(buf: ReplayBuffer, key: Array, n: int) -> Array:
    """Sample stored dynamics states for reset-from-buffer
    (`droneGymEnv.py:343-345`)."""
    capacity = buf.rewards.shape[0]
    upper = jnp.where(buf.full, capacity, buf.pos)
    idx = jax.random.randint(key, (n,), 0, jnp.maximum(upper, 1))
    return buf.full_states[idx]


def sample(buf: ReplayBuffer, key: Array, batch_size: int):
    capacity = buf.rewards.shape[0]
    upper = jnp.where(buf.full, capacity, buf.pos)
    idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(upper, 1))

    def take(x):
        return x[idx]

    return (
        jax.tree_util.tree_map(take, buf.obs),
        jax.tree_util.tree_map(take, buf.next_obs),
        buf.actions[idx],
        buf.rewards[idx],
        buf.dones[idx],
    )


def size(buf: ReplayBuffer) -> Array:
    capacity = buf.rewards.shape[0]
    return jnp.where(buf.full, capacity, buf.pos)
