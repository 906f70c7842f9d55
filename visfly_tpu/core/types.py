"""Small value types shared across the framework.

Functional counterparts of the reference's ``utils/type.py`` (bound,
ACTION_TYPE, Uniform, Normal, PID) — here they are plain pytrees so they can
ride through ``jit``/``vmap``/``grad`` untouched.
"""
from __future__ import annotations

import enum
from typing import NamedTuple, Union

import jax.numpy as jnp
from jax import Array


class ActionType(enum.IntEnum):
    """Control modes (`utils/type.py:14-18`)."""

    THRUST = 0
    BODYRATE = 1
    VELOCITY = 2
    POSITION = 3


ACTION_TYPE_ALIAS = {
    "thrust": ActionType.THRUST,
    "bodyrate": ActionType.BODYRATE,
    "velocity": ActionType.VELOCITY,
    "position": ActionType.POSITION,
}


class Bound(NamedTuple):
    """Closed interval (`utils/type.py:8-11`)."""

    min: Union[float, Array]
    max: Union[float, Array]


class Uniform(NamedTuple):
    """Uniform distribution parameterised as mean ± half-range.

    ``sample`` matches the reference ``Uniform.generate``
    (`utils/type.py:37-38`): ``(U[0,1) - 0.5) * half + mean`` — i.e. the
    *full* width equals ``half`` (a reference quirk kept for parity).
    """

    mean: Array
    half: Array

    def sample(self, key, shape=()) -> Array:
        import jax

        u = jax.random.uniform(key, (*shape, *jnp.shape(jnp.asarray(self.mean))))
        return (u - 0.5) * self.half + self.mean


class Normal(NamedTuple):
    """Gaussian (`utils/type.py:41-58`)."""

    mean: Array
    std: Array

    def sample(self, key, shape=()) -> Array:
        import jax

        n = jax.random.normal(key, (*shape, *jnp.shape(jnp.asarray(self.mean))))
        return n * self.std + self.mean


class PID(NamedTuple):
    """Diagonal PID gains; stored as (3,) diagonals (reference keeps full 3×3
    diagonal matrices, `utils/type.py:61-85`; only the diagonal is ever
    non-zero in the shipped drone configs)."""

    p: Array
    i: Array
    d: Array
