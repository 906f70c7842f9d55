"""Hover amid moving obstacles (FPS-benchmark env).

Parity target: `/root/reference/envs/DynamicEnv.py` — hover-style reward at
the origin with dynamic objects supplied through
``scene_kwargs["obj_settings"]``.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from jax import Array

from ..core.math_utils import safe_norm
from ..dynamics import dynamics as dyn_mod
from .base import DroneGymEnv, EnvState


class DynEnv(DroneGymEnv):
    def get_observation(self, state: EnvState, sensor_obs) -> Dict[str, Array]:
        obs = {"state": self.state_obs(state)}
        if "depth" in sensor_obs:
            obs["depth"] = sensor_obs["depth"]
        return obs

    def get_reward(self, state: EnvState) -> Array:
        """`DynamicEnv.py:70-81`."""
        q_ref = jnp.asarray([1.0, 0.0, 0.0, 0.0], self.dtype)
        return (
            0.1
            + safe_norm(state.dyn.pos, axis=-1) * (-0.1 / 9)
            + safe_norm(state.dyn.q - q_ref, axis=-1) * -0.00001
            + safe_norm(dyn_mod.velocity(state.dyn), axis=-1) * -0.002
            + safe_norm(state.dyn.omega, axis=-1) * -0.002
        )
