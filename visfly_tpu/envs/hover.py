"""Hover task — stay at a fixed target point.

Parity target: `/root/reference/envs/HoverEnv.py`.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
from jax import Array

from ..core.math_utils import safe_norm

from ..dynamics import dynamics as dyn_mod
from .base import DroneGymEnv, EnvState


class HoverEnv(DroneGymEnv):
    """Reward shaping per `HoverEnv.py:83-94`; default spawn box per
    `HoverEnv.py:32-41`; success is always False (episodes run to timeout,
    `HoverEnv.py:79-81`)."""

    def __init__(self, *args, target: Optional[Array] = None,
                 max_episode_steps: int = 256, **kwargs):
        kwargs.setdefault("visual", False)
        super().__init__(*args, max_episode_steps=max_episode_steps, **kwargs)
        t = jnp.asarray([1.0, 0.0, 1.5] if target is None else target, self.dtype)
        self.target = jnp.tile(t.reshape(1, -1), (self.num_envs, 1))
        self.success_radius = 0.5

    def default_random_kwargs(self) -> dict:
        return {
            "state_generator": {
                "class": "Uniform",
                "kwargs": [
                    {"position": {"mean": [1.0, 0.0, 1.5], "half": [1.0, 1.0, 0.5]}}
                ],
            }
        }

    def get_observation(self, state: EnvState, sensor_obs) -> Dict[str, Array]:
        return {"state": self.state_obs(state)}

    def get_reward(self, state: EnvState) -> Array:
        pos = state.dyn.pos
        vel = dyn_mod.velocity(state.dyn)
        q = state.dyn.q
        omega = state.dyn.omega
        base_r = 0.1
        pos_factor = -0.1 * 1.0 / 9
        q_ref = jnp.asarray([1.0, 0.0, 0.0, 0.0], self.dtype)
        return (
            base_r
            + safe_norm(pos - self.target, axis=-1) * pos_factor
            + safe_norm(q - q_ref, axis=-1) * -0.00001
            + safe_norm(vel, axis=-1) * -0.002
            + safe_norm(omega, axis=-1) * -0.002
        )


class HoverEnv2(HoverEnv):
    """Normalised relative-state observation variant with a 64×64 depth
    sensor (`HoverEnv.py:97-152`)."""

    def __init__(self, *args, sensor_kwargs=None, **kwargs):
        sensor_kwargs = [
            {"sensor_type": "depth", "uuid": "depth", "resolution": [64, 64]}
        ]
        super().__init__(*args, sensor_kwargs=sensor_kwargs, **kwargs)

    def get_observation(self, state: EnvState, sensor_obs) -> Dict[str, Array]:
        s = self.state_obs(state)
        pos, q, vel, omega = s[:, :3], s[:, 3:7], s[:, 7:10], s[:, 10:13]
        obs = {
            "state": jnp.concatenate(
                [(self.target - pos) / 10.0, q, vel / 10.0, omega / 10.0], axis=-1
            )
        }
        # the reference declares the depth sensor but comments it out of the
        # observation (`HoverEnv.py:151`); we expose it when rendering is on.
        if "depth" in sensor_obs:
            obs["depth"] = jnp.clip(sensor_obs["depth"] / 10.0, None, 1.0)
        return obs
