"""Tracking task — follow a circular reference trajectory.

Parity target: `/root/reference/envs/TrackingEnv.py`. The waypoint table is
a pure function of the dynamics clock ``t`` (which the env randomises per
reset — the random hover phase, `dynamics.py:256` — so agents start at
random points on the circle).
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from jax import Array

from ..core.math_utils import safe_norm
from .base import DroneGymEnv, EnvState


class TrackEnv(DroneGymEnv):
    """Circle of radius 2 about (2,0,1); obs = next 10 waypoints relative
    (`TrackingEnv.py:32-99`)."""

    def __init__(self, *args, random_kwargs=None, max_episode_steps: int = 256,
                 **kwargs):
        self.center = jnp.asarray([2.0, 0.0, 1.0])
        self.next_points_num = 10
        self.radius = 2.0
        self.waypoint_dt = 0.1
        self.radius_spd = 0.2 * jnp.pi
        random_kwargs = random_kwargs or {
            "state_generator": {
                "class": "Uniform",
                "kwargs": [
                    {"position": {"mean": [2.0, 0.0, 1.0], "half": [0.2, 0.2, 0.2]}}
                ],
            }
        }
        super().__init__(*args, random_kwargs=random_kwargs,
                         max_episode_steps=max_episode_steps, **kwargs)
        self.success_radius = 0.5

    def waypoints(self, t: Array) -> Array:
        """(N, next_points_num, 3) circle samples (`TrackingEnv.py:74-80`)."""
        ts = t[:, None] + jnp.arange(self.next_points_num) * self.waypoint_dt
        ang = self.radius_spd * ts
        return jnp.stack(
            [
                self.radius * jnp.cos(ang) + self.center[0],
                self.radius * jnp.sin(ang) + self.center[1],
                jnp.zeros_like(ang) + self.center[2],
            ],
            axis=-1,
        )

    def get_observation(self, state: EnvState, sensor_obs) -> Dict[str, Array]:
        s = self.state_obs(state)
        target = self.waypoints(state.dyn.t)
        diff = (target - state.dyn.pos[:, None, :]).reshape(self.num_envs, -1)
        obs = {
            "state": jnp.concatenate(
                [
                    diff / self.max_sense_radius,
                    s[:, 3:7],
                    s[:, 7:10] / 10.0,
                    s[:, 10:13] / 10.0,
                ],
                axis=-1,
            )
        }
        if "depth" in sensor_obs:
            obs["depth"] = jnp.clip(sensor_obs["depth"] / 10.0, None, 1.0)
        return obs

    def get_reward(self, state: EnvState) -> Array:
        """Hover-style shaping toward the current waypoint
        (`TrackingEnv.py:105-116`)."""
        target0 = self.waypoints(state.dyn.t)[:, 0, :]
        q_ref = jnp.asarray([1.0, 0.0, 0.0, 0.0], self.dtype)
        from ..dynamics import dynamics as dyn_mod

        return (
            0.1
            + safe_norm(state.dyn.pos - target0, axis=-1) * (-0.1 / 9)
            + safe_norm(state.dyn.q - q_ref, axis=-1) * -0.00001
            + safe_norm(dyn_mod.velocity(state.dyn), axis=-1) * -0.002
            + safe_norm(state.dyn.omega, axis=-1) * -0.002
        )


class TrackEnv2(TrackEnv):
    """Adds a 64×64 depth sensor (`TrackingEnv.py:119-178`)."""

    def __init__(self, *args, sensor_kwargs=None, **kwargs):
        sensor_kwargs = [
            {"sensor_type": "depth", "uuid": "depth", "resolution": [64, 64]}
        ]
        super().__init__(*args, sensor_kwargs=sensor_kwargs, **kwargs)
