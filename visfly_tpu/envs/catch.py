"""Catch task — intercept a free-falling ball.

Parity target: `/root/reference/envs/CatchEnv.py` (a skeleton in the
reference: obs/reward/success are ``pass``). Here the analytic-ballistics
``ball`` (`CatchEnv.py:12-49`) is implemented as aux state, and minimal
observation/reward hooks are provided so the env is actually trainable.
"""
from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from ..core.math_utils import safe_norm
from ..dynamics import dynamics as dyn_mod
from .base import DroneGymEnv, EnvState

G = jnp.asarray([0.0, 0.0, -9.8])  # (`CatchEnv.py:9`)


class BallState(NamedTuple):
    pos: Array  # (N, 3)
    vel: Array  # (N, 3)
    grounded: Array  # (N,) bool — z < 0.1 (`CatchEnv.py:49`)


class CatchEnv(DroneGymEnv):
    ball_dt = 0.2  # (`CatchEnv.py:16`)

    def __init__(self, *args, max_episode_steps: int = 256, **kwargs):
        kwargs.setdefault("visual", False)
        super().__init__(*args, max_episode_steps=max_episode_steps, **kwargs)
        self.catch_radius = 0.3

    def default_random_kwargs(self) -> dict:
        return {
            "state_generator": {
                "class": "Uniform",
                "kwargs": [
                    {"position": {"mean": [1.0, 0.0, 1.5], "half": [1.0, 2.0, 1.0]}}
                ],
            }
        }

    def _sample_ball(self, key, n):
        """Ball spawn distribution (`CatchEnv.py:19-24`)."""
        k1, k2 = jax.random.split(key)
        pos = (2 * jax.random.uniform(k1, (n, 3)) - 1) * jnp.asarray(
            [0.0, 2.0, 1.0]
        ) + jnp.asarray([1.0, 0.0, 1.5])
        vel = (2 * jax.random.uniform(k2, (n, 3)) - 1) * jnp.asarray([1.0, 1.0, 0.0])
        return pos, vel

    def init_aux(self, key):
        pos, vel = self._sample_ball(key, self.num_agent)
        return BallState(pos=pos, vel=vel,
                         grounded=jnp.zeros((self.num_agent,), bool))

    def reset_aux(self, state: EnvState, mask: Array):
        aux: BallState = state.aux
        pos, vel = self._sample_ball(jax.random.fold_in(state.key, 13), self.num_agent)
        m = mask[:, None]
        return BallState(
            pos=jnp.where(m, pos, aux.pos),
            vel=jnp.where(m, vel, aux.vel),
            grounded=jnp.where(mask, False, aux.grounded),
        )

    def step_aux(self, aux: BallState, dyn):
        """Ballistic update at ball_dt granularity per env step
        (`CatchEnv.py:46-49`)."""
        pos = aux.pos + aux.vel * self.ball_dt
        vel = aux.vel + G * self.ball_dt
        return BallState(pos=pos, vel=vel, grounded=pos[:, 2] < 0.1)

    def get_observation(self, state: EnvState, sensor_obs) -> Dict[str, Array]:
        ball: BallState = state.aux
        return {
            "state": self.state_obs(state),
            "ball": jnp.concatenate([ball.pos - state.dyn.pos, ball.vel], axis=-1),
        }

    def get_success(self, state: EnvState) -> Array:
        ball: BallState = state.aux
        return safe_norm(ball.pos - state.dyn.pos, axis=-1) <= self.catch_radius

    def get_failure(self, state: EnvState) -> Array:
        return state.aux.grounded

    def get_reward(self, state: EnvState) -> Array:
        ball: BallState = state.aux
        to_ball = ball.pos - state.dyn.pos
        dis = safe_norm(to_ball, axis=-1)
        vel = dyn_mod.velocity(state.dyn)
        approach = jnp.sum(vel * to_ball, -1) / (1e-6 + dis)
        return (
            jnp.clip(approach, None, 10.0) * 0.01
            + safe_norm(state.dyn.omega, axis=-1) * -0.002
            + state.success * 10.0
        )
