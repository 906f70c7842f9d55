"""Navigation task — fly to a target through (cluttered) space.

Parity target: `/root/reference/envs/NavigationEnv.py`.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
from jax import Array

from ..core.math_utils import safe_norm

from ..core import quaternion as quat
from ..dynamics import dynamics as dyn_mod
from .base import DroneGymEnv, EnvState


def get_along_vertical_vector(base: Array, obj: Array) -> Tuple[Array, Array, Array]:
    """Decompose ``obj`` into components along/perpendicular-to ``base``
    (`NavigationEnv.py:16-24`). Returns (along, vertical_norm, base_norm)."""
    base_norm = safe_norm(base, axis=1, keepdims=True)
    base_normal = base / (base_norm + 1e-8)
    along = jnp.sum(obj * base_normal, axis=1, keepdims=True)
    vertical = obj - base_normal * along
    return along.squeeze(-1), safe_norm(vertical, axis=1), base_norm.squeeze(-1)


class NavigationEnv(DroneGymEnv):
    """Depth+state+target navigation (`NavigationEnv.py:27-99`)."""

    def __init__(self, *args, target: Optional[Array] = None,
                 max_episode_steps: int = 256,
                 indiv_reward: bool = False, **kwargs):
        super().__init__(*args, max_episode_steps=max_episode_steps, **kwargs)
        t = jnp.asarray([9.0, 0.0, 1.0] if target is None else target, self.dtype)
        self.target = jnp.tile(t.reshape(1, -1), (self.num_envs, 1))
        self.success_radius = 0.5
        # per-term reward telemetry: return the reward as a dict so the base
        # env logs each component into info["extra_*"] — the reference's
        # `_indiv_rewards` episode accounting (`droneGymEnv.py:177-185`)
        self.indiv_reward = indiv_reward

    def get_observation(self, state: EnvState, sensor_obs) -> Dict[str, Array]:
        obs = {"state": self.state_obs(state), "target": self.target}
        if "depth" in sensor_obs:
            obs["depth"] = sensor_obs["depth"]
        return obs

    def get_success(self, state: EnvState) -> Array:
        d = safe_norm(state.dyn.pos - self.target, axis=-1)
        return d <= self.success_radius

    def get_reward(self, state: EnvState):
        """Approach-velocity + view-cone + collision-potential shaping with a
        remaining-steps success bonus (`NavigationEnv.py:85-99`)."""
        pos = state.dyn.pos
        vel = dyn_mod.velocity(state.dyn)
        omega = state.dyn.omega
        direction = dyn_mod.direction(state.dyn)
        to_target = self.target - pos
        dis = safe_norm(to_target, axis=-1)
        col_dis = state.collision.dis
        col_vec = state.collision.vector
        thrd_perce = jnp.pi / 18
        q_ref = jnp.asarray([1.0, 0.0, 0.0, 0.0], self.dtype)
        vel_norm = safe_norm(vel, axis=-1)

        approach = jnp.clip(
            jnp.sum(vel * to_target, axis=-1) / (1e-6 + dis), None, 10.0
        )
        view_cos = jnp.clip(
            jnp.sum(direction * vel, axis=-1) / (1e-6 + vel_norm), -1.0, 1.0
        )
        view_pen = jnp.maximum(jnp.arccos(view_cos), thrd_perce) - thrd_perce
        col_closing = jnp.maximum(
            jnp.sum(col_vec * vel, axis=-1) / (1e-6 + col_dis), 0.0
        )

        terms = {
            "approach": approach * 0.01,
            "view": view_pen * -0.01,
            "upright": safe_norm(state.dyn.q - q_ref, axis=-1) * -0.00001,
            "vel": vel_norm * -0.002,
            "omega": safe_norm(omega, axis=-1) * -0.002,
            "col_dis": 1.0 / (col_dis + 0.2) * -0.01,
            "col_closing": (
                jnp.maximum(1.0 - col_dis, 0.0) * col_closing * -0.005
            ),
            "success": state.success
            * (self.max_episode_steps - state.step_count)
            * 0.1
            * (0.2 + 0.8 / (1.0 + vel_norm)),
        }
        total = sum(terms.values())
        if self.indiv_reward:
            return {"reward": total, **terms}
        return total


class NavigationEnv2(DroneGymEnv):
    """Relative-state navigation with collision_vector observation and an
    analytic-reward variant for APG (`NavigationEnv.py:102-273`)."""

    def __init__(self, *args, target: Optional[Array] = None,
                 max_episode_steps: int = 256, **kwargs):
        super().__init__(*args, max_episode_steps=max_episode_steps, **kwargs)
        t = jnp.asarray([14.0, 0.0, 1.0] if target is None else target, self.dtype)
        self.target = jnp.tile(t.reshape(1, -1), (self.num_envs, 1))
        self.success_radius = 0.5

    def default_random_kwargs(self) -> dict:
        return {
            "state_generator": {
                "class": "Uniform",
                "kwargs": [
                    {"position": {"mean": [9.0, 0.0, 1.5], "half": [8.0, 6.0, 1.0]}}
                ],
            }
        }

    def get_success(self, state: EnvState) -> Array:
        d = safe_norm(state.dyn.pos - self.target, axis=-1)
        return d <= self.success_radius

    def get_failure(self, state: EnvState) -> Array:
        return state.collision.is_collision

    def get_observation(self, state: EnvState, sensor_obs) -> Dict[str, Array]:
        s = self.state_obs(state)
        pos, q, vel, omega = s[:, :3], s[:, 3:7], s[:, 7:10], s[:, 10:13]
        obs = {
            "state": jnp.concatenate(
                [self.target - pos, q, vel, omega], axis=-1
            ),
            "collision_vector": state.collision.vector,
        }
        if "depth" in sensor_obs:
            obs["depth"] = jnp.clip(sensor_obs["depth"] / 10.0, None, 1.0)
        return obs

    def get_reward(self, state: EnvState) -> Array:
        """Final shaping actually used by the reference: target-approach
        speed + ω penalty + success bonus (`NavigationEnv.py:220-229`)."""
        vel = dyn_mod.velocity(state.dyn)
        to_target = self.target - state.dyn.pos
        approach, away, _dis = get_along_vertical_vector(to_target, vel)
        r_target_spd = (approach - away) * 0.02
        r_omega = safe_norm(state.dyn.omega, axis=-1) * -0.001
        r_success = state.success * 1.0
        return r_target_spd + r_omega + r_success

    def get_analytical_reward(self, state: EnvState) -> Array:
        """Differentiable APG reward (`NavigationEnv.py:242-273`)."""
        vel = dyn_mod.velocity(state.dyn)
        direction = dyn_mod.direction(state.dyn)
        thrd_perce = jnp.pi / 18
        approach, away, _ = get_along_vertical_vector(
            self.target - state.dyn.pos, vel
        )
        obs_approach, _obs_away, col_dis = get_along_vertical_vector(
            state.collision.vector, vel
        )
        obstacle_spd_r = obs_approach * -0.1 * jnp.maximum(1.0 - col_dis, 0.0)
        obstacle_dis_r = 1.0 / (col_dis + 0.03) * -0.02
        target_spd_r = (approach - away) * 0.02
        vel_norm = safe_norm(vel, axis=-1)
        view_cos = jnp.clip(
            jnp.sum(direction * vel, axis=-1) / (1e-6 + vel_norm), -1.0, 1.0
        )
        view_aware_r = (
            jnp.maximum(jnp.arccos(view_cos) - thrd_perce, 0.0) * -0.01
        )
        return (
            obstacle_spd_r
            + target_spd_r
            + view_aware_r
            + obstacle_dis_r
            + safe_norm(state.dyn.omega, axis=-1) * -0.01
            + state.collision.is_collision * -2.0
            + state.success * 5.0
        )
