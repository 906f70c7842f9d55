"""Landing task — land on a visual pad.

Parity target: `/root/reference/envs/LandingEnv.py`. LandingEnv uses a
downward COLOR camera whose thresholded centre-of-mass locates the pad
(`LandingEnv.py:69-91`); LandingEnv2 is the state-only variant with
exponential descent shaping (`LandingEnv.py:121-206`).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np
from jax import Array

from ..core.math_utils import safe_norm
from ..dynamics import dynamics as dyn_mod
from .base import DroneGymEnv, EnvState


class LandingAux(NamedTuple):
    centers: Array  # (N, 2) pad centre in normalised image coords
    seen: Array  # (N,) bool — pad observed at least once this episode


def image_center_of_mass(mask: Array) -> Array:
    """Batched centre of mass of boolean images (N, H, W) → (N, 2) in pixel
    coordinates (row, col); NaN-free: rows with empty masks return -1e9 as a
    sentinel handled by the caller (scipy's center_of_mass returns NaN,
    `LandingEnv.py:75`)."""
    n, h, w = mask.shape
    m = mask.astype(jnp.float32)
    total = m.sum(axis=(1, 2))
    rows = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    cols = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    r = (m * rows).sum(axis=(1, 2)) / jnp.maximum(total, 1e-9)
    c = (m * cols).sum(axis=(1, 2)) / jnp.maximum(total, 1e-9)
    com = jnp.stack([r, c], axis=-1)
    return jnp.where(total[:, None] > 0, com, -1e9)


class LandingEnv(DroneGymEnv):
    """Downward color camera; pad tracked via thresholded image COM."""

    def __init__(self, *args, target: Optional[Array] = None,
                 random_kwargs=None, sensor_kwargs=None, scene_kwargs=None,
                 max_episode_steps: int = 128, **kwargs):
        sensor_kwargs = [
            {
                "sensor_type": "color",
                "uuid": "color",
                "resolution": [64, 64],
                # downward camera (`LandingEnv.py:34`; in our ENU/zyx frame
                # pitch +π/2 tilts the body-x forward axis to −z)
                "orientation": [0.0, np.pi / 2, 0.0],
            }
        ]
        random_kwargs = random_kwargs or {
            "state_generator": {
                "class": "Uniform",
                "kwargs": [
                    {"position": {"mean": [2.0, 0.0, 2.5], "half": [1.0, 1.0, 1.0]}}
                ],
            }
        }
        scene_kwargs = dict(scene_kwargs or {})
        scene_kwargs.setdefault("path", "garage_landing")
        kwargs.setdefault("visual", True)
        super().__init__(*args, random_kwargs=random_kwargs,
                         sensor_kwargs=sensor_kwargs, scene_kwargs=scene_kwargs,
                         max_episode_steps=max_episode_steps, **kwargs)
        self.target = jnp.asarray([2.0, 0.0, 0.0] if target is None else target,
                                  self.dtype)
        self.success_radius = 0.5
        self.resolution = 64

    def init_aux(self, key):
        n = self.num_agent
        return LandingAux(centers=jnp.zeros((n, 2), self.dtype),
                          seen=jnp.zeros((n,), bool))

    def reset_aux(self, state: EnvState, mask: Array):
        aux: LandingAux = state.aux
        return LandingAux(
            centers=jnp.where(mask[:, None], 0.0, aux.centers),
            seen=jnp.where(mask, False, aux.seen),
        )

    needs_sensors_for_reward = True

    def update_aux_from_sensors(self, state: EnvState, sensor_obs) -> EnvState:
        """Pad centre = COM of dark pixels; keep previous centre when the pad
        leaves the view (`LandingEnv.py:73-79`)."""
        if "color" not in sensor_obs:
            return state
        color = sensor_obs["color"]  # (N, 3, H, W)
        two_value = color.astype(jnp.float32).mean(axis=1) < 70
        com = image_center_of_mass(two_value) / self.resolution - 0.5
        valid = com[:, 0] > -1e6
        centers = jnp.where(valid[:, None], com, state.aux.centers)
        return state._replace(
            aux=LandingAux(centers=centers, seen=state.aux.seen | valid)
        )

    def get_failure(self, state: EnvState) -> Array:
        """Pad never in view since reset — the reference fails on a NaN COM
        with no previous centre to fall back on (`LandingEnv.py:65-67,74-79`)."""
        return ~state.aux.seen

    def get_observation(self, state: EnvState, sensor_obs) -> Dict[str, Array]:
        obs = {"state": self.state_obs(state), "target": state.aux.centers}
        if "color" in sensor_obs:
            obs["color"] = sensor_obs["color"]
        return obs

    def get_success(self, state: EnvState) -> Array:
        """Low altitude + within pad + slow (`LandingEnv.py:94-100`)."""
        pos = state.dyn.pos
        vel = dyn_mod.velocity(state.dyn)
        landing_half = 0.3
        within = (
            jnp.all(pos[:, :2] < self.target[:2] + landing_half, axis=-1)
            & jnp.all(pos[:, :2] > self.target[:2] - landing_half, axis=-1)
        )
        return (pos[:, 2] <= 0.2) & within & (safe_norm(vel, axis=-1) <= 0.3)

    def get_reward(self, state: EnvState) -> Array:
        """Center-tracking + descent shaping (`LandingEnv.py:105-118`)."""
        centers = state.aux.centers
        pos = state.dyn.pos
        vel = dyn_mod.velocity(state.dyn)
        vel_norm = safe_norm(vel, axis=-1)
        # reference penalises |(q_w, q_x)| (`LandingEnv.py:112` indexes
        # orientation columns [0, 1]) — replicated verbatim for parity
        ori_xy = safe_norm(state.dyn.q[:, 0:2], axis=-1)
        return (
            0.2 * jnp.clip(1.25 - safe_norm(centers, axis=-1), None, 1.0)
            + ori_xy * -0.2
            + 0.1 * jnp.clip(3.0 - pos[:, 2], 0.0, 3.0) / 3.0 * 2.0
            + -0.02 * vel_norm
            + -0.01 * safe_norm(state.dyn.omega, axis=-1)
            + 0.1 * 20 * state.success
            * (10 + (self.max_episode_steps - state.step_count))
            / (1 + 2 * vel_norm)
        )


class LandingEnv2(DroneGymEnv):
    """State-only landing with exponential-shaped descent/xy rewards
    (`LandingEnv.py:121-206`)."""

    def __init__(self, *args, target: Optional[Array] = None,
                 random_kwargs=None, max_episode_steps: int = 128,
                 is_eval: bool = False, **kwargs):
        random_kwargs = random_kwargs or {
            "state_generator": {
                "class": "Uniform",
                "kwargs": [
                    {"position": {"mean": [2.0, 0.0, 2.5], "half": [1.0, 1.0, 1.0]}}
                ],
            }
        }
        kwargs.setdefault("visual", False)
        super().__init__(*args, random_kwargs=random_kwargs,
                         max_episode_steps=max_episode_steps, **kwargs)
        t = jnp.asarray([2.0, 0.0, 2.5] if target is None else target, self.dtype)
        self.target = jnp.tile(t.reshape(1, -1), (self.num_envs, 1))
        self.success_radius = 0.5

    def get_failure(self, state: EnvState) -> Array:
        return state.collision.is_collision

    def get_success(self, state: EnvState) -> Array:
        pos = state.dyn.pos
        vel = dyn_mod.velocity(state.dyn)
        landing_half = 0.3
        within = (
            jnp.all(pos[:, :2] < self.target[:, :2] + landing_half, axis=-1)
            & jnp.all(pos[:, :2] > self.target[:, :2] - landing_half, axis=-1)
        )
        return (pos[:, 2] <= 0.2) & within & (safe_norm(vel, axis=-1) <= 0.3)

    def get_observation(self, state: EnvState, sensor_obs) -> Dict[str, Array]:
        s = self.state_obs(state)
        return {
            "state": jnp.concatenate(
                [
                    (self.target - s[:, :3]) / self.max_sense_radius,
                    s[:, 3:7],
                    s[:, 7:10] / 10.0,
                    s[:, 10:13] / 10.0,
                ],
                axis=-1,
            )
        }

    def get_reward(self, state: EnvState) -> Array:
        """Exponential descent-rate + xy-approach shaping
        (`LandingEnv.py:163-191`)."""
        import jax

        eta = 1.2
        pos = state.dyn.pos
        vel = dyn_mod.velocity(state.dyn)
        v_l = jax.lax.stop_gradient(jnp.clip(pos[:, 2], 0.05, 1.0))
        descent_v = -vel[:, 2]
        r_z_first = descent_v <= v_l
        r_z = (
            ~r_z_first * (eta ** (-4 * descent_v / v_l + 5) - 1) / (eta - 1) * 0.1
            + r_z_first * (eta ** (descent_v / v_l) - 1) / (eta - 1) * 0.1
        )
        rho = 1.2
        d_s = jax.lax.stop_gradient(2.0 * jnp.clip(pos[:, 2], 0.05, 1.0))
        d_xy = safe_norm((self.target - pos)[:, :2], axis=-1)
        r_xy = (rho ** (1 - d_xy / d_s) - 1) / (rho - 1) * 0.1
        r_l = state.success * 20.0 + state.failure * -0.1
        return r_l + r_xy + r_z
