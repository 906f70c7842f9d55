"""Racing task — cyclic gate sequence.

Parity target: `/root/reference/envs/RacingEnv.py`. The reference mutates
the per-agent gate index inside ``get_success`` (`RacingEnv.py:142-148`);
here gate progression is explicit aux state advanced in ``step_aux``.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax.numpy as jnp
from jax import Array

from ..core.math_utils import safe_norm
from ..dynamics import DynState
from ..dynamics import dynamics as dyn_mod
from .base import DroneGymEnv, EnvState


class RacingAux(NamedTuple):
    next_target_i: Array  # (N,) int32 — index of the next gate
    past_targets: Array  # (N,) int32 — gates passed this episode
    is_pass_next: Array  # (N,) bool — passed a gate THIS step


DEFAULT_RACING_RANDOM = {
    "state_generator": {
        "class": "Union",
        "kwargs": [
            {
                "randomizers_kwargs": [
                    {"class": "Uniform", "kwargs": {"position": {"mean": [2.0, 2.0, 1.0], "half": [0.2, 0.2, 0.2]}}},
                    {"class": "Uniform", "kwargs": {"position": {"mean": [6.0, 2.0, 1.5], "half": [0.2, 0.2, 0.2]}}},
                    {"class": "Uniform", "kwargs": {"position": {"mean": [6.0, -2.0, 1.5], "half": [0.2, 0.2, 0.2]}}},
                    {"class": "Uniform", "kwargs": {"position": {"mean": [2.0, 0.0, 1.0], "half": [0.2, 0.2, 0.2]}}},
                ]
            }
        ],
    }
}


class RacingEnv(DroneGymEnv):
    """4 cyclic gates at (`RacingEnv.py:87-93`); quadrant-based initial gate
    choice (`:172-185`); pass bonus ``success_r`` (`:203-215`, the
    is_pos_reward branch the reference ships enabled)."""

    def __init__(self, *args, random_kwargs: Optional[dict] = None,
                 max_episode_steps: int = 256, **kwargs):
        random_kwargs = DEFAULT_RACING_RANDOM if not random_kwargs else random_kwargs
        super().__init__(*args, random_kwargs=random_kwargs,
                         max_episode_steps=max_episode_steps, **kwargs)
        self.targets = jnp.asarray(
            [[4.0, 4.0, 1.0], [8.0, 0.0, 2.0], [5.0, -4.0, 1.0], [1.0, -1.0, 1.0]],
            self.dtype,
        )
        self.next_target_num = 2
        self.success_radius = 0.3
        self.success_r = 20.0  # is_pos_reward branch (`RacingEnv.py:205`)

    def init_aux(self, key):
        n = self.num_agent
        return RacingAux(
            next_target_i=jnp.zeros((n,), jnp.int32),
            past_targets=jnp.zeros((n,), jnp.int32),
            is_pass_next=jnp.zeros((n,), bool),
        )

    def _choose_target(self, pos: Array) -> Array:
        """Quadrant-based first gate (`RacingEnv.py:172-185`)."""
        rela = pos - jnp.asarray([4.0, 0.0, 1.0], self.dtype)
        return jnp.where(
            rela[:, 0] < 0,
            jnp.where(rela[:, 1] > 0, 0, 3),
            jnp.where(rela[:, 0] > 0, 1, 2),
        ).astype(jnp.int32)

    def reset_aux(self, state: EnvState, mask: Array):
        aux: RacingAux = state.aux
        chosen = self._choose_target(state.dyn.pos)
        return RacingAux(
            next_target_i=jnp.where(mask, chosen, aux.next_target_i),
            past_targets=jnp.where(mask, 0, aux.past_targets),
            is_pass_next=jnp.where(mask, False, aux.is_pass_next),
        )

    def step_aux(self, aux: RacingAux, dyn: DynState):
        """Gate-pass detection + cyclic advance (`RacingEnv.py:142-148`)."""
        gate_pos = self.targets[aux.next_target_i]
        is_pass = safe_norm(dyn.pos - gate_pos, axis=-1) <= self.success_radius
        nxt = (aux.next_target_i + is_pass.astype(jnp.int32)) % len(self.targets)
        return RacingAux(
            next_target_i=nxt,
            past_targets=aux.past_targets + is_pass.astype(jnp.int32),
            is_pass_next=is_pass,
        )

    def get_observation(self, state: EnvState, sensor_obs) -> Dict[str, Array]:
        return {
            "state": self.state_obs(state),
            "gate": state.aux.next_target_i[:, None].astype(jnp.int32),
        }

    def get_reward(self, state: EnvState) -> Array:
        aux: RacingAux = state.aux
        pos = state.dyn.pos
        vel = dyn_mod.velocity(state.dyn)
        q_ref = jnp.asarray([1.0, 0.0, 0.0, 0.0], self.dtype)
        base_r = 0.1
        pos_factor = -0.1 / 9
        return (
            base_r
            + safe_norm(pos - self.targets[aux.next_target_i], axis=-1) * pos_factor
            + safe_norm(state.dyn.q - q_ref, axis=-1) * -0.00001
            + safe_norm(vel, axis=-1) * -0.002
            + safe_norm(state.dyn.omega, axis=-1) * -0.002
            + aux.is_pass_next * self.success_r
        )


class RacingEnv2(RacingEnv):
    """Relative positions of the next 2 gates in the state observation
    (`RacingEnv.py:218-267`)."""

    def get_observation(self, state: EnvState, sensor_obs) -> Dict[str, Array]:
        aux: RacingAux = state.aux
        s = self.state_obs(state)
        idx = (
            aux.next_target_i[:, None]
            + jnp.arange(self.next_target_num)[None, :]
        ) % len(self.targets)
        next_targets = self.targets[idx]  # (N, K, 3)
        rel = (next_targets - state.dyn.pos[:, None, :]).reshape(self.num_envs, -1)
        state_vec = jnp.concatenate(
            [
                rel / self.max_sense_radius,
                s[:, 3:7],
                s[:, 7:10] / 10.0,
                s[:, 10:13] / 10.0,
            ],
            axis=-1,
        )
        return {
            "state": state_vec,
            "gate": aux.next_target_i[:, None].astype(jnp.int32),
        }
