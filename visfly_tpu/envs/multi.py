"""Multi-drone (swarm) environments.

Parity targets: `/root/reference/envs/multiDroneGymEnv.py` and
`/root/reference/envs/MultiNavigationEnv.py`. Drones in the same scene see
each other: inter-drone distance overrides the scene collision point when a
neighbour is closer than the nearest obstacle (`SceneManager.py:447-461`),
and success/done aggregate per scene (all/any over the scene's agents,
`multiDroneGymEnv.py:114-125`).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
from jax import Array

from ..core.math_utils import safe_norm
from ..dynamics import DynState
from ..dynamics import dynamics as dyn_mod
from .base import CollisionInfo, DroneGymEnv, EnvState


class MultiDroneGymEnv(DroneGymEnv):
    """Per-scene aggregation + inter-drone collision awareness."""

    def __init__(self, *args, **kwargs):
        kwargs["multi_drone"] = True
        super().__init__(*args, **kwargs)
        if self.num_agent_per_scene == 1:
            raise ValueError("Num of agents should not be 1 in multi drone env.")

    def _per_scene(self, x: Array) -> Array:
        return x.reshape(self.num_scene, self.num_agent_per_scene)

    def aggregate_success(self, success: Array) -> Array:
        """Scene succeeds only when ALL its agents do
        (`multiDroneGymEnv.py:114-116`)."""
        all_s = self._per_scene(success).all(axis=1, keepdims=True)
        return jnp.broadcast_to(all_s, (self.num_scene, self.num_agent_per_scene)).reshape(-1)

    def aggregate_done(self, done: Array) -> Array:
        """Scene terminates when ANY agent terminates
        (`multiDroneGymEnv.py:123-125`)."""
        any_d = self._per_scene(done).any(axis=1, keepdims=True)
        return jnp.broadcast_to(any_d, (self.num_scene, self.num_agent_per_scene)).reshape(-1)

    def render_objects(self, state: EnvState):
        """Drones appear in each other's cameras as TRUE quadrotor
        geometry posed with the airframe attitude — the reference inserts
        per-agent DJI-Mavic GLBs (red/green/blue/orange) into every scene
        graph (`SceneManager.py:201-202,853-866`). Rays originating inside
        a body's bounding sphere ignore it (tracer self-exclusion)."""
        import numpy as np

        from ..scene.templates import drone_template

        S, A = self.num_scene, self.num_agent_per_scene
        drone_pos = state.dyn.pos.reshape(S, A, 3)
        drone_rad = jnp.full((S, A), self.uav_radius, state.dyn.pos.dtype)
        # the reference's 4-color agent cycle (`SceneManager.py:253-255`)
        cycle = np.asarray([[200.0, 60.0, 60.0], [60.0, 180.0, 60.0],
                            [70.0, 90.0, 220.0], [230.0, 140.0, 40.0]],
                           np.float32)
        drone_col = jnp.asarray(
            np.tile(cycle[np.arange(A) % 4][None], (S, 1, 1)),
            state.dyn.pos.dtype)
        tmpl = jnp.asarray(drone_template(float(self.uav_radius)))
        drone_mesh = jnp.broadcast_to(tmpl, (S, A, *tmpl.shape))
        drone_q = state.dyn.q.reshape(S, A, 4)
        parent = super().render_objects(state)
        if parent is None:
            return drone_pos, drone_rad, drone_col, drone_mesh, drone_q
        obj_pos, obj_rad, obj_col = parent[:3]
        m = obj_pos.shape[1]
        Ko = parent[3].shape[2] if len(parent) > 3 else 0
        K = max(Ko, tmpl.shape[0])

        def pad_k(x):
            return jnp.pad(x, ((0, 0), (0, 0), (0, K - x.shape[2]), (0, 0)))

        obj_mesh = (pad_k(parent[3]) if len(parent) > 3
                    else jnp.zeros((S, m, K, 9), tmpl.dtype))
        obj_q = (parent[4] if len(parent) > 4 and parent[4] is not None
                 else jnp.zeros((S, m, 4), drone_q.dtype).at[..., 0].set(1.0))
        return (jnp.concatenate([obj_pos, drone_pos], axis=1),
                jnp.concatenate([obj_rad, drone_rad], axis=1),
                jnp.concatenate([obj_col, drone_col], axis=1),
                jnp.concatenate([obj_mesh, pad_k(drone_mesh)], axis=1),
                jnp.concatenate([obj_q, drone_q], axis=1))

    def _update_collision(self, dyn: DynState, once: Array, objects=(),
                          scene=None) -> Tuple[CollisionInfo, Array]:
        info, once = super()._update_collision(dyn, once, objects, scene)
        # nearest other drone in the same scene (`SceneManager.py:447-461`)
        import jax

        pos = jax.lax.stop_gradient(dyn.pos).reshape(
            self.num_scene, self.num_agent_per_scene, 3
        )
        diff = pos[:, :, None, :] - pos[:, None, :, :]
        d = jnp.linalg.norm(diff, axis=-1)
        eye = jnp.eye(self.num_agent_per_scene, dtype=bool)[None]
        d = jnp.where(eye, jnp.inf, d)
        nearest = jnp.argmin(d, axis=-1)  # (S, A)
        drone_dis = jnp.take_along_axis(d, nearest[..., None], axis=-1)[..., 0]
        nearest_pos = jnp.take_along_axis(
            pos, nearest[..., None], axis=1
        )
        drone_dis = drone_dis.reshape(-1)
        nearest_pos = nearest_pos.reshape(-1, 3)
        flat_pos = pos.reshape(-1, 3)

        closer = drone_dis < info.dis
        point = jnp.where(closer[:, None], nearest_pos, info.point)
        vector = point - flat_pos
        dis = jnp.where(closer, drone_dis, info.dis)
        is_col = dis < self.uav_radius * 2  # two drone radii
        return (
            CollisionInfo(point, vector, dis, is_col | info.is_collision,
                          info.is_out_bounds),
            once | is_col | info.is_collision,
        )


class MultiNavigationEnv(MultiDroneGymEnv):
    """Swarm navigation: each agent observes the other agents' states
    (`MultiNavigationEnv.py:77-103`). With ``scene_kwargs={"is_find_path":
    True}`` every reset plans a collision-free PRM waypoint path per agent
    to its target, exposed as ``.path``
    (`MultiNavigationEnv.py:56-75`)."""

    def __init__(self, *args, target: Optional[Array] = None,
                 sensor_kwargs=None, max_episode_steps: int = 256, **kwargs):
        if kwargs.get("visual", True) and not sensor_kwargs:
            sensor_kwargs = [
                {"sensor_type": "depth", "uuid": "depth", "resolution": [64, 64]}
            ]
        super().__init__(*args, sensor_kwargs=sensor_kwargs,
                         max_episode_steps=max_episode_steps, **kwargs)
        if target is None:
            base = jnp.asarray(
                [[13.0, -2.0, 1.5], [13.0, 0.0, 1.5], [13.0, 2.0, 1.5]],
                self.dtype,
            )
            reps = -(-self.num_agent_per_scene // 3)
            per_scene = jnp.tile(base, (reps, 1))[: self.num_agent_per_scene]
            self.target = jnp.tile(per_scene, (self.num_scene, 1))
        else:
            self.target = jnp.asarray(target, self.dtype)
        self.success_radius = 0.5
        # PRM path hints (`MultiNavigationEnv.py:56-58`): host-side plan
        # per reset — guidance for controllers/visualisation, not part of
        # the jitted step
        self.is_find_path = bool(
            dict(kwargs.get("scene_kwargs") or {}).get("is_find_path", False))
        self._paths = [None] * self.num_envs

    @property
    def path(self):
        """Per-agent PRM waypoint lists from the latest reset
        (`MultiNavigationEnv.py:73-75`); ``None`` entries where planning
        is off or no path was found."""
        return self._paths

    def reset(self, key=None, state=None):
        st, obs = super().reset(key, state)
        if self.is_find_path:
            from ..utils.path_finder import find_paths

            self._paths = find_paths(self, st.dyn.pos, self.target)
        return st, obs

    def reset_env_by_id(self, state: EnvState, scene_id: int) -> EnvState:
        st = super().reset_env_by_id(state, scene_id)
        if self.is_find_path:
            from ..utils.path_finder import find_paths

            A = self.num_agent_per_scene
            idx = range(scene_id * A, (scene_id + 1) * A)
            for i, p in zip(idx, find_paths(self, st.dyn.pos, self.target,
                                            indices=idx)):
                self._paths[i] = p
        return st

    def get_observation(self, state: EnvState, sensor_obs) -> Dict[str, Array]:
        s = self.state_obs(state)
        A = self.num_agent_per_scene
        per_scene = s.reshape(self.num_scene, A, -1)
        # all other agents' states, per agent (`MultiNavigationEnv.py:82-88`)
        idx = jnp.arange(A)
        others = jnp.stack(
            [jnp.concatenate([idx[:i], idx[i + 1:]]) for i in range(A)], axis=0
        )  # (A, A-1)
        swarm = per_scene[:, others, :]  # (S, A, A-1, D)
        obs = {
            "state": s,
            "target": self.target,
            "swarm": swarm.reshape(self.num_agent, A - 1, -1),
        }
        if "depth" in sensor_obs:
            obs["depth"] = sensor_obs["depth"]
        return obs

    def get_success(self, state: EnvState) -> Array:
        """`MultiNavigationEnv.py:111-113` (shipped variant: x > 10)."""
        return state.dyn.pos[:, 0] > 10.0

    def get_reward(self, state: EnvState) -> Array:
        """Approach + view-cone + collision shaping with per-scene success
        bonus (`MultiNavigationEnv.py:119-147`)."""
        pos = state.dyn.pos
        vel = dyn_mod.velocity(state.dyn)
        direction = dyn_mod.direction(state.dyn)
        to_target = self.target - pos
        dis = safe_norm(to_target, axis=-1)
        vel_norm = safe_norm(vel, axis=-1)
        col_dis = state.collision.dis
        col_vec = state.collision.vector
        thrd_perce = jnp.pi / 18
        q_ref = jnp.asarray([1.0, 0.0, 0.0, 0.0], self.dtype)

        approach = jnp.clip(jnp.sum(vel * to_target, -1) / (1e-6 + dis), None, 10.0)
        view_cos = jnp.clip(jnp.sum(direction * vel, -1) / (1e-6 + vel_norm), -1.0, 1.0)
        view_pen = jnp.maximum(jnp.arccos(view_cos), thrd_perce) - thrd_perce
        col_closing = jnp.maximum(jnp.sum(col_vec * vel, -1) / (1e-6 + col_dis), 0.0)

        return (
            approach * 0.01
            + view_pen * -0.01
            + safe_norm(state.dyn.q - q_ref, axis=-1) * -0.00001
            + vel_norm * -0.002
            + safe_norm(state.dyn.omega, axis=-1) * -0.002
            + 1.0 / (col_dis + 0.2) * -0.01
            + jnp.maximum(1.0 - col_dis, 0.0) * col_closing * -0.005
            + state.success
            * (self.max_episode_steps - state.step_count)
            * 0.1
            * (0.5 + 0.5 / (1.0 + vel_norm))
        )
