"""Dynamic objects — moving obstacles / targets.

Replaces the reference ``ObjectManager``/``Path``
(`/root/reference/utils/ObjectManger.py`): the circle / polygon /
cubic-spline trajectories (CubicSpline through random control points,
arc-length parameterised for uniform speed, periodic closing,
`ObjectManger.py:61-103`) are precomputed host-side into dense
position-over-time lookup tables; in-jit stepping is a linear interpolation
of the table — no data-dependent control flow, fully batched over objects.

Object geometry is approximated by bounding spheres whose SDFs compose with
the baked scene grid at query time (collision + rendering see moving
obstacles without re-baking the grid).
"""
from __future__ import annotations

import json
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

TABLE_SAMPLES = 512


class DynamicObjects(NamedTuple):
    """Device pytree for M objects across S scenes."""

    table: Any  # (M, T, 3) position over one period (uniform in time)
    period: Any  # (M,) seconds per cycle
    radius: Any  # (M,) bounding-sphere radius
    scene_of: Any  # (M,) int32 owning scene
    mesh: Any = None  # (M, K, 9) local-frame render tris (zero rows = pad;
    #                   all-zero object = sphere fallback), or None

    @property
    def num_objects(self):
        return self.table.shape[0]


class ObjectsState(NamedTuple):
    t: Any  # (S,) per-scene clocks (`ObjectManger.py:182,249`)
    pos: Any  # (M, 3)
    vel: Any  # (M, 3)


# ---------------------------------------------------------------------------
# host-side trajectory table construction
# ---------------------------------------------------------------------------


def _circle_table(kwargs: Dict, velocity: float, n: int) -> Tuple[np.ndarray, float]:
    radius = float(kwargs["radius"])
    center = np.asarray(kwargs["center"], np.float32)
    omega = velocity / radius  # (`ObjectManger.py:27`)
    period = 2 * np.pi / abs(omega)
    ts = np.linspace(0.0, period, n, endpoint=False)
    pos = np.stack(
        [
            radius * np.cos(omega * ts) + center[0],
            radius * np.sin(omega * ts) + center[1],
            np.full_like(ts, center[2]),
        ],
        axis=-1,
    )
    return pos.astype(np.float32), float(period)


def _polygon_table(kwargs: Dict, velocity: float, n: int) -> Tuple[np.ndarray, float]:
    """Waypoint chase at constant speed (`ObjectManger.py:124-133`), closed."""
    pts = np.asarray(kwargs["points"], np.float32)
    loop = np.concatenate([pts, pts[:1]], axis=0)
    seg = np.diff(loop, axis=0)
    seg_len = np.linalg.norm(seg, axis=-1)
    cum = np.concatenate([[0.0], np.cumsum(seg_len)])
    total = cum[-1]
    period = total / velocity
    s = np.linspace(0.0, total, n, endpoint=False)
    idx = np.clip(np.searchsorted(cum, s, side="right") - 1, 0, len(seg) - 1)
    frac = (s - cum[idx]) / np.maximum(seg_len[idx], 1e-9)
    pos = loop[idx] + seg[idx] * frac[:, None]
    return pos.astype(np.float32), float(period)


def _cubic_table(
    kwargs: Dict, velocity: Optional[float], n: int, rng: np.random.Generator
) -> Tuple[np.ndarray, float]:
    """Periodic cubic spline through random control points, arc-length
    parameterised (`ObjectManger.py:61-103`)."""
    from scipy.interpolate import CubicSpline

    pts_info = kwargs["points"]
    kw = pts_info.get("kwargs", {})
    pmean = np.asarray(kw.get("position", {}).get("mean", [0, 0, 2]), np.float32)
    phalf = np.asarray(kw.get("position", {}).get("half", [2, 2, 1]), np.float32)
    n_ctrl = int(kw.get("num", kwargs.get("num_points", 6)))
    ctrl = (2 * rng.uniform(size=(n_ctrl, 3)).astype(np.float32) - 1) * phalf + pmean
    vhalf = np.asarray(kw.get("velocity", {}).get("half", [1, 1, 1]), np.float32)
    ctrl_v = np.linalg.norm(
        (2 * rng.uniform(size=(n_ctrl, 3)).astype(np.float32) - 1) * vhalf, axis=-1
    )
    ctrl = np.concatenate([ctrl, ctrl[:1]], axis=0)
    ctrl_v = np.concatenate([ctrl_v, ctrl_v[:1]], axis=0)

    dists = np.linalg.norm(np.diff(ctrl, axis=0), axis=-1)
    cum = np.concatenate([[0.0], np.cumsum(dists)]).astype(np.float32)
    cs = [CubicSpline(cum, ctrl[:, i], bc_type="periodic") for i in range(3)]

    # dense arc-length parameterisation (`ObjectManger.py:78-103`)
    p_samples = np.linspace(0, cum[-1], 1000)
    dense = np.stack([c(p_samples) for c in cs], axis=-1)
    arc = np.concatenate(
        [[0.0], np.cumsum(np.linalg.norm(np.diff(dense, axis=0), axis=-1))]
    )
    total_arc = arc[-1]

    if velocity:
        period = total_arc / velocity
        s = (np.linspace(0, period, n, endpoint=False) * velocity) % total_arc
    else:
        # speed varies along the path per control-point speeds; integrate
        v_of_param = CubicSpline(cum, np.maximum(ctrl_v, 0.1))
        # time to traverse each dense segment
        seg_v = np.maximum(v_of_param(p_samples[:-1]), 0.1)
        seg_t = np.diff(arc) / seg_v
        t_of_arc = np.concatenate([[0.0], np.cumsum(seg_t)])
        period = t_of_arc[-1]
        t_targets = np.linspace(0, period, n, endpoint=False)
        s = np.interp(t_targets, t_of_arc, arc)

    param_of_arc = np.interp(s, arc, p_samples)
    pos = np.stack([c(param_of_arc) for c in cs], axis=-1)
    return pos.astype(np.float32), float(period)


def build_objects(
    obj_settings: Sequence[Dict],
    num_scene: int = 1,
    seed: int = 42,
    table_samples: int = TABLE_SAMPLES,
) -> DynamicObjects:
    """Build tables from reference-style object settings
    (`configs/obj/**` JSON entries: name/path{class,kwargs}/velocity/num).

    Each setting is instantiated in EVERY scene (the reference creates one
    ObjectManager per scene, `SceneManager.py:876-891`)."""
    import jax.numpy as jnp

    from .templates import object_template, pad_templates

    rng = np.random.default_rng(seed)
    tables, periods, radii, scene_of, meshes = [], [], [], [], []
    for sid in range(num_scene):
        for setting in obj_settings:
            for _ in range(int(setting.get("num", 1))):
                path = setting["path"]
                vel = setting.get("velocity")
                if isinstance(vel, dict):
                    vel = float(np.mean(vel.get("kwargs", {}).get("mean", 1.0)))
                cls = path["class"]
                if cls == "circle":
                    tab, per = _circle_table(path["kwargs"], float(vel or 1.0), table_samples)
                elif cls == "polygon":
                    tab, per = _polygon_table(path["kwargs"], float(vel or 1.0), table_samples)
                elif cls == "cubic":
                    tab, per = _cubic_table(path["kwargs"], vel, table_samples, rng)
                else:
                    raise ValueError(f"unknown path class {cls!r}")
                tables.append(tab)
                periods.append(per)
                rad = float(setting.get("radius", 0.25))
                radii.append(rad)
                scene_of.append(sid)
                # true render geometry (the reference loads the setting's
                # `model_path` GLB into the scene graph,
                # `SceneManager.py:247-255`); absent -> sphere fallback
                model = setting.get("model_path") or setting.get("mesh")
                meshes.append(
                    None if model is None else object_template(model, rad))
    return DynamicObjects(
        table=jnp.asarray(np.stack(tables)),
        period=jnp.asarray(np.asarray(periods, np.float32)),
        radius=jnp.asarray(np.asarray(radii, np.float32)),
        scene_of=jnp.asarray(np.asarray(scene_of, np.int32)),
        mesh=(None if all(m is None for m in meshes)
              else jnp.asarray(pad_templates(meshes))),
    )


def load_obj_settings(path_or_settings) -> List[Dict]:
    """Accept a JSON file path (reference `obj_settings` kwarg) or an inline
    list of setting dicts."""
    if isinstance(path_or_settings, str):
        with open(path_or_settings) as f:
            return json.load(f)["objects"]
    return list(path_or_settings)


# ---------------------------------------------------------------------------
# in-jit stepping and SDF composition
# ---------------------------------------------------------------------------


def init_objects_state(objs: DynamicObjects, num_scene: int) -> ObjectsState:
    import jax.numpy as jnp

    pos = objs.table[:, 0, :]
    return ObjectsState(
        t=jnp.zeros((num_scene,), jnp.float32),
        pos=pos,
        vel=jnp.zeros_like(pos),
    )


def step_objects(objs: DynamicObjects, state: ObjectsState, dt: float) -> ObjectsState:
    """Advance clocks and interpolate the tables; finite-difference velocity
    (`ObjectManger.py:109-115,248-254`)."""
    import jax.numpy as jnp

    t = state.t + dt
    t_obj = t[objs.scene_of]  # (M,)
    phase = (t_obj % objs.period) / objs.period * objs.table.shape[1]
    i0 = jnp.floor(phase).astype(jnp.int32) % objs.table.shape[1]
    i1 = (i0 + 1) % objs.table.shape[1]
    frac = (phase - jnp.floor(phase))[:, None]
    m_idx = jnp.arange(objs.num_objects)
    pos = objs.table[m_idx, i0] * (1 - frac) + objs.table[m_idx, i1] * frac
    vel = (pos - state.pos) / dt
    return ObjectsState(t=t, pos=pos, vel=vel)


def objects_sdf(objs: DynamicObjects, obj_pos, sid, p):
    """min distance from points p (N,3) with scene ids sid (N,) to the
    objects of their scene (bounding spheres). Returns (N,)."""
    import jax.numpy as jnp

    d = jnp.linalg.norm(p[:, None, :] - obj_pos[None, :, :], axis=-1) - objs.radius[None, :]
    same_scene = sid[:, None] == objs.scene_of[None, :]
    d = jnp.where(same_scene, d, jnp.inf)
    return jnp.min(d, axis=-1)


def objects_closest(objs: DynamicObjects, obj_pos, sid, p):
    """(closest object surface point, distance) per query point."""
    import jax.numpy as jnp

    diff = p[:, None, :] - obj_pos[None, :, :]
    dist_c = jnp.linalg.norm(diff, axis=-1)
    d = dist_c - objs.radius[None, :]
    same_scene = sid[:, None] == objs.scene_of[None, :]
    d = jnp.where(same_scene, d, jnp.inf)
    j = jnp.argmin(d, axis=-1)
    n = jnp.arange(p.shape[0])
    dirn = diff[n, j] / jnp.maximum(dist_c[n, j], 1e-9)[:, None]
    point = obj_pos[j] + dirn * objs.radius[j][:, None]
    return point, d[n, j]
