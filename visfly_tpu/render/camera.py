"""Camera model: per-agent sensor rays.

Replaces habitat's ``CameraSensorSpec`` handling
(`/root/reference/utils/SceneManager.py:1013-1035`). Everything is ENU /
z-up / body-x-forward — the reference needed habitat(Y-up)↔ENU permutation
matrices (`utils/common.py:89-179`); here there is a single frame.

Sensor spec dict (reference-compatible keys):
    {"uuid": "depth", "sensor_type": "depth"|"color"|"semantic",
     "resolution": [H, W], "position": [x, y, z] (body-frame offset),
     "orientation": [roll, pitch, yaw] (body-frame offset, radians),
     "hfov": degrees (default 90)}

Depth semantics match the reference pipeline: planar depth along the camera
forward axis, background (no hit within range) = 20 m (`droneEnv.py:306`).
"""
from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from ..core import quaternion as quat


def pixel_dirs_body(spec: Dict) -> np.ndarray:
    """(H, W, 3) unit ray directions in the BODY frame (host-side constant,
    baked into the jit as a literal)."""
    H, W = spec["resolution"]
    hfov = math.radians(float(spec.get("hfov", 90.0)))
    tan_h = math.tan(hfov / 2.0)
    # vertical fov from aspect
    tan_v = tan_h * H / W

    u = np.linspace(-1.0, 1.0, W, endpoint=True) if W > 1 else np.zeros(1)
    v = np.linspace(1.0, -1.0, H, endpoint=True) if H > 1 else np.zeros(1)
    uu, vv = np.meshgrid(u * tan_h, v * tan_v, indexing="xy")

    forward = np.asarray([1.0, 0.0, 0.0])
    right = np.asarray([0.0, -1.0, 0.0])
    up = np.asarray([0.0, 0.0, 1.0])

    ori = spec.get("orientation")
    if ori is not None and np.any(np.asarray(ori) != 0):
        # pure-numpy zyx euler → rotation matrix (this runs at trace time —
        # jnp ops here would be staged as tracers and break np conversion)
        r, p, y = (float(a) for a in ori)
        cr, sr = np.cos(r), np.sin(r)
        cp, sp = np.cos(p), np.sin(p)
        cy, sy = np.cos(y), np.sin(y)
        rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
        ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
        rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
        rot = rz @ ry @ rx
        forward, right, up = rot @ forward, rot @ right, rot @ up

    dirs = (
        forward[None, None]
        + uu[..., None] * right[None, None]
        + vv[..., None] * up[None, None]
    )
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    return dirs.astype(np.float32), forward.astype(np.float32)


def tile_cones_body(spec: Dict, tile: int = 8):
    """Per-tile cone prepass geometry (host-side constants).

    Splits the H×W pixel grid into (H/t)×(W/t) tiles and returns
    (tile_dirs (Ht·Wt, 3) — the normalised mean pixel direction per tile,
    tile_tan (Ht·Wt,) — tan of the cone half-angle that conservatively
    contains every pixel ray of the tile). Used by the hierarchical sphere
    tracer: a cone that marches with radius t·tanθ cannot overshoot any of
    its pixel rays' first hits."""
    dirs, _f = pixel_dirs_body(spec)
    H, W = dirs.shape[:2]
    t = tile
    if H % t or W % t:
        return None, None
    tiles = dirs.reshape(H // t, t, W // t, t, 3).transpose(0, 2, 1, 3, 4)
    tiles = tiles.reshape(H // t, W // t, t * t, 3)
    center = tiles.mean(axis=2)
    center = center / np.linalg.norm(center, axis=-1, keepdims=True)
    cos = np.einsum("hwc,hwpc->hwp", center, tiles).min(axis=-1)
    cos = np.clip(cos, 1e-3, 1.0)
    tan = np.sqrt(1.0 - cos**2) / cos
    return (
        center.reshape(-1, 3).astype(np.float32),
        tan.reshape(-1).astype(np.float32),
    )


def camera_rays_components(
    spec: Dict, pos: Array, q: Array
) -> Tuple[Array, Array, Array]:
    """Component-major ray generation for the TPU hot path.

    Returns (origins (3, N), dirs (3, N, H·W), cos_forward (H·W,)).
    Trailing-dim-3 arrays are poison on TPU (the minor dim pads to 128
    lanes → 42× relayout blowups); here directions come out of one MXU
    matmul ``R(N,3,3) @ dirs_body(3, H·W)`` with the pixel axis in lanes.
    """
    dirs_body, forward_body = pixel_dirs_body(spec)
    H, W = dirs_body.shape[:2]
    db = jnp.asarray(dirs_body.reshape(H * W, 3).T)  # (3, HW) static

    offset = np.asarray(spec.get("position", [0.0, 0.0, 0.0]), np.float32)
    if np.any(offset != 0):
        origins = pos + quat.rotate_fused(
            q, jnp.broadcast_to(jnp.asarray(offset), pos.shape)
        )
    else:
        origins = pos

    rot = quat.to_rotation_matrix(q)  # (N, 3, 3)
    # HIGHEST: the TPU DEFAULT multiply is bf16 — ray directions rounded to
    # ~8 mantissa bits cost ~4 cm lateral error at 10 m, silently breaking
    # the renderer's mm-level accuracy claims (CPU tests can't see this)
    dirs = jnp.einsum("nck,kp->cnp", rot, db,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)  # (3, N, HW)
    cos_f = jnp.asarray(dirs_body.reshape(H * W, 3) @ forward_body)  # (HW,)
    return origins.T, dirs, cos_f


def camera_rays(
    spec: Dict, pos: Array, q: Array
) -> Tuple[Array, Array, Array]:
    """World-frame ray origins/dirs for N agents.

    Returns (origins (N,3), dirs (N,H,W,3), cos_forward (N,H,W)) where
    cos_forward converts euclidean ray length to planar depth."""
    dirs_body, forward_body = pixel_dirs_body(spec)
    offset = np.asarray(spec.get("position", [0.0, 0.0, 0.0]), np.float32)

    origins = pos + quat.rotate_fused(q, jnp.broadcast_to(jnp.asarray(offset), pos.shape))
    n = pos.shape[0]
    H, W = dirs_body.shape[:2]
    db = jnp.asarray(dirs_body).reshape(1, H * W, 3)
    dirs = quat.rotate_fused(q[:, None, :], jnp.broadcast_to(db, (n, H * W, 3)))
    cos_f = jnp.asarray(dirs_body.reshape(H * W, 3) @ forward_body)  # (H*W,)
    return origins, dirs.reshape(n, H, W, 3), jnp.broadcast_to(cos_f.reshape(1, H, W), (n, H, W))
