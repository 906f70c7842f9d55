"""Analytic signed-distance primitives.

The reference's collision/render engine is a modified Habitat-Sim (C++ +
CGAL closest-point queries, SURVEY §2.1). The TPU-native replacement
represents scenes as signed distance fields: primitives below are evaluated
(a) host-side on dense numpy grids when baking static scenes and (b) in-jit
for dynamic objects, composed with ``min``.

Conventions: ENU world frame (z-up), distances in metres, negative inside.
All functions broadcast over leading dims of ``p`` (..., 3) and work for both
numpy and jax arrays (pure ufunc math).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import numpy as np


def _np_or_jnp(p):
    import jax.numpy as jnp

    return jnp if not isinstance(p, np.ndarray) else np


def sd_sphere(p, center, radius):
    xp = _np_or_jnp(p)
    return xp.linalg.norm(p - xp.asarray(center), axis=-1) - radius


def sd_box(p, center, half_extents):
    """Axis-aligned box."""
    xp = _np_or_jnp(p)
    q = xp.abs(p - xp.asarray(center)) - xp.asarray(half_extents)
    outside = xp.linalg.norm(xp.maximum(q, 0.0), axis=-1)
    inside = xp.minimum(xp.max(q, axis=-1), 0.0)
    return outside + inside


def sd_cylinder(p, center, radius, half_height):
    """Vertical (z-axis) capped cylinder — the 'column' obstacle."""
    xp = _np_or_jnp(p)
    d = p - xp.asarray(center)
    r = xp.linalg.norm(d[..., :2], axis=-1) - radius
    h = xp.abs(d[..., 2]) - half_height
    outside = xp.linalg.norm(
        xp.stack([xp.maximum(r, 0.0), xp.maximum(h, 0.0)], axis=-1), axis=-1
    )
    inside = xp.minimum(xp.maximum(r, h), 0.0)
    return outside + inside


def sd_capsule(p, a, b, radius):
    xp = _np_or_jnp(p)
    a = xp.asarray(a)
    b = xp.asarray(b)
    pa = p - a
    ba = b - a
    h = xp.clip(
        xp.sum(pa * ba, axis=-1) / xp.sum(ba * ba, axis=-1), 0.0, 1.0
    )
    return xp.linalg.norm(pa - ba * h[..., None], axis=-1) - radius


def sd_room(p, bounds_min, bounds_max):
    """Hollow axis-aligned room: negative distance to the nearest wall from
    inside (free space is OUTSIDE the solid walls, so we negate the box SDF
    of the interior)."""
    xp = _np_or_jnp(p)
    lo = xp.asarray(bounds_min)
    hi = xp.asarray(bounds_max)
    center = (lo + hi) * 0.5
    half = (hi - lo) * 0.5
    return -sd_box(p, center, half)


def sd_gate(p, center, yaw, inner_half, thickness):
    """Square gate (racing): a frame of 4 capsule-ish boxes around an
    opening of half-width ``inner_half``, facing along its local x axis."""
    xp = _np_or_jnp(p)
    d = p - xp.asarray(center)
    c, s = np.cos(-yaw), np.sin(-yaw)
    # rotate into gate frame (yaw about z)
    x = d[..., 0] * c - d[..., 1] * s
    y = d[..., 0] * s + d[..., 1] * c
    z = d[..., 2]
    outer = inner_half + thickness
    # frame = box(outer) minus box(inner) in the y-z plane, thin in x
    qy = xp.abs(y)
    qz = xp.abs(z)
    box_outer = xp.stack(
        [xp.abs(x) - thickness, qy - outer, qz - outer], axis=-1
    )
    d_outer = xp.linalg.norm(xp.maximum(box_outer, 0.0), axis=-1) + xp.minimum(
        xp.max(box_outer, axis=-1), 0.0
    )
    d_inner_2d = xp.minimum(inner_half - qy, inner_half - qz)  # >0 inside hole
    return xp.maximum(d_outer, d_inner_2d)


PRIM_EVAL = {
    "sphere": lambda p, s: sd_sphere(p, s["center"], s["radius"]),
    "box": lambda p, s: sd_box(p, s["center"], s["half_extents"]),
    "cylinder": lambda p, s: sd_cylinder(
        p, s["center"], s["radius"], s["half_height"]
    ),
    "capsule": lambda p, s: sd_capsule(p, s["a"], s["b"], s["radius"]),
    "room": lambda p, s: sd_room(p, s["bounds_min"], s["bounds_max"]),
    "gate": lambda p, s: sd_gate(
        p, s["center"], s.get("yaw", 0.0), s["inner_half"], s["thickness"]
    ),
}


def eval_primitive(p, spec: Dict[str, Any]):
    return PRIM_EVAL[spec["type"]](p, spec)


def eval_scene_sdf(p, primitives: Sequence[Dict[str, Any]]):
    """min-composition over all primitives."""
    xp = _np_or_jnp(p)
    d = None
    for spec in primitives:
        di = eval_primitive(p, spec)
        d = di if d is None else xp.minimum(d, di)
    return d
