"""In-jit scene queries against the baked SDF grids.

Replaces the habitat fork's CGAL closest-point query
(`scene.get_closest_collision_point`, `/root/reference/utils/SceneManager.py:425-461`)
and the spawn-rejection point test (`get_point_is_collision`,
`SceneManager.py:463-497`). One data structure serves collision, rendering
and spawning; everything is differentiable and stays in HBM.

All samplers take a flat batch of points ``p (N, 3)`` with per-point scene
ids ``sid (N,)`` and read the stacked grid ``(S, X, Y, Z)`` via fused linear
gathers.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array

from .scene import SceneData


def _is_prim(data) -> bool:
    from .prim_scene import PrimitiveScene

    return isinstance(data, PrimitiveScene)


def _grid_coords(data: SceneData, p: Array) -> Array:
    return (p - data.origin) / data.spacing


def sample_sdf_nearest(data: SceneData, sid: Array, p: Array) -> Array:
    """Nearest-cell SDF lookup — 1 gather/point (fast path)."""
    g = jnp.round(_grid_coords(data, p)).astype(jnp.int32)
    X, Y, Z = data.sdf.shape[1:]
    g = jnp.clip(g, 0, jnp.asarray([X - 1, Y - 1, Z - 1]))
    lin = ((sid * X + g[..., 0]) * Y + g[..., 1]) * Z + g[..., 2]
    return jnp.take(data.sdf.reshape(-1), lin)


def sample_sdf(data, sid: Array, p: Array) -> Array:
    """Scene SDF at points p (N, 3) with scene ids sid (N,).

    Polymorphic: analytic evaluation for PrimitiveScene (gather-free fast
    path); trilinear grid interpolation for SceneData (mesh grids) — 8
    gathers/point, C0-smooth and differentiable in ``p``."""
    if _is_prim(data):
        from .prim_scene import scene_sdf_flat

        return scene_sdf_flat(data, sid, p)
    X, Y, Z = data.sdf.shape[1:]
    g = _grid_coords(data, p)
    g = jnp.clip(g, 0.0, jnp.asarray([X - 1.001, Y - 1.001, Z - 1.001]))
    g0 = jnp.floor(g)
    f = g - g0
    i0 = g0.astype(jnp.int32)

    flat = data.sdf.reshape(-1)
    base = sid * (X * Y * Z)

    def corner(dx, dy, dz):
        lin = (
            base
            + ((i0[..., 0] + dx) * Y + (i0[..., 1] + dy)) * Z
            + (i0[..., 2] + dz)
        )
        return jnp.take(flat, lin)

    c000 = corner(0, 0, 0)
    c100 = corner(1, 0, 0)
    c010 = corner(0, 1, 0)
    c110 = corner(1, 1, 0)
    c001 = corner(0, 0, 1)
    c101 = corner(1, 0, 1)
    c011 = corner(0, 1, 1)
    c111 = corner(1, 1, 1)

    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    c00 = c000 * (1 - fx) + c100 * fx
    c10 = c010 * (1 - fx) + c110 * fx
    c01 = c001 * (1 - fx) + c101 * fx
    c11 = c011 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def sdf_normal(data, sid: Array, p: Array, eps: float = None) -> Array:
    """Outward normal: exact autodiff gradient for PrimitiveScene, central
    differences of the trilinear field for grids."""
    if _is_prim(data):
        import jax

        g = jax.grad(lambda q: jnp.sum(sample_sdf(data, sid, q)))(p)
        return g / (jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-9)
    h = data.spacing * 0.5 if eps is None else eps
    def d(offset):
        return sample_sdf(data, sid, p + offset)

    ex = jnp.asarray([1.0, 0.0, 0.0]) * h
    ey = jnp.asarray([0.0, 1.0, 0.0]) * h
    ez = jnp.asarray([0.0, 0.0, 1.0]) * h
    n = jnp.stack(
        [d(ex) - d(-ex), d(ey) - d(-ey), d(ez) - d(-ez)], axis=-1
    )
    return n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-9)


def _point_tri_closest(p: Array, tri: Array) -> Array:
    """Closest point on triangles to query points, branchless.

    p (..., 3) broadcast against tri (..., 9) rows [a | b | c] → (..., 3).
    Ericson's seven-region cascade (Real-Time Collision Detection §5.1.5)
    expressed as a reverse-priority ``where`` chain so every lane follows
    the same instruction stream; denominators of untaken branches are
    guarded so no NaN leaks into the selected value OR its gradient."""
    a, b, c = tri[..., 0:3], tri[..., 3:6], tri[..., 6:9]
    ab, ac, ap = b - a, c - a, p - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    def safe(x):
        return jnp.where(jnp.abs(x) > 1e-20, x, 1.0)

    r_ab = a + jnp.clip(d1 / safe(d1 - d3), 0.0, 1.0)[..., None] * ab
    r_ac = a + jnp.clip(d2 / safe(d2 - d6), 0.0, 1.0)[..., None] * ac
    w_bc = jnp.clip((d4 - d3) / safe((d4 - d3) + (d5 - d6)), 0.0, 1.0)
    r_bc = b + w_bc[..., None] * (c - b)
    denom = safe(va + vb + vc)
    r_in = (a + ab * (vb / denom)[..., None] + ac * (vc / denom)[..., None])

    res = r_in
    res = jnp.where(((va <= 0) & (d4 - d3 >= 0)
                     & (d5 - d6 >= 0))[..., None], r_bc, res)
    res = jnp.where(((vb <= 0) & (d2 >= 0) & (d6 <= 0))[..., None],
                    r_ac, res)
    res = jnp.where(((d6 >= 0) & (d5 <= d6))[..., None], c, res)
    res = jnp.where(((vc <= 0) & (d1 >= 0) & (d3 <= 0))[..., None],
                    r_ab, res)
    res = jnp.where(((d3 >= 0) & (d4 <= d3))[..., None], b, res)
    res = jnp.where(((d1 <= 0) & (d2 <= 0))[..., None], a, res)
    return res


def tri_closest_point(tris: Array, sid: Array, p: Array,
                      chunk: int = 4096) -> Tuple[Array, Array]:
    """EXACT closest surface point over a triangle soup.

    tris (S, T, 9) zero-padded soup × query points p (N, 3) with scene ids
    sid (N,) → (point (N, 3), signed-free distance (N,)). The reference
    answers this with CGAL AABB-tree queries on the true mesh
    (`SceneManager.py:440-445`); here a `lax.scan` over ``chunk``-triangle
    slabs keeps peak memory at O(N × chunk) while XLA keeps the VPU busy —
    at framework batch sizes (hundreds of points × tens of thousands of
    triangles) the brute-force pass is microseconds, far below render cost,
    so no hierarchy is needed. All-zero padding rows are masked out.
    Differentiable in ``p`` (piecewise-smooth; the argmin is carried as a
    running ``where`` select)."""
    T = tris.shape[1]
    chunk = min(chunk, T)
    pad = (-T) % chunk
    if pad:
        tris = jnp.pad(tris, ((0, 0), (0, pad), (0, 0)))
    slabs = tris.shape[1] // chunk
    # (slabs, S, chunk, 9): scan walks the leading axis
    soup = jnp.swapaxes(
        tris.reshape(tris.shape[0], slabs, chunk, 9), 0, 1)

    def body(carry, tri_slab):
        best_d2, best_pt = carry
        sel = tri_slab[sid]                      # (N, chunk, 9)
        valid = jnp.any(sel != 0.0, axis=-1)     # padding mask
        q = _point_tri_closest(p[:, None, :], sel)
        d2 = jnp.where(valid, jnp.sum((q - p[:, None, :]) ** 2, -1),
                       jnp.inf)
        j = jnp.argmin(d2, axis=-1)
        d2_min = jnp.take_along_axis(d2, j[:, None], 1)[:, 0]
        pt_min = jnp.take_along_axis(q, j[:, None, None], 1)[:, 0]
        better = d2_min < best_d2
        return (jnp.where(better, d2_min, best_d2),
                jnp.where(better[:, None], pt_min, best_pt)), None

    init = (jnp.full(p.shape[:1], jnp.inf, p.dtype), jnp.zeros_like(p))
    (d2, pt), _ = jax.lax.scan(body, init, soup)
    return pt, jnp.sqrt(jnp.maximum(d2, 1e-24))


def closest_point_query(
    data, sid: Array, p: Array
) -> Tuple[Array, Array, Array]:
    """(closest surface point, distance, out_of_bounds) — the replacement
    for the CGAL `get_closest_collision_point` (`SceneManager.py:440-445`).

    Mesh scenes that carry their true triangle soup answer EXACTLY via
    `tri_closest_point` (matching CGAL's mesh-true query); grid-only and
    primitive scenes use point = p − n̂ · sdf(p), with distance clamped at
    0 inside obstacles."""
    lo, hi = data.bbox[0], data.bbox[1]
    out = jnp.any(p < lo, axis=-1) | jnp.any(p > hi, axis=-1)
    tris = getattr(data, "triangles", ())
    if not _is_prim(data) and not isinstance(tris, tuple) and tris.size:
        point, dis = tri_closest_point(tris, sid, p)
        inside = sample_sdf(data, sid, p) < 0.0  # sign from the baked grid
        return point, jnp.where(inside, 0.0, dis), out
    dis = sample_sdf(data, sid, p)
    n = sdf_normal(data, sid, p)
    point = p - n * dis[..., None]
    return point, jnp.maximum(dis, 0.0), out


def point_is_collision(
    data, p: Array, sid: Array = None, radius: float = 1.0
) -> Array:
    """Spawn rejection test (`get_point_is_collision`,
    `SceneManager.py:463-497`): True when closer than ``radius`` to any
    surface or outside the scene bounds."""
    if sid is None:
        sid = jnp.zeros(p.shape[:-1], jnp.int32)
    dis = sample_sdf(data, sid, p)
    lo, hi = data.bbox[0], data.bbox[1]
    out = jnp.any(p < lo, axis=-1) | jnp.any(p > hi, axis=-1)
    return (dis < radius) | out
