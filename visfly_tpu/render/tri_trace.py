"""Exact triangle-mesh ray tracing at training speed.

The reference renders imported habitat stages as exact triangle geometry
through habitat-sim's rasteriser (`/root/reference/utils/SceneManager.py:
371-389,893-929`). Here the same capability is TPU-native: a fused Pallas
kernel intersects each camera-tile's rays against a per-tile CULLED,
COMPACTED triangle list (one-hot matmul compaction — no gathers) in
closed form; normals/materials follow from the kernel-reported winning
triangle id. Collision queries are exact too (`scene/queries.py::
tri_closest_point` — the reference's CGAL closest-point side), so BOTH
halves of habitat's GL-render + CGAL-query split see true geometry.

Backends:
* ``tri_trace_xla`` — brute-force vmapped Möller–Trumbore (CPU/parity path,
  differentiable via the shared IFT custom VJP).
* ``tri_trace_pallas`` — per-tile frustum cull + compaction + fused kernel
  (TPU hot path; rays per scene must be a multiple of 1024). The kernel
  skips whole triangle-chunks past the tile's visible-triangle count
  (compaction sorts actives first) and distance-sorted chunks carry
  conservative hit-t lower bounds for a whole-tile occlusion early-out,
  so per-tile cost tracks the TRUE workload, not ``cap``.

Mesh-size tiers (all through ``tri_trace_pallas``, chosen statically):
* ``T ≤ 2048`` — per-TRIANGLE cull/compaction; camera tiles use the
  shared-origin SIGNED-VOLUME form (payload ``[g0 | g1 | g2 | kt]``,
  gᵢ the per-origin edge volumes — a hit is 9 FMAs + 3 sign products
  vs classic MT's ~45 vector ops).
* ``2048 < T ≤ 16384`` — Morton-sorted 64-triangle CLUSTER cull (the
  per-triangle prepass is O(tiles·T) and stops scaling), same payload.
* ``T > 16384`` — two shared-soup variants with per-tile cluster-ID
  lists (scalar prefetch) indexing the kernel's block DMA straight out
  of the soup (memory O(T), not O(tiles × cap)): whole-camera ray
  batches take `_tri_trace_pallas_camsoup` (per-CAMERA signed-volume
  pages, O(cams × T) payload rebuilt per frame); arbitrary ray sets
  fall back to `_tri_trace_pallas_soup` (raw triangles, classic MT).
  92k-triangle meshes render exactly on one v5e.

Camera workloads additionally get square 32×32-pixel tile repacking
(tighter frusta than row strips) and opt-in ``backface`` cluster
normal-cone culling — exact on watertight consistently-wound meshes and
habitat's GL default (`pack_triangles` orders clusters orientation-pure
so the cone test can fire). All kernels carry the winning triangle id
and reconstruct normals with one XLA gather (`_normals_from_gid`);
the id also drives textured RGB (UV + atlas tables, `scene/mesh.py`).

A Baldwin–Weber precomputed-transform kernel (~0.6× the vector ops) was
measured SLOWER than Möller–Trumbore here (7.9 vs 5.7 ms/frame-batch on
v5e): its hit algebra is one long serial dependency chain, while MT's
three cross/dot chains pipeline on the VPU — op count lost to ILP. A
manually double-buffered ``while_loop`` STREAM kernel (dynamic per-tile
block walk, hand-rolled HBM→SMEM `make_async_copy`, suffix-min exit) was
also built and measured SLOWER than grid dispatch (123 vs 84 ms at 23k
tris, 250 vs 226 ms at 92k): Mosaic's BlockSpec pipeline overlaps the
per-chunk DMA better than manual prefetch, and the `fori_loop` triangle
walk it forces (a fully unrolled body takes Mosaic >200 s to lower inside
`while_loop`) loses the unrolled body's ILP. Its per-camera coefficient
payload survives in `_tri_trace_pallas_camsoup`. A ray-major layout
(triangles in lanes, per-ray early exit) prices out at 3.7× worse
throughput per ray-triangle test than tile-lockstep — the per-ray exit
only recovers ~1.7× of it — and was not built.

Overflow contract: a tile whose visible-triangle count exceeds the static
``cap`` keeps its ``cap`` NEAREST visible triangles (distance-priority
compaction) — the near field stays exact and overflow manifests as far
geometry reporting background, never as a missing near obstacle in front
of a kept far wall (measured on a 5.7k-tri mesh at cap 256, 51% tiles
overflowing: index-order tails gave 1.4% wrong hits with up to 15 m depth
error; distance priority leaves hit-depth error p99 at 0). The culling
stats helper reports the overflow fraction so scenes can size ``cap``.
Stage meshes are dominated by a few large wall/floor triangles, so
practical caps are small (default 256).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024
ROWS, LANES = 8, 128
BIG = 1e9


CLUSTER = 64  # triangles per cull cluster (the two-level path for large
# meshes); equals one kernel chunk so cluster-granular counts skip exactly

# meshes above this size cull at cluster granularity: the per-triangle
# argsort/one-hot prepass is O(tiles·T) per tile and stops scaling around
# a few thousand triangles, while cluster bounds keep it at O(tiles·T/64)
CLUSTER_CULL_MIN_T = 2048

# meshes above this size skip per-tile compaction entirely: the compacted
# buffer costs tiles × cap × 36 B (≈1 GB at 100k triangles); instead the
# kernel DMAs cluster blocks straight from the shared soup via scalar-
# prefetched per-tile cluster-ID lists (`_tri_trace_pallas_soup`)
SHARED_SOUP_MIN_T = 16384

_SOUP_CLUSTER_OVERRIDE = None  # experiment hook: force the soup block size

# dense-mesh camera kernel body: "scalar" (SMEM scalar pages, default),
# "merged" (scalar pages, merged ray operands), "mx" (matmul/MXU),
# "wl" (flattened prefix-sum worklist). Defaults to the measured winner:
# on v5e at 23k tris/256 cams the MXU body is 156.7 ms vs scalar's 84.9
# in the same lane (its (8, 4·cluster) G-matrix payload is ~750 MB of HBM
# traffic per frame vs the scalar page's 236 MB — the matmul saves VPU
# time it then loses 2× over in payload bandwidth), and the worklist path
# is 642 ms (its 16-triangle cull granularity makes the XLA-side prepass
# + contiguous row gather dominate everything the dead-step removal
# saves). Both bodies stay: parity-tested, selectable for re-measurement.
_CAMSOUP_VARIANT = "scalar"


def default_tri_cap(n_tris: int) -> int:
    """Mesh-size-scaled default for the per-tile compaction ``cap``.

    Stage meshes are dominated by a few large wall/floor triangles, so small
    meshes keep the measured-optimal 256. Dense meshes (cluster-cull regime)
    scale the budget with mesh size — a fixed 256 would keep only 4 clusters
    and drop most of the image (52% wrong hits measured on a 5.7k-tri mesh).
    T//4 covers the typical occluded-interior visible fraction; overflow
    still degrades safely (nearest-first: far field → background). Override
    per sensor with ``tri_cap``; size exactly with :func:`cull_stats`."""
    if n_tris <= CLUSTER_CULL_MIN_T:
        return min(n_tris, 256)
    return min(n_tris, max(1024, -(-n_tris // 4 // CLUSTER) * CLUSTER))


def _morton3(x: np.ndarray) -> np.ndarray:
    """(N, 3) in [0,1] → 30-bit Morton codes (10 bits/axis)."""
    q = np.clip((x * 1023.0), 0, 1023).astype(np.uint32)

    def spread(v):
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    return (spread(q[:, 0]) | (spread(q[:, 1]) << 1)
            | (spread(q[:, 2]) << 2))


def pack_triangles(verts: np.ndarray, faces: np.ndarray,
                   pad_to: int = 8, return_order: bool = False):
    """(V, 3) + (F, 3) → (T, 9) rows [a | b | c], zero-padded (degenerate
    rows never intersect: det == 0). Large meshes (> ``CLUSTER_CULL_MIN_T``)
    are sorted by centroid Morton code and padded to whole clusters so the
    two-level cluster cull gets spatially tight ``CLUSTER``-triangle groups
    (triangle order is free to permute: hits min over all rows; per-face
    tables — UVs, materials — follow via ``return_order``, which also
    returns packed-row → original-face ids, −1 on padding rows)."""
    tris = verts[faces.reshape(-1)].reshape(-1, 9).astype(np.float32)
    t = len(tris)
    order = np.arange(t)
    if t > CLUSTER_CULL_MIN_T:
        cen = tris.reshape(-1, 3, 3).mean(1)
        lo, hi = cen.min(0), cen.max(0)
        norm = (cen - lo) / np.maximum(hi - lo, 1e-9)
        # ORIENTATION-AWARE Morton order: a 3-bit facing bucket (dominant
        # normal axis × sign) slots in below the top 12 spatial bits, so
        # clusters stay inside a coarse spatial cell but become
        # orientation-pure — without this, clusters straddling box corners
        # mix normals and the backface cone cull can't fire (measured on
        # the 23k garage: mixed clusters left only ~10% cull)
        v3 = tris.reshape(-1, 3, 3).astype(np.float64)
        n = np.cross(v3[:, 1] - v3[:, 0], v3[:, 2] - v3[:, 0])
        axis = np.argmax(np.abs(n), axis=1)
        sign = np.take_along_axis(n, axis[:, None], 1)[:, 0] < 0
        bucket = (axis * 2 + sign).astype(np.uint64)  # 6 facings
        m = _morton3(norm).astype(np.uint64)
        key = ((m >> 18) << 21) | (bucket << 18) | (m & ((1 << 18) - 1))
        order = np.argsort(key, kind="stable")
        tris = tris[order]
        pad_to = max(pad_to, CLUSTER)
    padded = -(-max(t, 1) // pad_to) * pad_to
    out = np.zeros((padded, 9), np.float32)
    out[:t] = tris
    if return_order:
        ids = np.full(padded, -1, np.int64)
        ids[:t] = order
        return out, ids
    return out


# ---------------------------------------------------------------------------
# XLA reference path
# ---------------------------------------------------------------------------


def _mt_one(tri: Array, o: Array, d: Array, max_depth: float
            ) -> Tuple[Array, Array]:
    """Möller–Trumbore: one triangle row (9,) vs rays (R, 3) → (t, n·̂)."""
    a, b, c = tri[0:3], tri[3:6], tri[6:9]
    e1 = b - a
    e2 = c - a
    pvec = jnp.cross(d, e2[None])  # (R, 3)
    det = jnp.sum(e1[None] * pvec, -1)
    inv = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
    tvec = o - a[None]
    u = jnp.sum(tvec * pvec, -1) * inv
    qvec = jnp.cross(tvec, e1[None])
    v = jnp.sum(d * qvec, -1) * inv
    t = jnp.sum(e2[None] * qvec, -1) * inv
    ok = ((jnp.abs(det) > 1e-9) & (u >= 0.0) & (v >= 0.0)
          & (u + v <= 1.0) & (t > 1e-4))
    return jnp.where(ok, t, BIG)


def tri_trace_xla(tris: Array, origins: Array, dirs: Array,
                  max_depth: float = 20.0) -> Tuple[Array, Array, Array]:
    """Brute force over all triangles. origins/dirs (S, R, 3);
    returns (t (S,R), hit (S,R), normal (S,R,3) — geometric, facing the
    ray)."""

    def per_scene(tr, o, d):
        ts = jax.vmap(lambda row: _mt_one(row, o, d, max_depth))(tr)  # (T, R)
        k = jnp.argmin(ts, axis=0)
        t = jnp.min(ts, axis=0)
        hit = t < max_depth
        rows = tr[k]  # (R, 9)
        n = jnp.cross(rows[:, 3:6] - rows[:, 0:3],
                      rows[:, 6:9] - rows[:, 0:3])
        n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-12)
        # orient against the ray so the IFT denominator n·d is negative-side
        n = jnp.where(jnp.sum(n * d, -1, keepdims=True) > 0, -n, n)
        return jnp.clip(t, 0.0, max_depth), hit, n, k.astype(jnp.int32)

    return jax.vmap(per_scene)(tris, origins, dirs)


# ---------------------------------------------------------------------------
# per-tile cull + compaction (XLA, gather-free — cull_compact's pattern)
# ---------------------------------------------------------------------------


def _apex_spread(origins_c: Array, S: int, n_tiles: int):
    """Per-tile mean ray origin (apex, (S, tiles, 3)) and the EXACT maximum
    origin distance from it (spread, (S, tiles)) — the sound radius for the
    occlusion lower bound (a half-AABB-diagonal under-bounds asymmetric
    multi-origin tiles: an origin can sit the full diagonal from the mean,
    letting the early-out skip a chunk that still owns the closest hit)."""
    o4 = origins_c.reshape(3, S, n_tiles, TILE)
    apex = o4.mean(-1)  # (3, S, tiles)
    spread = jnp.sqrt(
        jnp.sum((o4 - apex[..., None]) ** 2, axis=0).max(-1))
    return apex.transpose(1, 2, 0), spread


def _tile_planes(origins_c: Array, dirs_c: Array, S: int, n_tiles: int,
                 img_w: int):
    """Exact 4-plane camera wedge per tile (planes (S, tiles, 4, 3), apex
    (S, tiles, 3)) — valid when a tile is one camera's contiguous row
    block."""
    dt4 = dirs_c.reshape(3, S, n_tiles, TILE)
    corners = jnp.stack([
        dt4[..., 0], dt4[..., img_w - 1],
        dt4[..., TILE - 1], dt4[..., TILE - img_w],
    ], axis=-1).transpose(1, 2, 3, 0)  # (S, tiles, 4, 3)
    nxt = jnp.roll(corners, -1, axis=2)
    planes = jnp.cross(corners, nxt)
    centre = corners.sum(axis=2, keepdims=True)
    sign_fix = jnp.sign(jnp.sum(planes * centre, -1, keepdims=True))
    planes = planes * jnp.where(sign_fix == 0, 1.0, sign_fix)
    apex = origins_c.reshape(3, S, n_tiles, TILE)[..., 0].transpose(1, 2, 0)
    return planes, apex


def tri_cull_compact(tris: Array, origins_c: Array, dirs_c: Array,
                     max_depth: float, cap: int,
                     img_w: Optional[int] = None,
                     backface: bool = False):
    """(S, T, 9) triangles × (3, S, R) rays → per-tile compacted
    (S, tiles, cap, 9) + counts (S, tiles). AABB interval test, plus exact
    frustum planes when a tile is one camera's contiguous row block."""
    S, T = tris.shape[0], tris.shape[1]
    R = origins_c.shape[2]
    n_tiles = R // TILE
    o = origins_c.reshape(3, S, n_tiles, TILE)
    d = dirs_c.reshape(3, S, n_tiles, TILE)
    lo = (o.min(-1) + max_depth * jnp.minimum(d.min(-1), 0.0)).transpose(1, 2, 0)
    hi = (o.max(-1) + max_depth * jnp.maximum(d.max(-1), 0.0)).transpose(1, 2, 0)

    if T > CLUSTER_CULL_MIN_T and T % CLUSTER == 0:
        return _cluster_cull_compact(tris, origins_c, dirs_c, max_depth,
                                     cap, lo, hi, img_w, backface)

    v = tris.reshape(S, T, 3, 3)
    tlo = v.min(2)  # (S, T, 3)
    thi = v.max(2)
    active = jnp.all((lo[:, :, None] <= thi[:, None])
                     & (hi[:, :, None] >= tlo[:, None]), -1)  # (S, tiles, T)
    # drop zero-padded rows (degenerate at the origin could still overlap)
    nonzero = jnp.any(jnp.abs(tris) > 0, axis=-1)  # (S, T)
    active = active & nonzero[:, None]

    if img_w is not None and TILE % img_w == 0:
        planes, apex = _tile_planes(origins_c, dirs_c, S, n_tiles, img_w)
        # a triangle is visible unless ALL 3 verts are outside one plane
        rel = v[:, None] - apex[:, :, None, None]  # (S, tiles, T, 3verts, 3)
        dv = jnp.einsum(
            "stpc,stkvc->stpkv", planes, rel,
            precision=jax.lax.Precision.HIGHEST,
        )  # (S, tiles, 4, T, 3verts)
        vis = jnp.all(jnp.any(dv >= 0.0, axis=-1), axis=2)  # (S, tiles, T)
        active = active & vis

    if backface:
        # EXACT per-triangle test (`_cluster_activity` docstring): x on the
        # triangle's plane has n·x = n·a, so the cluster bound collapses to
        # max n·(o − a) = n·(apex − a) + |n|·spread — no cone, no AABB slop
        apex_bf, spread_bf = _apex_spread(origins_c, S, n_tiles)
        a_t = v[:, :, 0]                                     # (S, T, 3)
        n_t = jnp.cross(v[:, :, 1] - a_t, v[:, :, 2] - a_t)
        n_t = n_t / (jnp.linalg.norm(n_t, axis=-1, keepdims=True) + 1e-12)
        front = (jnp.sum(n_t[:, None] * (apex_bf[:, :, None] - a_t[:, None]),
                         -1) + spread_bf[..., None]) > 0.0
        active = active & front

    # distance-priority compaction: actives first, NEAREST first. A tile
    # whose visible count exceeds ``cap`` then drops its FARTHEST visible
    # triangles — mostly occluded — instead of arbitrary index-order tails
    # (measured on a 5.7k-tri mesh at cap 256: 51% of tiles overflow and
    # index-order tails give 1.4% wrong hits with up to 15 m depth error).
    apex, spread = _apex_spread(origins_c, S, n_tiles)
    centroid = v.mean(2)  # (S, T, 3)
    dist = jnp.linalg.norm(centroid[:, None] - apex[:, :, None], axis=-1)
    key = jnp.where(active, dist, jnp.inf)  # (S, tiles, T)
    order = jnp.argsort(key, axis=-1, stable=True)
    ids = order[:, :, :cap].astype(jnp.int32)  # slot → global triangle id
    onehot = (order[:, :, :cap, None] == jnp.arange(T)).astype(tris.dtype)
    out = jnp.einsum("stik,skc->stic", onehot, tris,
                     preferred_element_type=tris.dtype,
                     precision=jax.lax.Precision.HIGHEST)
    # per-slot conservative lower bound on any hit t from that triangle
    # (|d| = 1 ⇒ hit t ≥ euclidean distance): centroid distance minus the
    # triangle circumradius minus the tile's EXACT max origin-from-apex
    # radius — feeds the kernel's whole-tile occlusion early-out
    rad = jnp.linalg.norm(v - centroid[:, :, None], axis=-1).max(-1)
    lb_all = jnp.maximum(
        dist - rad[:, None] - spread[..., None], 0.0)
    lb_all = jnp.where(active, lb_all, BIG)
    # same one-hot matmul as the compaction (gather-free: take_along_axis
    # here was measured at +2.6 ms/frame-batch on the 360-tri scene)
    lb = jnp.einsum("stik,stk->sti", onehot, lb_all,
                    preferred_element_type=lb_all.dtype,
                    precision=jax.lax.Precision.HIGHEST)
    return out, active.sum(-1).astype(jnp.int32), lb, ids


def _cluster_activity(tris: Array, origins_c: Array, dirs_c: Array,
                      max_depth: float, lo: Array, hi: Array,
                      img_w: Optional[int], cluster: int = CLUSTER,
                      backface: bool = False):
    """Cluster-level visibility shared by both large-mesh prepasses:
    (active (S, tiles, C), apex-distance (S, tiles, C), per-cluster hit-t
    lower bound lb_all (S, tiles, C) — BIG where inactive).

    ``backface=True`` additionally culls clusters whose whole normal cone
    faces away from every origin in the tile — EXACT for watertight
    consistently-wound meshes (a backface there is always occluded by a
    frontface), and the same default the reference's GL rasteriser applies
    to habitat stages. Subdivided stage sheets are coplanar clusters
    (Morton packing keeps them together), so the cone test bites hard."""
    S, T = tris.shape[0], tris.shape[1]
    C = T // cluster
    n_tiles = lo.shape[1]
    v = tris.reshape(S, C, cluster, 3, 3)
    clo = v.min((2, 3))  # (S, C, 3) cluster AABBs
    chi = v.max((2, 3))
    # padding clusters are all-zero rows; a real cluster containing the
    # origin is indistinguishable, but its zero-rows never intersect anyway
    nonzero = jnp.any(jnp.abs(tris).reshape(S, C, -1) > 0, -1)  # (S, C)
    active = jnp.all((lo[:, :, None] <= chi[:, None])
                     & (hi[:, :, None] >= clo[:, None]), -1)  # (S, tiles, C)
    active = active & nonzero[:, None]

    if img_w is not None and TILE % img_w == 0:
        planes, apex = _tile_planes(origins_c, dirs_c, S, n_tiles, img_w)
        # conservative AABB-vs-wedge: centre distance + Σ|n|·half ≥ 0
        ccen = (clo + chi) * 0.5
        half = (chi - clo) * 0.5
        d_cen = jnp.einsum("stpc,skc->stpk", planes,
                           ccen, precision=jax.lax.Precision.HIGHEST) \
            - jnp.einsum("stpc,stc->stp", planes, apex,
                         precision=jax.lax.Precision.HIGHEST)[..., None]
        r_eff = jnp.einsum("stpc,skc->stpk", jnp.abs(planes), half,
                           precision=jax.lax.Precision.HIGHEST)
        vis = jnp.all(d_cen + r_eff >= 0.0, axis=2)  # (S, tiles, C)
        active = active & vis

    apex_t, spread = _apex_spread(origins_c, S, n_tiles)
    cen = (clo + chi) * 0.5
    dist = jnp.linalg.norm(cen[:, None] - apex_t[:, :, None], axis=-1)
    # conservative hit-t lower bound per cluster: centroid distance −
    # cluster half-diagonal − the tile's EXACT max origin-from-apex radius
    hd = jnp.linalg.norm((chi - clo) * 0.5, axis=-1)  # (S, C)

    if backface:
        a = v[..., 0, :]
        nt = jnp.cross(v[..., 1, :] - a, v[..., 2, :] - a)  # (S, C, k, 3)
        nt = nt / (jnp.linalg.norm(nt, axis=-1, keepdims=True) + 1e-12)
        nbar = nt.sum(2)
        nbar = nbar / (jnp.linalg.norm(nbar, axis=-1, keepdims=True)
                       + 1e-12)                              # (S, C, 3)
        # padding/degenerate rows have n̂ = 0 → cos 0 → sinθ = 1 → the
        # cone covers everything and the cluster is never culled (safe)
        cos_min = jnp.sum(nt * nbar[:, :, None], -1).min(2)  # (S, C)
        # sinθ = sqrt(1−cos²) bounds the cone only for half-angles ≤ 90°;
        # a cluster mixing opposing facings (cos_min < 0 — Morton facing-
        # bucket boundaries, 2×CLUSTER soup grouping) exceeds a hemisphere,
        # so force sinθ = 1 there (never cull such clusters)
        sin_max = jnp.where(
            cos_min <= 0.0, 1.0,
            jnp.sqrt(jnp.maximum(1.0 - cos_min * cos_min, 0.0)))
        d = apex_t[:, :, None] - cen[:, None]                # (S, tiles, C, 3)
        # a cluster can show a front face iff some (origin o, surface
        # point x, normal n in cone) has n·(o − x) > 0; with x on its
        # triangle's plane n·x = n·a, bounded by the AABB half-diagonal:
        # max n·(o − x) ≤ n̄·(apex − cen) + |apex − cen|·sinθ + spread + hd
        front = (jnp.sum(nbar[:, None] * d, -1)
                 + dist * sin_max[:, None]
                 + spread[..., None] + hd[:, None]) > 0.0
        active = active & front

    # exact apex→AABB distance: tighter than centroid − half-diagonal by up
    # to hd (measured on the 23k garage: early-out floor 28.2 → 25.7
    # chunks/tile, examples/_cull_stats.py). Conservative: any hit x lies in
    # the AABB, so t = |x−o| ≥ dist(o, AABB) ≥ dist(apex, AABB) − spread.
    gap = jnp.maximum(clo[:, None] - apex_t[:, :, None],
                      apex_t[:, :, None] - chi[:, None])
    d_aabb = jnp.linalg.norm(jnp.maximum(gap, 0.0), axis=-1)
    lb_all = jnp.maximum(d_aabb - spread[..., None], 0.0)
    lb_all = jnp.where(active, lb_all, BIG)
    return active, dist, lb_all


def _cluster_cull_compact(tris: Array, origins_c: Array, dirs_c: Array,
                          max_depth: float, cap: int, lo: Array, hi: Array,
                          img_w: Optional[int], backface: bool = False):
    """Two-level cull for large meshes: ``pack_triangles`` Morton-sorted the
    rows, so consecutive ``CLUSTER``-triangle groups are spatially tight.
    Cull/sort/compact whole clusters (64× smaller sort and one-hot matmul
    than per-triangle) and hand the kernel ``cap//CLUSTER`` nearest visible
    clusters; counts are cluster-granular, which the chunk-skip consumes
    exactly (CLUSTER == one 64-row kernel chunk)."""
    S, T = tris.shape[0], tris.shape[1]
    C = T // CLUSTER
    n_tiles = lo.shape[1]
    active, dist, lb_all = _cluster_activity(
        tris, origins_c, dirs_c, max_depth, lo, hi, img_w,
        backface=backface)

    cap_c = max(1, min(cap, T) // CLUSTER)
    key = jnp.where(active, dist, jnp.inf)
    order = jnp.argsort(key, axis=-1, stable=True)
    onehot = (order[:, :, :cap_c, None] == jnp.arange(C)).astype(tris.dtype)
    grouped = tris.reshape(S, C, CLUSTER * 9)
    out = jnp.einsum("stik,skc->stic", onehot, grouped,
                     preferred_element_type=tris.dtype,
                     precision=jax.lax.Precision.HIGHEST)
    out = out.reshape(S, n_tiles, cap_c * CLUSTER, 9)
    counts = (active.sum(-1) * CLUSTER).astype(jnp.int32)
    lb_c = jnp.einsum("stik,stk->sti", onehot, lb_all,
                      preferred_element_type=lb_all.dtype,
                      precision=jax.lax.Precision.HIGHEST)
    lb = jnp.repeat(lb_c, CLUSTER, axis=-1)
    ids = (order[:, :, :cap_c, None].astype(jnp.int32) * CLUSTER
           + jnp.arange(CLUSTER, dtype=jnp.int32)).reshape(
        S, n_tiles, cap_c * CLUSTER)
    return out, counts, lb, ids


def _cluster_ids_prepass(tris: Array, origins_c: Array, dirs_c: Array,
                         max_depth: float, cap: int,
                         img_w: Optional[int], backface: bool = False):
    """Huge-mesh prepass: per-tile CLUSTER-ID lists instead of a compacted
    triangle buffer. The kernel's triangle block then DMAs straight out of
    the shared (S, C, CLUSTER, 9) soup via a scalar-prefetched index map —
    memory stays O(T) where per-tile compaction would need
    tiles × cap × 36 B (≈1 GB at 100k triangles).

    Returns (cids (S, tiles, cap_c) int32, counts, lb_c (S, tiles, cap_c))."""
    S, T = tris.shape[0], tris.shape[1]
    R = origins_c.shape[2]
    o = origins_c.reshape(3, S, R // TILE, TILE)
    d = dirs_c.reshape(3, S, R // TILE, TILE)
    lo = (o.min(-1) + max_depth * jnp.minimum(d.min(-1), 0.0)).transpose(
        1, 2, 0)
    hi = (o.max(-1) + max_depth * jnp.maximum(d.max(-1), 0.0)).transpose(
        1, 2, 0)
    # GROUP consecutive Morton clusters into bigger kernel blocks: each
    # (tile, chunk) grid step costs ~0.5 µs of Mosaic dispatch whether it
    # executes or skips, and at 23k triangles (90 chunks × 1024 tiles)
    # that dispatch was the DOMINANT cost (~45 of 68 µs/tile measured).
    # Bigger blocks trade cull granularity (AABB slop grows) for 2-4×
    # fewer grid steps — with the cheap signed-volume body the trade wins
    # well past the old 128 pairing rule.
    # Swept on v5e (23k garage, backface on, SV body): 64 → 70.6 ms,
    # 128 → 60.9 ms, 256 → 68.0 ms (cull slop overtakes the step saving)
    cluster = _SOUP_CLUSTER_OVERRIDE or (
        2 * CLUSTER if T % (2 * CLUSTER) == 0 else CLUSTER)
    while T % cluster:
        cluster //= 2
    active, dist, lb_all = _cluster_activity(
        tris, origins_c, dirs_c, max_depth, lo, hi, img_w, cluster=cluster,
        backface=backface)
    cap_c = max(1, min(cap, T) // cluster)
    key = jnp.where(active, dist, jnp.inf)
    order = jnp.argsort(key, axis=-1, stable=True)
    cids = order[:, :, :cap_c].astype(jnp.int32)
    counts = active.sum(-1).astype(jnp.int32)
    # gather, not one-hot: a (tiles, cap_c, C) one-hot costs ~2 GB at 92k
    # triangles; the (tiles, cap_c) gather output is tiny and this prepass
    # runs once per frame batch over cluster-granular arrays
    lb_c = jnp.take_along_axis(lb_all, cids, axis=-1)
    return cids, counts, lb_c, cluster


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _normals_from_gid(tris: Array, gid: Array, dirs_c: Array,
                      hit: Array) -> Array:
    """Winning-triangle geometric normals by ONE XLA gather — cheaper
    than carrying three per-triangle ``where`` selects through the
    kernels. Oriented against the ray; zero on misses."""
    S, R = gid.shape
    a = tris[..., 0:3]
    n_tri = jnp.cross(tris[..., 3:6] - a, tris[..., 6:9] - a)  # (S, T, 3)
    n = jnp.take_along_axis(n_tri, gid[..., None], axis=1)
    n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-12)
    d_pm = jnp.transpose(dirs_c, (1, 2, 0))
    n = jnp.where(jnp.sum(n * d_pm, -1, keepdims=True) > 0, -n, n)
    return jnp.where(hit[..., None], n, 0.0)


TRI_UNROLL = 64  # rows per grid-chunk: the Mosaic program size is bounded
# by this unrolled body — a fully-unrolled 256-row kernel was observed to
# compile for >25 min, while small chunks iterated over a SEQUENTIAL minor
# grid dimension (output blocks revisited; all SMEM indices static) keep
# compile in seconds at identical per-row flops. Swept on v5e (360-tri
# scene, 1024 tiles): 16→6.9 ms, 32→5.5, 64→5.3 (best), 128→5.4


def _tri_kernel(nch_ref, lb_ref, tri_ref, ox_ref, oy_ref, oz_ref,
                dx_ref, dy_ref, dz_ref,
                t_ref, hit_ref, g_ref,
                *, chunk: int, n_chunks: int, max_depth: float,
                shared_origin: bool):
    """One (scene, tile, chunk) grid step: intersect the tile's rays with
    this chunk's ``chunk`` compacted triangles, folding the running min-t
    and the winning SLOT index (chunk·``chunk`` + row) into the revisited
    output blocks. The caller maps slots to global triangle ids through
    the compaction order and gathers normals/materials with one XLA
    gather — three per-triangle ``where`` selects and two whole output
    streams cheaper than carrying nx/ny/nz through the kernel.

    Two whole-tile skips bound the cost by the tile's TRUE workload:
    * count skip — compaction sorts actives first, so chunks past the
      tile's visible count are pure padding (``nch_ref`` also clamps the
      triangle block's index map: dead steps revisit the previous block
      and cost no DMA);
    * occlusion early-out — chunks are distance-sorted and ``lb_ref``
      carries a conservative lower bound on any hit t from this chunk;
      once every ray's current best (clamped to ``max_depth``) is closer,
      the chunk cannot change any pixel.
    The last chunk finalises t (clip) and the hit mask."""
    si, ti = pl.program_id(0), pl.program_id(1)
    ci = pl.program_id(2)

    @pl.when(ci == 0)
    def _init():
        t_ref[0, 0] = jnp.full((ROWS, LANES), BIG, jnp.float32)
        g_ref[0, 0] = jnp.zeros((ROWS, LANES), jnp.float32)

    worst = jnp.minimum(jnp.max(t_ref[0, 0]), max_depth)

    @pl.when((ci < nch_ref[si, ti])
             & (lb_ref[si, ti * n_chunks + ci] < worst))
    def _body():
        dx, dy, dz = dx_ref[0, 0], dy_ref[0, 0], dz_ref[0, 0]
        if not shared_origin:
            ox, oy, oz = ox_ref[0, 0], oy_ref[0, 0], oz_ref[0, 0]
        base = (ci * chunk).astype(jnp.float32)
        tbest = t_ref[0, 0]
        gbest = g_ref[0, 0]
        for j in range(chunk):
            def Tr(c):
                return tri_ref[0, 0, 0, j, c]

            if shared_origin:
                # camera tiles: one origin per tile ⇒ Möller–Trumbore is
                # LINEAR in d. The payload rows are SIGNED-VOLUME
                # coefficients (`_sv_pages` algebra): wᵢ = d·gᵢ are the
                # three edge volumes, a hit needs them same-signed, and
                # t = kt/(w0+w1+w2) — 9 FMAs + 3 sign products per
                # triangle vs classic MT's ~45 vector ops (computing the
                # crosses in-kernel was measured scalar-bound)
                w0 = dx * Tr(0) + dy * Tr(1) + dz * Tr(2)
                w1 = dx * Tr(3) + dy * Tr(4) + dz * Tr(5)
                w2 = dx * Tr(6) + dy * Tr(7) + dz * Tr(8)
                wsum = w0 + w1 + w2
                ok = ((w0 * w1 >= 0.0) & (w0 * w2 >= 0.0)
                      & (w1 * w2 >= 0.0))
                # W == 0 / all-zero rows resolve through IEEE: tk = ±inf
                # or NaN never passes (tk < tbest) / (tk > 1e-4)
                tk = Tr(9) * (1.0 / wsum)
                ok = ok & (tk > 1e-4)
            else:
                ax, ay, az = Tr(0), Tr(1), Tr(2)
                e1x, e1y, e1z = Tr(3) - ax, Tr(4) - ay, Tr(5) - az
                e2x, e2y, e2z = Tr(6) - ax, Tr(7) - ay, Tr(8) - az
                # pvec = d × e2 (e2 scalar)
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv = 1.0 / jnp.where(jnp.abs(det) > 1e-9, det, 1.0)
                okd = jnp.abs(det) > 1e-9
                tx, ty, tz = ox - ax, oy - ay, oz - az
                u = (tx * px + ty * py + tz * pz) * inv
                # qvec = tvec × e1
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                vv = (dx * qx + dy * qy + dz * qz) * inv
                tk = (e2x * qx + e2y * qy + e2z * qz) * inv
                ok = (okd & (u >= 0.0) & (vv >= 0.0)
                      & (u + vv <= 1.0) & (tk > 1e-4))
            tk = jnp.where(ok, tk, BIG)
            better = tk < tbest
            gbest = jnp.where(better, base + float(j), gbest)
            tbest = jnp.where(better, tk, tbest)

        t_ref[0, 0] = tbest
        g_ref[0, 0] = gbest

    @pl.when(ci == n_chunks - 1)
    def _finalise():
        t = jnp.clip(t_ref[0, 0], 0.0, max_depth)
        t_ref[0, 0] = t
        hit_ref[0, 0] = (t < max_depth).astype(jnp.float32)


def tri_trace_pallas(tris: Array, origins_c: Array, dirs_c: Array,
                     max_depth: float = 20.0, cap: int = 256,
                     img_w: Optional[int] = None,
                     cam_rays: Optional[int] = None,
                     backface: bool = False
                     ) -> Tuple[Array, Array, Array]:
    """(S, T, 9) × (3, S, R) → (t, hit, normal (S, R, 3)). R % 1024 == 0.

    ``cam_rays`` (H·W per camera, when rays arrive as whole row-major
    cameras) unlocks two dense-mesh optimisations: square pixel-block
    tiling (tighter per-tile frusta) and the per-camera signed-volume
    payload (`_tri_trace_pallas_camsoup`) for T > ``SHARED_SOUP_MIN_T``."""
    _, S, R = origins_c.shape
    if R % TILE:
        raise ValueError(f"rays per scene ({R}) must be a multiple of {TILE}")
    tiles = R // TILE
    cap = min(cap, tris.shape[1])
    T = tris.shape[1]
    whole_cams = (img_w is not None and cam_rays is not None
                  and cam_rays % TILE == 0 and R % cam_rays == 0
                  and cam_rays % img_w == 0)
    # square pixel blocks: repack each camera's row-major rays into
    # (bh, bw) blocks so a tile's frustum is a compact square wedge
    # instead of a full-width strip (measured on the 23k garage: visible
    # clusters/tile mean 58.6 → 53.3)
    if whole_cams and img_w > 32 and img_w % 32 == 0:
        H, bw = cam_rays // img_w, 32
        bh = TILE // bw
        if H % bh == 0:
            cams = R // cam_rays
            hb, wb = H // bh, img_w // bw

            def fwd(x):
                x = x.reshape(3, S, cams, hb, bh, wb, bw)
                return x.transpose(0, 1, 2, 3, 5, 4, 6).reshape(3, S, R)

            t, hit, n, gid = tri_trace_pallas(
                tris, fwd(origins_c), fwd(dirs_c), max_depth, cap,
                bw, cam_rays, backface)

            def inv(y):
                y = y.reshape(S, cams, hb, wb, bh, bw, -1)
                return y.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
                    S, R, -1)

            return (inv(t[..., None])[..., 0], inv(hit[..., None])[..., 0],
                    inv(n), inv(gid[..., None])[..., 0])
    if T > SHARED_SOUP_MIN_T and T % CLUSTER == 0:
        if whole_cams:
            fn = {"mx": _tri_trace_pallas_camsoup_mx,
                  "merged": _tri_trace_pallas_camsoup_v2,
                  "scalar": _tri_trace_pallas_camsoup,
                  "wl": _tri_trace_pallas_worklist}[_CAMSOUP_VARIANT]
            return fn(
                tris, origins_c, dirs_c, max_depth, cap, img_w, cam_rays,
                backface)
        return _tri_trace_pallas_soup(tris, origins_c, dirs_c, max_depth,
                                      cap, img_w, backface)
    sg = jax.lax.stop_gradient
    tric, counts, lb, ids = tri_cull_compact(tris, sg(origins_c),
                                             sg(dirs_c), max_depth, cap,
                                             img_w=img_w, backface=backface)
    cap = tric.shape[2]  # effective: cluster path rounds to whole clusters
    counts = jnp.minimum(counts, cap)
    # large caps prefer bigger chunks (fewer ~0.8 µs grid steps); small caps
    # prefer the finer count-skip granularity. Swept on v5e with the
    # linear-form body: cap 256 → 64 (55.9k vs 49.4k env steps/s at 128);
    # cap 4096 → 128 (38.8 vs 46.8 ms at 64)
    chunk = min(cap, TRI_UNROLL if cap <= 1024 else 2 * TRI_UNROLL)
    if cap % chunk:
        # whole chunks only — pad with degenerate (never-hitting) rows
        pad = chunk - cap % chunk
        tric = jnp.pad(tric, ((0, 0), (0, 0), (0, pad), (0, 0)))
        lb = jnp.pad(lb, ((0, 0), (0, 0), (0, pad)), constant_values=BIG)
        ids = jnp.pad(ids, ((0, 0), (0, 0), (0, pad)))
        cap += pad
    n_chunks = cap // chunk
    # chunks needed per tile (count skip) + per-chunk hit-t lower bound
    # (occlusion early-out) — scalar-prefetch operands
    nch = jnp.maximum((counts + chunk - 1) // chunk, 1).astype(jnp.int32)
    # scalar-prefetch SMEM arrays pad their MINOR dim to the 128-lane tile —
    # keep the large axis minor or a (S, tiles, 4ish) array costs ~0.5 MB of
    # the 1 MB SMEM (observed OOM)
    lbc = lb.reshape(S, tiles, n_chunks, chunk).min(-1).reshape(
        S, tiles * n_chunks)
    # camera tiles (img_w given) have ONE ray origin per tile — the kernel
    # then runs the shared-origin linear form on per-triangle coefficients
    # computed HERE (scalar crosses in-kernel were measured scalar-core-
    # bound; see _tri_kernel)
    shared_origin = img_w is not None
    if shared_origin:
        # SIGNED-VOLUME payload (`_sv_pages` algebra, per-tile origin)
        o_t = sg(origins_c).reshape(3, S, tiles, TILE)[..., 0]
        o4 = o_t.transpose(1, 2, 0)[:, :, None]      # (S, tiles, 1, 3)
        a_ = tric[..., 0:3] - o4
        b_ = tric[..., 3:6] - o4
        c_ = tric[..., 6:9] - o4
        g0 = jnp.cross(b_, c_)
        g1 = jnp.cross(c_, a_)
        g2 = jnp.cross(a_, b_)
        kt = jnp.sum(a_ * g0, -1, keepdims=True)
        tric = jnp.concatenate([g0, g1, g2, kt], -1)  # (S, tiles, cap, 10)
    width = tric.shape[-1]
    tric = tric.reshape(S, tiles, n_chunks, chunk, width)

    def comp(x, c):
        return x[c].reshape(S, tiles, ROWS, LANES)

    # ray/out blocks ignore the minor chunk grid dim — outputs are
    # revisited across chunks (sequential TPU grid) and carry the running
    # min-t/normal until the final chunk writes the finished tile
    ray_spec = pl.BlockSpec((1, 1, ROWS, LANES),
                            lambda s, i, c, nch, lbc: (s, i, 0, 0),
                            memory_space=pltpu.VMEM)
    # the triangle block's index is CLAMPED to the tile's needed chunks:
    # steps past the count revisit the previous block, so a skipped grid
    # step costs no DMA (measured ~0.8 µs/step with the naive index map —
    # that was ~2.5 ms of a 5.3 ms small-scene frame)
    tri_spec = pl.BlockSpec(
        (1, 1, 1, chunk, width),
        lambda s, i, c, nch, lbc: (s, i, jnp.minimum(c, nch[s, i] - 1),
                                   0, 0),
        memory_space=pltpu.SMEM)
    out_sds = jax.ShapeDtypeStruct((S, tiles, ROWS, LANES), jnp.float32)

    tric, nch, lbc = jax.lax.optimization_barrier((tric, nch, lbc))
    kernel = functools.partial(_tri_kernel, chunk=chunk,
                               n_chunks=n_chunks, max_depth=max_depth,
                               shared_origin=shared_origin)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S, tiles, n_chunks),
        in_specs=[
            tri_spec,
            ray_spec, ray_spec, ray_spec,
            ray_spec, ray_spec, ray_spec,
        ],
        out_specs=[ray_spec] * 3,
    )
    t, hit, slot = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[out_sds] * 3,
    )(nch, lbc, tric, comp(origins_c, 0), comp(origins_c, 1),
      comp(origins_c, 2), comp(dirs_c, 0), comp(dirs_c, 1),
      comp(dirs_c, 2))

    t = t.reshape(S, R)
    hit = hit.reshape(S, R) > 0.5
    # slot → global triangle id through the compaction order
    slot = slot.reshape(S, tiles, TILE).astype(jnp.int32)
    gid = jnp.take_along_axis(ids, slot, axis=2).reshape(S, R)
    n = _normals_from_gid(tris, gid, dirs_c, hit)
    return t, hit, n, gid


def _tri_kernel_soup(nch_ref, lb_ref, cid_ref, tri_ref, *rest,
                     **static_kw):
    """Shared-soup wrapper: cid_ref is consumed by the index maps only."""
    return _tri_kernel(nch_ref, lb_ref, tri_ref, *rest, **static_kw)


def _tri_trace_pallas_soup(tris: Array, origins_c: Array, dirs_c: Array,
                           max_depth: float, cap: int,
                           img_w: Optional[int], backface: bool = False
                           ) -> Tuple[Array, Array, Array]:
    """Huge-mesh path (T > ``SHARED_SOUP_MIN_T``): the kernel's triangle
    block is indexed by a scalar-prefetched per-tile cluster-ID list, so
    triangles are DMA'd straight from the shared Morton-ordered soup — no
    per-tile compacted buffer (memory O(T), not O(tiles × cap)). Same
    count-skip and occlusion early-out contracts as the compacted path;
    the body is classic per-ray Möller–Trumbore (per-tile coefficient
    payloads would need a per-tile buffer; camera workloads take
    `_tri_trace_pallas_camsoup` instead)."""
    _, S, R = origins_c.shape
    T = tris.shape[1]
    tiles = R // TILE
    sg = jax.lax.stop_gradient
    cids, counts, lb_c, cluster = _cluster_ids_prepass(
        tris, sg(origins_c), sg(dirs_c), max_depth, cap, img_w, backface)
    n_chunks = cids.shape[2]
    nch = jnp.clip(counts, 1, n_chunks).astype(jnp.int32)
    soup = tris.reshape(S, T // cluster, 1, cluster, 9)

    # the per-(tile, chunk) prefetch arrays live whole in SMEM (1 MB): at
    # cap_c 257 × 1024 tiles, cids + lbc are 1.05 MB EACH. Split the call
    # into equal tile groups — identical shapes, so ONE compiled kernel is
    # reused — keeping each group's arrays ≤ ~256 KB
    groups = 1
    while S * (tiles // groups) * n_chunks * 4 > 256 * 1024 and groups < tiles:
        groups += 1
        while tiles % groups:
            groups += 1
    gt = tiles // groups

    def comp(x, c):
        return x[c].reshape(S, tiles, ROWS, LANES)

    ray_spec = pl.BlockSpec((1, 1, ROWS, LANES),
                            lambda s, i, c, nch, lbc, cid: (s, i, 0, 0),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(
        (1, 1, 1, cluster, 9),
        lambda s, i, c, nch, lbc, cid: (
            s,
            cid[s, i * n_chunks + jnp.minimum(c, nch[s, i] - 1)],
            0, 0, 0),
        memory_space=pltpu.SMEM)
    out_sds = jax.ShapeDtypeStruct((S, gt, ROWS, LANES), jnp.float32)

    soup, nch, lb_c, cids = jax.lax.optimization_barrier(
        (soup, nch, lb_c, cids))
    kernel = functools.partial(_tri_kernel_soup, chunk=cluster,
                               n_chunks=n_chunks, max_depth=max_depth,
                               shared_origin=False)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S, gt, n_chunks),
        in_specs=[
            tri_spec,
            ray_spec, ray_spec, ray_spec,
            ray_spec, ray_spec, ray_spec,
        ],
        out_specs=[ray_spec] * 3,
    )
    call = pl.pallas_call(kernel, grid_spec=grid_spec,
                          out_shape=[out_sds] * 3)
    parts = []
    for g in range(groups):
        tl = slice(g * gt, (g + 1) * gt)
        # large axis minor: SMEM pads the minor dim to the 128-lane tile
        parts.append(call(
            nch[:, tl], lb_c[:, tl].reshape(S, gt * n_chunks),
            cids[:, tl].reshape(S, gt * n_chunks), soup,
            comp(origins_c, 0)[:, tl], comp(origins_c, 1)[:, tl],
            comp(origins_c, 2)[:, tl], comp(dirs_c, 0)[:, tl],
            comp(dirs_c, 1)[:, tl], comp(dirs_c, 2)[:, tl]))
    t, hit, slot = (jnp.concatenate(x, axis=1) for x in zip(*parts))

    t = t.reshape(S, R)
    hit = hit.reshape(S, R) > 0.5
    # slot = position in the tile's cluster-ID list → global triangle id
    slot = slot.reshape(S, tiles, TILE).astype(jnp.int32)
    cid_of = jnp.take_along_axis(cids, slot // cluster, axis=2)
    gid = (cid_of * cluster + slot % cluster).reshape(S, R)
    n = _normals_from_gid(tris, gid, dirs_c, hit)
    return t, hit, n, gid


# ---------------------------------------------------------------------------
# camsoup kernel — dense meshes with whole cameras per tile
# ---------------------------------------------------------------------------
#
# A manually double-buffered `while_loop` streaming kernel (dynamic per-tile
# block walk, HBM→SMEM `make_async_copy`, suffix-min exit) was built and
# measured SLOWER than grid dispatch: 123 vs 84 ms at 23k triangles, 250 vs
# 226 ms at 92k — Mosaic's BlockSpec pipeline overlaps the per-chunk DMA far
# better than hand-rolled prefetch, and the `fori_loop` triangle walk it
# forced (a fully unrolled body takes Mosaic >200 s to lower inside
# `while_loop`) lost the unrolled body's ILP. What survives from that
# experiment is its PAYLOAD: per-(camera, triangle) coefficients that make
# the per-ray test 3 dot products.


def _sv_pages(tris: Array, cam_o: Array, cluster: int) -> Array:
    """Per-camera SIGNED-VOLUME ray-triangle coefficients.

    tris (S, T, 9) × camera origins (S, cams, 3) → (S, cams, C, cluster,
    10) pages ``[g0 | g1 | g2 | kt]`` where, with a' = a − o etc.,
    g0 = b'×c', g1 = c'×a', g2 = a'×b', kt = a'·g0. A ray d then hits iff
    the three volumes wᵢ = d·gᵢ share a sign, at t = kt / (w0+w1+w2) —
    9 FMAs + 3 sign products per triangle instead of classic
    Möller–Trumbore's ~45 vector ops (the same count as the barycentric
    linear form but with the u+v≤1 test folded into the precompute:
    w0 plays 1−u−v). Only the o×edge crosses are per-camera work."""
    S, T = tris.shape[0], tris.shape[1]
    a, b, c = tris[..., 0:3], tris[..., 3:6], tris[..., 6:9]
    m0, e0 = jnp.cross(b, c), b - c
    m1, e1 = jnp.cross(c, a), c - a
    m2, e2 = jnp.cross(a, b), a - b
    o = cam_o[:, :, None]                       # (S, cams, 1, 3)
    g0 = m0[:, None] + jnp.cross(o, e0[:, None])
    g1 = m1[:, None] + jnp.cross(o, e1[:, None])
    g2 = m2[:, None] + jnp.cross(o, e2[:, None])
    kt = jnp.sum((a[:, None] - o) * g0, -1)
    pages = jnp.concatenate([g0, g1, g2, kt[..., None]], -1)
    return pages.reshape(S, cam_o.shape[1], T // cluster, cluster, 10)


def _tri_kernel_camsoup(nch_ref, lb_ref, cid_ref, pg_ref,
                        dx_ref, dy_ref, dz_ref,
                        t_ref, hit_ref, g_ref,
                        *, chunk: int, n_chunks: int, max_depth: float,
                        cluster: int):
    """Signed-volume body over per-camera coefficient pages. Same
    count-skip + occlusion early-out contracts as `_tri_kernel`; carries
    the winning GLOBAL triangle id (cluster id × cluster + row) instead of
    per-triangle normal selects — the caller reconstructs normals with one
    XLA gather, saving two selects per triangle and two output streams."""
    si, ti = pl.program_id(0), pl.program_id(1)
    ci = pl.program_id(2)

    @pl.when(ci == 0)
    def _init():
        t_ref[0, 0] = jnp.full((ROWS, LANES), BIG, jnp.float32)
        g_ref[0, 0] = jnp.zeros((ROWS, LANES), jnp.float32)

    worst = jnp.minimum(jnp.max(t_ref[0, 0]), max_depth)

    @pl.when((ci < nch_ref[si, ti])
             & (lb_ref[si, ti * n_chunks + ci] < worst))
    def _body():
        dx, dy, dz = dx_ref[0, 0], dy_ref[0, 0], dz_ref[0, 0]
        cid = cid_ref[si, ti * n_chunks + ci]
        base = (cid * cluster).astype(jnp.float32)
        tbest = t_ref[0, 0]
        gbest = g_ref[0, 0]
        for j in range(chunk):
            def Pg(c):
                return pg_ref[0, 0, 0, j, c]

            w0 = dx * Pg(0) + dy * Pg(1) + dz * Pg(2)
            w1 = dx * Pg(3) + dy * Pg(4) + dz * Pg(5)
            w2 = dx * Pg(6) + dy * Pg(7) + dz * Pg(8)
            wsum = w0 + w1 + w2
            # same-sign test; all-zero volumes (ray through a vertex edge
            # case or W = 0 parallel rays) resolve through IEEE below:
            # tk = ±inf or NaN never passes (tk < tbest)
            ok = ((w0 * w1 >= 0.0) & (w0 * w2 >= 0.0)
                  & (w1 * w2 >= 0.0))
            tk = Pg(9) * (1.0 / wsum)
            ok = ok & (tk > 1e-4)
            tk = jnp.where(ok, tk, BIG)
            better = tk < tbest
            gbest = jnp.where(better, base + float(j), gbest)
            tbest = jnp.where(better, tk, tbest)
        t_ref[0, 0] = tbest
        g_ref[0, 0] = gbest

    @pl.when(ci == n_chunks - 1)
    def _finalise():
        t = jnp.clip(t_ref[0, 0], 0.0, max_depth)
        t_ref[0, 0] = t
        hit_ref[0, 0] = (t < max_depth).astype(jnp.float32)


def _tri_kernel_camsoup2(nch_ref, lb_ref, cid_ref, pg_ref, d_ref, out_ref,
                         *, chunk: int, n_chunks: int, max_depth: float,
                         cluster: int):
    """Merged-operand variant of `_tri_kernel_camsoup`: the three ray-
    direction streams arrive as ONE (3, ROWS, LANES) block and t/gid leave
    as ONE (2, ROWS, LANES) block (hit is derived outside as t < max_depth).
    Rationale: each grid step pays a scalar-core prologue that evaluates
    EVERY operand's index map (SMEM loads + arithmetic + revisit checks);
    at 45-180 chunks x 1024 tiles that bookkeeping — not the intersection
    math — was the measured wall (~0.5 us/step). 3 block operands instead
    of 7 cuts the prologue roughly in half."""
    si, ti = pl.program_id(0), pl.program_id(1)
    ci = pl.program_id(2)

    @pl.when(ci == 0)
    def _init():
        out_ref[0, 0, 0] = jnp.full((ROWS, LANES), BIG, jnp.float32)
        out_ref[0, 0, 1] = jnp.zeros((ROWS, LANES), jnp.float32)

    worst = jnp.minimum(jnp.max(out_ref[0, 0, 0]), max_depth)

    @pl.when((ci < nch_ref[si, ti])
             & (lb_ref[si, ti * n_chunks + ci] < worst))
    def _body():
        dx, dy, dz = d_ref[0, 0, 0], d_ref[0, 0, 1], d_ref[0, 0, 2]
        cid = cid_ref[si, ti * n_chunks + ci]
        base = (cid * cluster).astype(jnp.float32)
        tbest = out_ref[0, 0, 0]
        gbest = out_ref[0, 0, 1]
        for j in range(chunk):
            def Pg(c):
                return pg_ref[0, 0, 0, j, c]

            w0 = dx * Pg(0) + dy * Pg(1) + dz * Pg(2)
            w1 = dx * Pg(3) + dy * Pg(4) + dz * Pg(5)
            w2 = dx * Pg(6) + dy * Pg(7) + dz * Pg(8)
            wsum = w0 + w1 + w2
            ok = ((w0 * w1 >= 0.0) & (w0 * w2 >= 0.0)
                  & (w1 * w2 >= 0.0))
            tk = Pg(9) * (1.0 / wsum)
            ok = ok & (tk > 1e-4)
            tk = jnp.where(ok, tk, BIG)
            better = tk < tbest
            gbest = jnp.where(better, base + float(j), gbest)
            tbest = jnp.where(better, tk, tbest)
        out_ref[0, 0, 0] = tbest
        out_ref[0, 0, 1] = gbest

    @pl.when(ci == n_chunks - 1)
    def _finalise():
        out_ref[0, 0, 0] = jnp.clip(out_ref[0, 0, 0], 0.0, max_depth)


def _tri_trace_pallas_camsoup(tris: Array, origins_c: Array, dirs_c: Array,
                              max_depth: float, cap: int, img_w: int,
                              cam_rays: int, backface: bool = False
                              ) -> Tuple[Array, Array, Array]:
    """Dense-mesh path when tiles hold whole cameras (``cam_rays`` a
    multiple of ``TILE``): the shared-soup structure (per-tile scalar-
    prefetched cluster-ID lists, O(T) memory) but with per-CAMERA
    signed-volume coefficient pages (`_sv_pages`) instead of raw
    triangles — ~2.3× fewer vector ops per triangle than the classic
    Möller–Trumbore body. Payload memory is O(cams × T) (≈240 MB at 256
    cams × 23k triangles), rebuilt per frame (bandwidth-bound, ~1 ms)."""
    _, S, R = origins_c.shape
    T = tris.shape[1]
    tiles = R // TILE
    tpc = cam_rays // TILE  # tiles per camera
    sg = jax.lax.stop_gradient
    cids, counts, lb_c, cluster = _cluster_ids_prepass(
        tris, sg(origins_c), sg(dirs_c), max_depth, cap, img_w, backface)
    n_chunks = cids.shape[2]
    nch = jnp.clip(counts, 1, n_chunks).astype(jnp.int32)
    cams = R // cam_rays
    cam_o = sg(origins_c).reshape(3, S, cams, cam_rays)[..., 0]
    pages = _sv_pages(tris, cam_o.transpose(1, 2, 0), cluster)

    # group tiles to keep the scalar-prefetch arrays ≤ ~256 KB of SMEM;
    # groups must hold whole cameras so the payload slices cleanly
    groups = 1
    while S * (tiles // groups) * n_chunks * 4 > 256 * 1024 \
            and groups < tiles // tpc:
        groups += 1
        while (tiles // tpc) % groups:
            groups += 1
    gt = tiles // groups
    gc = cams // groups

    def comp(x, c):
        return x[c].reshape(S, tiles, ROWS, LANES)

    ray_spec = pl.BlockSpec((1, 1, ROWS, LANES),
                            lambda s, i, c, nch, lbc, cid: (s, i, 0, 0),
                            memory_space=pltpu.VMEM)
    pg_spec = pl.BlockSpec(
        (1, 1, 1, cluster, 10),
        lambda s, i, c, nch, lbc, cid: (
            s, i // tpc,
            cid[s, i * n_chunks + jnp.minimum(c, nch[s, i] - 1)],
            0, 0),
        memory_space=pltpu.SMEM)
    out_sds = jax.ShapeDtypeStruct((S, gt, ROWS, LANES), jnp.float32)

    pages, nch, lb_c, cids = jax.lax.optimization_barrier(
        (pages, nch, lb_c, cids))
    kernel = functools.partial(_tri_kernel_camsoup, chunk=cluster,
                               n_chunks=n_chunks, max_depth=max_depth,
                               cluster=cluster)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S, gt, n_chunks),
        in_specs=[pg_spec, ray_spec, ray_spec, ray_spec],
        out_specs=[ray_spec] * 3,
    )
    call = pl.pallas_call(kernel, grid_spec=grid_spec,
                          out_shape=[out_sds] * 3)
    parts = []
    for g in range(groups):
        tl = slice(g * gt, (g + 1) * gt)
        parts.append(call(
            nch[:, tl], lb_c[:, tl].reshape(S, gt * n_chunks),
            cids[:, tl].reshape(S, gt * n_chunks),
            pages[:, g * gc:(g + 1) * gc],
            comp(dirs_c, 0)[:, tl], comp(dirs_c, 1)[:, tl],
            comp(dirs_c, 2)[:, tl]))
    t, hit, gid = (jnp.concatenate(x, axis=1) for x in zip(*parts))

    t = t.reshape(S, R)
    hit = hit.reshape(S, R) > 0.5
    gid = gid.reshape(S, R).astype(jnp.int32)
    n = _normals_from_gid(tris, gid, dirs_c, hit)
    return t, hit, n, gid


def _tri_trace_pallas_camsoup_v2(tris: Array, origins_c: Array,
                                 dirs_c: Array, max_depth: float, cap: int,
                                 img_w: int, cam_rays: int,
                                 backface: bool = False
                                 ) -> Tuple[Array, Array, Array]:
    """Merged-operand camsoup (see `_tri_kernel_camsoup2`): identical math
    and prepass, 3 block operands instead of 7."""
    _, S, R = origins_c.shape
    T = tris.shape[1]
    tiles = R // TILE
    tpc = cam_rays // TILE
    sg = jax.lax.stop_gradient
    cids, counts, lb_c, cluster = _cluster_ids_prepass(
        tris, sg(origins_c), sg(dirs_c), max_depth, cap, img_w, backface)
    n_chunks = cids.shape[2]
    nch = jnp.clip(counts, 1, n_chunks).astype(jnp.int32)
    cams = R // cam_rays
    cam_o = sg(origins_c).reshape(3, S, cams, cam_rays)[..., 0]
    pages = _sv_pages(tris, cam_o.transpose(1, 2, 0), cluster)

    groups = 1
    while S * (tiles // groups) * n_chunks * 4 > 256 * 1024 \
            and groups < tiles // tpc:
        groups += 1
        while (tiles // tpc) % groups:
            groups += 1
    gt = tiles // groups
    gc = cams // groups

    # ONE (3, ROWS, LANES) direction block per tile
    d3 = dirs_c.reshape(3, S, tiles, ROWS, LANES).transpose(1, 2, 0, 3, 4)

    ray_spec = pl.BlockSpec((1, 1, 3, ROWS, LANES),
                            lambda s, i, c, nch, lbc, cid: (s, i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, 2, ROWS, LANES),
                            lambda s, i, c, nch, lbc, cid: (s, i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    pg_spec = pl.BlockSpec(
        (1, 1, 1, cluster, 10),
        lambda s, i, c, nch, lbc, cid: (
            s, i // tpc,
            cid[s, i * n_chunks + jnp.minimum(c, nch[s, i] - 1)],
            0, 0),
        memory_space=pltpu.SMEM)
    out_sds = jax.ShapeDtypeStruct((S, gt, 2, ROWS, LANES), jnp.float32)

    pages, nch, lb_c, cids = jax.lax.optimization_barrier(
        (pages, nch, lb_c, cids))
    kernel = functools.partial(_tri_kernel_camsoup2, chunk=cluster,
                               n_chunks=n_chunks, max_depth=max_depth,
                               cluster=cluster)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S, gt, n_chunks),
        in_specs=[pg_spec, ray_spec],
        out_specs=[out_spec],
    )
    call = pl.pallas_call(kernel, grid_spec=grid_spec, out_shape=[out_sds])
    parts = []
    for g in range(groups):
        tl = slice(g * gt, (g + 1) * gt)
        parts.append(call(
            nch[:, tl], lb_c[:, tl].reshape(S, gt * n_chunks),
            cids[:, tl].reshape(S, gt * n_chunks),
            pages[:, g * gc:(g + 1) * gc], d3[:, tl])[0])
    out = jnp.concatenate(parts, axis=1)

    t = out[:, :, 0].reshape(S, R)
    gid = out[:, :, 1].reshape(S, R).astype(jnp.int32)
    hit = t < max_depth
    n = _normals_from_gid(tris, gid, dirs_c, hit)
    return t, hit, n, gid


# ---------------------------------------------------------------------------
# MXU camsoup — the signed-volume test as one matmul per chunk (round 5)
# ---------------------------------------------------------------------------
#
# The scalar-page camsoup body reads 10 SMEM scalars per triangle: measured
# on v5e at 23k triangles that is ~36 ms of per-chunk 5 KB SMEM DMAs plus
# the scalar-core loads — comparable to the vector math itself. Here the
# page is a VECTOR operand instead: per (camera, chunk) a (8, 4·cluster)
# fp32 G-matrix whose column blocks are [w0 | w1 | w2 | kt] coefficients,
# so the whole 1024-ray × 128-triangle volume evaluation is ONE
# (8,1024)ᵀ·(8,512) MXU matmul; the VPU keeps only the sign tests and the
# running (ray, lane) min-slabs, and the per-ray reduction happens once per
# tile instead of once per triangle.
#
# MEASURED SLOWER on-chip (v5e, 23k tris / 256 cams, backface, same lane):
# 156.7 ms vs the scalar body's 84.9 (65.3 in a fast lane). Two compounding
# reasons. (1) Payload: the G-matrix page is (8, 4·cluster) fp32 per
# (camera, chunk) — each triangle's 10 coefficients padded into 32 slots —
# ~750 MB of HBM payload per frame vs the scalar page's 236 MB. (2) The
# STRUCTURAL one: the signed-volume test contracts over only 8 values
# (dx, dy, dz, 1 + padding), so the systolic array runs at 8/128 = 6% of
# its contraction depth — a (1024,8)·(8,512) chunk matmul costs the same
# MXU passes as a 128-deep one, leaving effective matmul throughput only
# ~1.6× the VPU's 8×128 FMA lanes, nowhere near enough to buy back the
# payload inflation and the (TILE, cluster) slab bookkeeping. A ray–tri
# intersection simply has arithmetic intensity 8 MACs/output — there is
# no reformulation that deepens the contraction without replicating
# payload, so the VPU body is the right engine for this op on this
# hardware. Kept as the "mx" `_CAMSOUP_VARIANT` (parity-tested, on-TPU
# lane) for re-measurement on parts with different MXU/VPU ratios.


def _sv_pages_mx(tris: Array, cam_o: Array, cluster: int) -> Array:
    """Per-camera signed-volume coefficients in MXU G-matrix layout.

    (S, T, 9) × (S, cams, 3) → (S, cams, C, 8, 4·cluster): rows 0-2 carry
    the xyz of gᵢ (column block i ∈ {0,1,2}), row 3 carries kt in block 3;
    rows 4-7 pad the fp32 sublane tile. A ray direction extended to
    d₈ = [dx dy dz 1 0 0 0 0] then gives W = d₈ · G with
    W[:, i·cluster + j] = wᵢ of triangle j (and kt in block 3)."""
    S, T = tris.shape[0], tris.shape[1]
    a, b, c = tris[..., 0:3], tris[..., 3:6], tris[..., 6:9]
    m0, e0 = jnp.cross(b, c), b - c
    m1, e1 = jnp.cross(c, a), c - a
    m2, e2 = jnp.cross(a, b), a - b
    o = cam_o[:, :, None]                       # (S, cams, 1, 3)
    g0 = m0[:, None] + jnp.cross(o, e0[:, None])
    g1 = m1[:, None] + jnp.cross(o, e1[:, None])
    g2 = m2[:, None] + jnp.cross(o, e2[:, None])
    kt = jnp.sum((a[:, None] - o) * g0, -1)     # (S, cams, T)
    cams = cam_o.shape[1]
    C = T // cluster

    def blk(x):  # (S, cams, T, 3) -> (S, cams, C, 3, cluster)
        return x.reshape(S, cams, C, cluster, 3).swapaxes(-1, -2)

    zero = jnp.zeros((S, cams, C, 1, cluster), tris.dtype)
    row3 = jnp.concatenate([zero, zero, zero,
                            kt.reshape(S, cams, C, 1, cluster)], -1)
    top = jnp.concatenate([blk(g0), blk(g1), blk(g2),
                           jnp.zeros((S, cams, C, 3, cluster), tris.dtype)],
                          -1)                   # (S, cams, C, 3, 4·cluster)
    g = jnp.concatenate([top, row3], -2)        # rows 0-3
    return jnp.pad(g, ((0, 0),) * 3 + ((0, 4), (0, 0)))


def _tri_kernel_camsoup_mx(nch_ref, lb_ref, cid_ref, pg_ref, d_ref, out_ref,
                           acc_t, acc_g, worst_scr,
                           *, n_chunks: int, max_depth: float, cluster: int,
                           n_tris: int):
    """MXU camsoup body. Running best lives as (TILE, cluster) min-slabs in
    VMEM scratch — lane j of ray r holds the best hit among the lane-j
    triangles of every chunk so far — so per chunk the VPU does only the
    sign tests and two selects; the cross-lane min + arg-resolve runs once,
    at tile finalisation. The occlusion `worst` refreshes from a full slab
    reduce every 8 chunks (a stale-high bound is conservative: it only
    skips less)."""
    si, ti = pl.program_id(0), pl.program_id(1)
    ci = pl.program_id(2)

    @pl.when(ci == 0)
    def _init():
        acc_t[...] = jnp.full(acc_t.shape, BIG, jnp.float32)
        acc_g[...] = jnp.zeros(acc_g.shape, jnp.float32)
        worst_scr[0] = jnp.float32(max_depth)

    @pl.when((ci < nch_ref[si, ti])
             & (lb_ref[si, ti * n_chunks + ci] < worst_scr[0]))
    def _body():
        cid = cid_ref[si, ti * n_chunks + jnp.minimum(ci, nch_ref[si, ti] - 1)]
        W = jax.lax.dot_general(
            d_ref[0, 0], pg_ref[0, 0, 0],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)   # (TILE, 4·cluster)
        w0 = W[:, :cluster]
        w1 = W[:, cluster:2 * cluster]
        w2 = W[:, 2 * cluster:3 * cluster]
        kt = W[:, 3 * cluster:]
        ok = ((w0 * w1 >= 0.0) & (w0 * w2 >= 0.0) & (w1 * w2 >= 0.0))
        tk = kt * (1.0 / (w0 + w1 + w2))
        ok = ok & (tk > 1e-4)
        tk = jnp.where(ok, tk, BIG)
        told = acc_t[...]
        better = tk < told
        base = (cid * cluster).astype(jnp.float32)
        # Mosaic only lowers integer iota; convert after (fp32 exact < 2^24)
        lane = jax.lax.broadcasted_iota(
            jnp.int32, tk.shape, 1).astype(jnp.float32)
        acc_t[...] = jnp.where(better, tk, told)
        acc_g[...] = jnp.where(better, base + lane, acc_g[...])

    @pl.when((ci & 7) == 7)
    def _refresh():
        worst_scr[0] = jnp.minimum(
            jnp.max(jnp.min(acc_t[...], axis=1)), jnp.float32(max_depth))

    @pl.when(ci == n_chunks - 1)
    def _finalise():
        t_all = acc_t[...]
        tmin = jnp.min(t_all, axis=1, keepdims=True)        # (TILE, 1)
        g_all = jnp.where(t_all <= tmin, acc_g[...], jnp.float32(n_tris))
        gmin = jnp.minimum(jnp.min(g_all, axis=1, keepdims=True),
                           jnp.float32(n_tris - 1))
        out_ref[0, 0] = jnp.concatenate(
            [jnp.clip(tmin, 0.0, max_depth), gmin], axis=1)


def _tri_trace_pallas_camsoup_mx(tris: Array, origins_c: Array,
                                 dirs_c: Array, max_depth: float, cap: int,
                                 img_w: int, cam_rays: int,
                                 backface: bool = False
                                 ) -> Tuple[Array, Array, Array]:
    """Dense-mesh camera path with the matmul body (`_tri_kernel_camsoup_mx`):
    identical prepass and scheduling to `_tri_trace_pallas_camsoup`, but the
    payload is the vector G-matrix (VMEM block DMAs instead of SMEM scalar
    pages) and the intersection maths ride the MXU."""
    _, S, R = origins_c.shape
    T = tris.shape[1]
    tiles = R // TILE
    tpc = cam_rays // TILE
    sg = jax.lax.stop_gradient
    cids, counts, lb_c, cluster = _cluster_ids_prepass(
        tris, sg(origins_c), sg(dirs_c), max_depth, cap, img_w, backface)
    n_chunks = cids.shape[2]
    nch = jnp.clip(counts, 1, n_chunks).astype(jnp.int32)
    cams = R // cam_rays
    cam_o = sg(origins_c).reshape(3, S, cams, cam_rays)[..., 0]
    pages = _sv_pages_mx(tris, cam_o.transpose(1, 2, 0), cluster)

    groups = 1
    while S * (tiles // groups) * n_chunks * 4 > 256 * 1024 \
            and groups < tiles // tpc:
        groups += 1
        while (tiles // tpc) % groups:
            groups += 1
    gt = tiles // groups
    gc = cams // groups

    # d₈ = [d | 1 | 0-pad] per tile, contraction-major: (S, tiles, 8, TILE)
    d8 = jnp.concatenate(
        [dirs_c.reshape(3, S, tiles, TILE),
         jnp.ones((1, S, tiles, TILE), dirs_c.dtype),
         jnp.zeros((4, S, tiles, TILE), dirs_c.dtype)]).transpose(1, 2, 0, 3)

    ray_spec = pl.BlockSpec((1, 1, 8, TILE),
                            lambda s, i, c, nch, lbc, cid: (s, i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, TILE, 2),
                            lambda s, i, c, nch, lbc, cid: (s, i, 0, 0),
                            memory_space=pltpu.VMEM)
    pg_spec = pl.BlockSpec(
        (1, 1, 1, 8, 4 * cluster),
        lambda s, i, c, nch, lbc, cid: (
            s, i // tpc,
            cid[s, i * n_chunks + jnp.minimum(c, nch[s, i] - 1)],
            0, 0),
        memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((S, gt, TILE, 2), jnp.float32)

    pages, nch, lb_c, cids = jax.lax.optimization_barrier(
        (pages, nch, lb_c, cids))
    kernel = functools.partial(_tri_kernel_camsoup_mx, n_chunks=n_chunks,
                               max_depth=max_depth, cluster=cluster,
                               n_tris=T)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S, gt, n_chunks),
        in_specs=[pg_spec, ray_spec],
        out_specs=[out_spec],
        scratch_shapes=[pltpu.VMEM((TILE, cluster), jnp.float32),
                        pltpu.VMEM((TILE, cluster), jnp.float32),
                        pltpu.SMEM((1,), jnp.float32)],
    )
    call = pl.pallas_call(kernel, grid_spec=grid_spec, out_shape=[out_sds])
    parts = []
    for g in range(groups):
        tl = slice(g * gt, (g + 1) * gt)
        parts.append(call(
            nch[:, tl], lb_c[:, tl].reshape(S, gt * n_chunks),
            cids[:, tl].reshape(S, gt * n_chunks),
            pages[:, g * gc:(g + 1) * gc], d8[:, tl])[0])
    out = jnp.concatenate(parts, axis=1)

    t = out[..., 0].reshape(S, R)
    gid = out[..., 1].reshape(S, R).astype(jnp.int32)
    hit = t < max_depth
    n = _normals_from_gid(tris, gid, dirs_c, hit)
    return t, hit, n, gid


# ---------------------------------------------------------------------------
# worklist kernel — dense meshes, whole-camera tiles (round 5)
# ---------------------------------------------------------------------------
#
# The camsoup grid pays for every (tile, chunk) slot whether the tile needs
# it or not: measured on v5e at 23k triangles, 46,080 grid steps cost a
# 17.4 ms dispatch floor (0.38 us/step with merged operands), ~36 ms of
# per-chunk 5 KB SMEM page DMAs, and ~34 ms of vector math — while only
# 32.7k chunks were real work at CLUSTER=128 granularity, and only ~15k at
# 16-triangle granularity. This path fixes all three terms at once:
#  * cull at 16-triangle clusters (2.3x less body work than 128 — the
#    AABB/cone slop shrinks with the cluster)
#  * flatten (tile, chunk) into ONE grid axis sized by the PREFIX SUM of
#    per-tile chunk quotas — dead steps do not exist; the static budget
#    (`work_budget` chunks/tile average) is met by proportional
#    nearest-first truncation of over-budget tiles (the same overflow
#    contract as `cap`: far field -> background, never a missing near hit)
#  * gather each scheduled chunk's 128 signed-volume rows CONTIGUOUSLY in
#    worklist order, so the kernel's page DMA is one sequential stream
#
# MEASURED SLOWER on-chip (v5e, backface, same lane as the 84.9 ms scalar
# run): 642.5 ms at 23k tris, 410.6 at 92k. The 16-triangle cull
# granularity that makes the worklist tight also makes the XLA-side
# prepass 8× wider (O(tiles·T/16) activity + top_k over 4× more
# clusters) and turns the per-entry contiguous row gather into the
# dominant cost — the dead grid steps it removes were already the CHEAP
# steps (lb-skipped, ~0.4 µs). Kept as the "wl" `_CAMSOUP_VARIANT`
# (parity-tested, on-TPU lane): the scheduling idea is sound if the
# worklist could be built on-chip, but Pallas grids are static.

WL_CLUSTER = 16   # cull granularity (swept 16/32/64: rows/tile 1807 /
#                   2399 / 3243 on the 23k garage with backface)
WL_CHUNK = 128    # kernel rows per worklist entry


def _tri_kernel_worklist(wmeta_ref, lb_ref, wpg_ref, pg_ref, d_ref, out_ref,
                         *, chunk: int, max_depth: float):
    """One worklist entry: intersect this entry's tile rays with its
    ``chunk`` gathered signed-volume rows. ``wmeta`` packs the tile index
    (bits 0-19), a first-entry-of-tile bit (20) and last-entry bit (21);
    entries are tile-contiguous so the revisited output block carries the
    running min-t across a tile's entries and is finalised exactly once.
    Padding entries carry lb = BIG (body skipped) and a payload index
    clamped to the last real entry (revisit -> no DMA)."""
    si, ei = pl.program_id(0), pl.program_id(1)
    m = wmeta_ref[si, ei]

    @pl.when((m // (2 ** 20)) % 2 == 1)
    def _init():
        out_ref[0, 0, 0] = jnp.full((ROWS, LANES), BIG, jnp.float32)
        out_ref[0, 0, 1] = jnp.zeros((ROWS, LANES), jnp.float32)

    worst = jnp.minimum(jnp.max(out_ref[0, 0, 0]), max_depth)

    @pl.when(lb_ref[si, ei] < worst)
    def _body():
        dx, dy, dz = d_ref[0, 0, 0], d_ref[0, 0, 1], d_ref[0, 0, 2]
        base = (ei * chunk).astype(jnp.float32)  # slot base (exact < 2^24)
        tbest = out_ref[0, 0, 0]
        gbest = out_ref[0, 0, 1]
        for j in range(chunk):
            def Pg(c):
                return pg_ref[0, 0, j, c]

            w0 = dx * Pg(0) + dy * Pg(1) + dz * Pg(2)
            w1 = dx * Pg(3) + dy * Pg(4) + dz * Pg(5)
            w2 = dx * Pg(6) + dy * Pg(7) + dz * Pg(8)
            wsum = w0 + w1 + w2
            ok = ((w0 * w1 >= 0.0) & (w0 * w2 >= 0.0)
                  & (w1 * w2 >= 0.0))
            tk = Pg(9) * (1.0 / wsum)
            ok = ok & (tk > 1e-4)
            tk = jnp.where(ok, tk, BIG)
            better = tk < tbest
            gbest = jnp.where(better, base + float(j), gbest)
            tbest = jnp.where(better, tk, tbest)
        out_ref[0, 0, 0] = tbest
        out_ref[0, 0, 1] = gbest

    @pl.when(m // (2 ** 21) == 1)
    def _finalise():
        out_ref[0, 0, 0] = jnp.clip(out_ref[0, 0, 0], 0.0, max_depth)


def _tri_trace_pallas_worklist(tris: Array, origins_c: Array, dirs_c: Array,
                               max_depth: float, cap: int, img_w: int,
                               cam_rays: int, backface: bool = False,
                               work_budget: Optional[int] = None
                               ) -> Tuple[Array, Array, Array, Array]:
    """Dense-mesh camera path on a flattened per-tile worklist (module
    header). ``work_budget`` is the static average chunks-per-tile grid
    budget; default n_chunks//3 keeps typical frames untruncated (measured
    mean occupancy: 15/45 chunks at 23k tris, 32/180 at 92k with
    backface). Size it per scene with :func:`cull_stats`."""
    _, S, R = origins_c.shape
    T = tris.shape[1]
    tiles = R // TILE
    cluster = WL_CLUSTER
    chunk = WL_CHUNK
    G = chunk // cluster
    C = T // cluster
    sg = jax.lax.stop_gradient
    o_sg, d_sg = sg(origins_c), sg(dirs_c)

    o4 = o_sg.reshape(3, S, tiles, TILE)
    d4 = d_sg.reshape(3, S, tiles, TILE)
    lo = (o4.min(-1) + max_depth * jnp.minimum(d4.min(-1), 0.0)
          ).transpose(1, 2, 0)
    hi = (o4.max(-1) + max_depth * jnp.maximum(d4.max(-1), 0.0)
          ).transpose(1, 2, 0)
    active, dist, lb_all = _cluster_activity(
        tris, o_sg, d_sg, max_depth, lo, hi, img_w, cluster=cluster,
        backface=backface)

    cap_c = max(1, min(cap, T) // cluster)
    cap_c = -(-cap_c // G) * G
    cap_c = min(cap_c, -(-C // G) * G)
    n_chunks = cap_c // G

    key = jnp.where(active, dist, jnp.inf)
    _nk, cids = jax.lax.top_k(-key, min(cap_c, C))  # ascending distance
    if cap_c > C:  # cap exceeds cluster count: pad the id table
        cids = jnp.pad(cids, ((0, 0), (0, 0), (0, cap_c - C)))
    cids = cids.astype(jnp.int32)
    counts = jnp.minimum(active.sum(-1), cap_c).astype(jnp.int32)
    in_count = jnp.arange(cap_c) < counts[..., None]
    lb_c = jnp.take_along_axis(lb_all, cids, axis=-1)
    lb_c = jnp.where(in_count, lb_c, BIG)
    lb_ch = lb_c.reshape(S, tiles, n_chunks, G).min(-1)
    cnt_ch = jnp.clip(-(-counts // G), 1, n_chunks)

    # static grid budget; SMEM holds 3 prefetch arrays of S*NW i32/f32 —
    # group tiles so each call's arrays stay <= ~256 KB
    W = work_budget or max(8, n_chunks // 3)
    W = min(W, n_chunks)
    groups = 1
    while S * (tiles // groups) * W * 12 > 256 * 1024 \
            and groups < tiles:
        groups += 1
        while tiles % groups:
            groups += 1
    gtiles = tiles // groups
    NW = gtiles * W

    def build_worklist(cnt_ch_g, lb_ch_g):
        """(S, gtiles) chunk counts -> flattened tile-contiguous worklist
        (all (S, NW)): packed meta, per-entry lb, payload index, tile id,
        within-tile chunk id, validity."""
        free = NW - gtiles
        extra = (cnt_ch_g - 1).astype(jnp.float32)
        scale = jnp.minimum(
            1.0, free / jnp.maximum(extra.sum(-1, keepdims=True), 1.0))
        quota = 1 + jnp.floor(extra * scale).astype(jnp.int32)
        starts = jnp.cumsum(quota, axis=-1) - quota  # exclusive
        tot = starts[:, -1] + quota[:, -1]           # (S,)
        e = jnp.arange(NW)
        tile_of = jax.vmap(
            lambda st: jnp.searchsorted(st, e, side="right") - 1)(starts)
        within = e[None] - jnp.take_along_axis(starts, tile_of, axis=-1)
        valid = e[None] < tot[:, None]
        within_c = jnp.minimum(within, n_chunks - 1)
        first = (within == 0).astype(jnp.int32)
        nxt = jnp.concatenate(
            [tile_of[:, 1:], jnp.full((S, 1), -1, tile_of.dtype)], axis=-1)
        last = (nxt != tile_of).astype(jnp.int32)
        wmeta = tile_of + first * 2 ** 20 + last * 2 ** 21
        lb_w = jnp.where(
            valid,
            jnp.take_along_axis(
                lb_ch_g.reshape(S, gtiles * n_chunks),
                tile_of * n_chunks + within_c, axis=-1),
            BIG)
        wpg = jnp.where(valid, e[None], tot[:, None] - 1).astype(jnp.int32)
        return (wmeta.astype(jnp.int32), lb_w, wpg, tile_of, within_c,
                valid)

    soup = tris.reshape(S, C, cluster * 9)
    o_t = o4[..., 0].transpose(1, 2, 0)  # (S, tiles, 3) tile origins

    d3 = dirs_c.reshape(3, S, tiles, ROWS, LANES).transpose(1, 2, 0, 3, 4)

    ray_spec = pl.BlockSpec(
        (1, 1, 3, ROWS, LANES),
        lambda s, e, meta, lbw, pgi: (s, meta[s, e] % (2 ** 20), 0, 0, 0),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (1, 1, 2, ROWS, LANES),
        lambda s, e, meta, lbw, pgi: (s, meta[s, e] % (2 ** 20), 0, 0, 0),
        memory_space=pltpu.VMEM)
    pg_spec = pl.BlockSpec(
        (1, 1, chunk, 10),
        lambda s, e, meta, lbw, pgi: (s, pgi[s, e], 0, 0),
        memory_space=pltpu.SMEM)
    out_sds = jax.ShapeDtypeStruct((S, gtiles, 2, ROWS, LANES), jnp.float32)

    kernel = functools.partial(_tri_kernel_worklist, chunk=chunk,
                               max_depth=max_depth)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S, NW),
        in_specs=[pg_spec, ray_spec],
        out_specs=[out_spec],
    )
    call = pl.pallas_call(kernel, grid_spec=grid_spec, out_shape=[out_sds])

    t_parts, g_parts = [], []
    for g in range(groups):
        tl = slice(g * gtiles, (g + 1) * gtiles)
        wmeta, lb_w, wpg, tile_of, within_c, valid = build_worklist(
            cnt_ch[:, tl], lb_ch[:, tl])
        # gather each entry's G cluster pages -> (S, NW, chunk, 9) rows
        idx_g = ((tile_of * cap_c + within_c * G)[..., None]
                 + jnp.arange(G)[None, None]).reshape(S, NW * G)
        cl_e = jnp.take_along_axis(
            cids[:, tl].reshape(S, gtiles * cap_c), idx_g,
            axis=-1).reshape(S, NW, G)
        rows = jnp.take_along_axis(
            soup[:, :, None], cl_e.reshape(S, -1)[..., None, None], axis=1
        ).reshape(S, NW, G, cluster, 9)
        slot = within_c[..., None] * G + jnp.arange(G)[None, None]
        live = (slot < jnp.take_along_axis(
            counts[:, tl], tile_of, axis=-1)[..., None]) & valid[..., None]
        rows = rows.reshape(S, NW, chunk, 9)
        # signed-volume payload against the entry's tile origin
        o_e = jnp.take_along_axis(o_t[:, tl], tile_of[..., None], axis=1)
        o_e = o_e[:, :, None]                             # (S, NW, 1, 3)
        a_ = rows[..., 0:3] - o_e
        b_ = rows[..., 3:6] - o_e
        c_ = rows[..., 6:9] - o_e
        g0 = jnp.cross(b_, c_)
        g1 = jnp.cross(c_, a_)
        g2 = jnp.cross(a_, b_)
        kt = jnp.sum(a_ * g0, -1, keepdims=True)
        pages = jnp.concatenate([g0, g1, g2, kt], -1)     # (S, NW, chunk, 10)
        # neutralise rows past the tile's cluster count (top_k tail ids
        # are arbitrary) and padding entries. Mask the PAGES, not the raw
        # rows: a zeroed row still yields a_=b_=c_=-o, and cross(v, v)
        # under FMA contraction is NOT exactly zero — the ~1e-10 residue
        # aliases as same-signed volumes and produced spurious near hits.
        # All-zero pages give w=0, kt=0 -> tk = 0*(1/0) = NaN, never a hit.
        live_r = jnp.repeat(live, cluster, axis=-1)       # (S, NW, chunk)
        pages = jnp.where(live_r[..., None], pages, 0.0)

        pages, wmeta, lb_w, wpg = jax.lax.optimization_barrier(
            (pages, wmeta, lb_w, wpg))
        out = call(wmeta, lb_w, wpg, pages, d3[:, tl])[0]
        t_parts.append(out[:, :, 0])
        # slot -> global triangle id: slot = e*chunk + j indexes the
        # entry-ordered id table
        ids_e = (cl_e[..., None] * cluster
                 + jnp.arange(cluster)[None, None, None]).reshape(S, -1)
        slot_px = out[:, :, 1].reshape(S, gtiles * TILE).astype(jnp.int32)
        g_parts.append(jnp.take_along_axis(ids_e, slot_px, axis=-1).reshape(
            S, gtiles, ROWS, LANES))
    t = jnp.concatenate(t_parts, axis=1).reshape(S, R)
    gid = jnp.concatenate(g_parts, axis=1).reshape(S, R)
    hit = t < max_depth
    n = _normals_from_gid(tris, gid, dirs_c, hit)
    return t, hit, n, gid


def cull_stats(tris: Array, origins_c: Array, dirs_c: Array,
               max_depth: float = 20.0, cap: int = 256,
               img_w: Optional[int] = None) -> dict:
    """Visible-triangle counts per tile + the overflow fraction for sizing
    ``cap`` (the documented coverage contract)."""
    _, counts, _lb, _ids = tri_cull_compact(tris, origins_c, dirs_c,
                                            max_depth, cap=1, img_w=img_w)
    c = np.asarray(counts)
    return {"max": int(c.max()), "mean": float(c.mean()),
            "p99": float(np.percentile(c, 99)),
            "overflow_frac": float((c > cap).mean())}


# ---------------------------------------------------------------------------
# differentiable wrapper — shared IFT VJP (planar surface: exact)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def tri_trace_diff(tris, origins_c, dirs_c, max_depth=20.0, cap=256,
                   img_w=None, use_pallas=True, cam_rays=None,
                   backface=False):
    if use_pallas:
        return tri_trace_pallas(tris, origins_c, dirs_c, max_depth, cap,
                                img_w, cam_rays, backface)
    o = jnp.transpose(origins_c, (1, 2, 0))
    d = jnp.transpose(dirs_c, (1, 2, 0))
    return tri_trace_xla(tris, o, d, max_depth)


def _ttd_fwd(tris, origins_c, dirs_c, max_depth, cap, img_w, use_pallas,
             cam_rays, backface):
    t, hit, n, gid = tri_trace_diff(tris, origins_c, dirs_c, max_depth,
                                    cap, img_w, use_pallas, cam_rays,
                                    backface)
    return (t, hit, n, gid), (tris, dirs_c, t, hit, n)


def _ttd_bwd(max_depth, cap, img_w, use_pallas, cam_rays, backface,
             residuals, cotangents):
    """IFT gradient — exact for the planar hit surface:
    ∂t/∂o = −n/(n·d), ∂t/∂d = −t·n/(n·d)."""
    tris, dirs_c, t, hit, n = residuals
    g_t, _g_hit, _g_n, _g_gid = cotangents
    d = jnp.transpose(dirs_c, (1, 2, 0))
    denom = jnp.sum(n * d, axis=-1)
    scale = jnp.where(hit & (jnp.abs(denom) > 1e-3), 1.0 / denom, 0.0)
    common = (g_t * scale)[..., None] * n
    d_o = -jnp.transpose(common, (2, 0, 1))
    d_d = -jnp.transpose(common * t[..., None], (2, 0, 1))
    return jnp.zeros_like(tris), d_o, d_d


tri_trace_diff.defvjp(_ttd_fwd, _ttd_bwd)
