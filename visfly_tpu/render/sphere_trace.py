"""Sphere-tracing renderer — the TPU-native replacement for habitat's GL
rasteriser (`get_sensor_observations`, `/root/reference/utils/SceneManager.py:371-389`).

Two backends:

* **PrimitiveScene (default, fast)** — rays are grouped per scene
  ``(S, rays_per_scene, 3)`` and vmapped over the scene axis; every trace
  step evaluates all K analytic primitive SDFs with dense VPU arithmetic.
  ZERO gathers anywhere in the pipeline (XLA gathers run at ~1e8 elem/s on
  TPU and were measured 135× too slow for the 1e4 fps target). Colors and
  semantics resolve by one-hot matmul against the per-scene tables (MXU).
* **SceneData grids (meshes)** — trilinear-interpolated dense SDF grids,
  flat ray batch with per-ray scene ids.

Fixed iteration count + masked updates keep the XLA program static; the
whole render fuses into one kernel chain per sensor. Differentiable end to
end (depth gradients flow into drone pose).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from ..scene.prim_scene import (
    PrimitiveScene,
    prim_distances,
    prim_normal_single,
    prim_sdf,
)
from ..scene.queries import sample_sdf
from .camera import camera_rays

DEFAULT_MAX_DEPTH = 20.0  # background value (`droneEnv.py:306`)
BIG = 1e9
_LIGHT_DIR = jnp.asarray([0.33798, 0.24142, 0.90966])  # normalised


def bake_lighting(cfg) -> Optional[tuple]:
    """Habitat-style lighting setup → device arrays for :func:`lambert_shade`.

    The reference selects per-scene lighting configs (habitat LightInfo
    lists: point/directional lights with color·intensity vectors) written
    into scene JSONs (`/root/reference/utils/datasets/datasets.py:232-252`,
    habitat `default_lighting` keys). Here the equivalent surface is
    ``scene_kwargs={"lighting": {...}}``:

        {"ambient": 0.35,
         "attenuation": 0.0,          # point lights: 1/(1 + a·d²)
         "lights": [
            {"type": "directional", "direction": [x, y, z],
             "color": [1, 1, 1], "intensity": 0.65},
            {"type": "point", "position": [x, y, z],
             "color": [1.0, 0.9, 0.8], "intensity": 2.0},
         ]}

    Returns (kind (L,) f32 — 0 directional / 1 point, vec (L, 3) —
    TO-light unit direction or position, color (L, 3) color·intensity,
    ambient (), attenuation (), shadows bool); ``None`` when cfg is falsy
    (the default single fixed directional light — all golden tests
    unchanged). ``"shadows": true`` casts one occlusion ray per light on
    the EXACT-TRIANGLE backend (habitat's GL renderer shadow-maps the same
    geometry); other backends ignore it (documented in DEVIATIONS)."""
    if not cfg:
        return None
    lights = cfg.get("lights", ())
    kind, vec, col = [], [], []
    for li in lights:
        ty = str(li.get("type", "directional")).lower()
        c = np.asarray(li.get("color", [1.0, 1.0, 1.0]), np.float32)
        c = c * float(li.get("intensity", 1.0))
        if ty.startswith("dir"):
            d = np.asarray(li["direction"], np.float32)
            d = -d / max(float(np.linalg.norm(d)), 1e-9)  # surface → light
            kind.append(0.0)
            vec.append(d)
        elif ty == "point":
            kind.append(1.0)
            vec.append(np.asarray(li["position"], np.float32))
        else:
            raise ValueError(f"unknown light type {ty!r}")
        col.append(c)
    L = max(len(kind), 1)
    if not kind:  # ambient-only setup
        kind, vec, col = [0.0], [np.zeros(3, np.float32)], [np.zeros(3, np.float32)]
    return (jnp.asarray(kind, jnp.float32).reshape(L),
            jnp.asarray(np.stack(vec), jnp.float32).reshape(L, 3),
            jnp.asarray(np.stack(col), jnp.float32).reshape(L, 3),
            jnp.float32(cfg.get("ambient", 0.35)),
            jnp.float32(cfg.get("attenuation", 0.0)),
            bool(cfg.get("shadows", False)))


def lambert_shade(n: Array, p: Array, lighting, vis: Optional[Array] = None
                  ) -> Array:
    """Lambertian shade multiplier (..., 3) from normal ``n`` and hit point
    ``p`` (both (..., 3)). ``lighting=None`` reproduces the historic fixed
    ``0.35 + 0.65·max(n·L, 0)`` single directional light exactly.
    ``vis`` (..., L) ∈ [0,1] masks each light's diffuse term (shadow-ray
    visibility from the exact-tri backend); ambient is never masked."""
    if lighting is None:
        lam = jnp.maximum(jnp.sum(n * _LIGHT_DIR, -1), 0.0)
        return jnp.broadcast_to((0.35 + 0.65 * lam)[..., None],
                                (*lam.shape, 3))
    kind, vec, col, ambient, atten = lighting[:5]
    to = vec - p[..., None, :]                      # (..., L, 3) point light
    d2 = jnp.sum(to * to, -1)
    l_pt = to * jax.lax.rsqrt(jnp.maximum(d2, 1e-12))[..., None]
    l = jnp.where(kind[:, None] > 0.5, l_pt, vec)   # (..., L, 3)
    lam = jnp.maximum(jnp.sum(n[..., None, :] * l, -1), 0.0)  # (..., L)
    w = jnp.where(kind > 0.5, 1.0 / (1.0 + atten * d2), 1.0)
    if vis is not None:
        w = w * vis
    return ambient + jnp.sum((lam * w)[..., None] * col, axis=-2)


def shadow_visibility(tri: Array, p: Array, nrm: Array, lighting,
                      slab: int = 512) -> Array:
    """Per-light shadow-ray visibility for exact-triangle scenes.

    One any-hit occlusion ray per (surface point, light): from
    ``p + 1e-3·n`` toward the light, blocked iff any scene triangle
    intersects strictly before the light (point lights) or anywhere along
    the ray (directional). The habitat reference shadow-maps the same
    geometry through GL; here it is a slab-scanned Möller–Trumbore any-hit
    over the true soup (O(rays × T), opt-in via ``"shadows": true``).

    tri (S, T, 9) · p/nrm (S, R, 3) → vis (S, R, L) ∈ {0, 1}.
    """
    kind, vec, _, _, _ = lighting[:5]
    L = kind.shape[0]
    to = vec - p[:, :, None, :]                        # (S, R, L, 3)
    dist = jnp.sqrt(jnp.maximum(jnp.sum(to * to, -1), 1e-12))
    ldir = jnp.where(kind[:, None] > 0.5, to / dist[..., None],
                     jnp.broadcast_to(vec, to.shape))  # unit, to-light
    tmax = jnp.where(kind > 0.5, dist, BIG)            # (S, R, L)
    o = (p + 1e-3 * nrm)[:, :, None, None, :]          # (S, R, 1, 1, 3)

    S, T = tri.shape[0], tri.shape[1]
    pad = (-T) % slab
    trip = jnp.pad(tri, ((0, 0), (0, pad), (0, 0)))    # degenerate rows
    trs = trip.reshape(S, trip.shape[1] // slab, slab, 9).swapaxes(0, 1)

    def body(occ, tr):                                 # tr (S, slab, 9)
        a = tr[:, None, None, :, 0:3]                  # (S, 1, 1, slab, 3)
        e1 = tr[:, None, None, :, 3:6] - a
        e2 = tr[:, None, None, :, 6:9] - a
        d5 = ldir[:, :, :, None, :]                    # (S, R, L, 1, 3)
        pv = jnp.cross(d5, e2)
        det = jnp.sum(e1 * pv, -1)                     # (S, R, L, slab)
        inv = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
        tv = o - a
        u = jnp.sum(tv * pv, -1) * inv
        qv = jnp.cross(tv, e1)
        v = jnp.sum(d5 * qv, -1) * inv
        t = jnp.sum(e2 * qv, -1) * inv
        hit = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0)
               & (u + v <= 1.0) & (t > 1e-3) & (t < tmax[..., None]))
        return occ | jnp.any(hit, -1), None

    occ0 = jnp.zeros((S, p.shape[1], L), bool)
    occ, _ = jax.lax.scan(body, occ0, trs)
    return jnp.where(occ, 0.0, 1.0)


# ---------------------------------------------------------------------------
# grouped fast path (PrimitiveScene)
# ---------------------------------------------------------------------------


def _scene_sdf_fn(params, obj_pos, obj_radius, origins=None):
    """Scene SDF closure; when ``origins`` is given, objects containing a
    ray's origin are excluded for that ray (self-exclusion — a drone's own
    body must not occlude its camera when agents render each other,
    `SceneManager.py:201-202,855-866`)."""
    excl = None
    if obj_pos is not None and origins is not None:
        d0 = jnp.linalg.norm(origins[:, None, :] - obj_pos[None], axis=-1)
        excl = d0 <= obj_radius[None] + 0.05  # (R, M) True → ignore

    def sdf(p):
        d = prim_sdf(params, p)
        if obj_pos is not None:
            do = (
                jnp.linalg.norm(p[:, None, :] - obj_pos[None], axis=-1)
                - obj_radius[None]
            )
            if excl is not None:
                do = jnp.where(excl, jnp.asarray(1e9, do.dtype), do)
            d = jnp.minimum(d, jnp.min(do, axis=-1))
        return d

    return sdf


def _analytic_t0(
    params: Array,  # (K, 12) packed primitive rows
    o: Array,  # (R, 3) unit-dir ray origins
    d: Array,  # (R, 3)
    obj_pos: Optional[Array],
    obj_radius: Optional[Array],
    max_depth: float,
    eps: float = 0.0,
) -> Array:
    """Exact analytic ray–primitive intersection, min-reduced over the scene.

    Sphere tracing spends ``n_steps × K`` SDF evaluations per ray; but every
    primitive family here admits a CLOSED-FORM ray intersection — slab test
    for (yaw-rotated) boxes and inverted rooms, a quadratic for spheres, and
    cylinder+cap quadratics for capsules — so the march collapses to ONE
    candidate computation per primitive (≈20× fewer VPU flops at 40 steps).
    The only inexact case is a general rounded box (he>0 AND radius>0, which
    no preset emits): its candidate is the slab entry of the radius-inflated
    box — a strict lower bound that the short refine march after this
    prepass converges from. Returns per-ray t₀ with the semantics of the
    marched trace: origin inside a solid → 0; miss → ``max_depth``.

    ``eps`` (opt-in, default 0) dilates SOLID primitives so rays passing
    within eps of a surface count as hits, approximating the marched
    trace's sdf<eps stop. It is NOT used by default: box dilation via the
    slab test is L∞, so corner-grazing rays in the (eps, eps·√3) band would
    report spurious nearby hits that a short refine cannot escape. The
    default (eps=0) is geometrically EXACT — which also matches the
    reference's rasteriser (habitat renders exact triangle geometry with no
    eps shell, `SceneManager.py:371-389`) more faithfully than the march
    does; the two differ only on rays that pass within the march's 1 cm hit
    epsilon of a silhouette."""
    big = jnp.asarray(1e9, o.dtype)
    c = params[:, 0:3]
    he = params[:, 3:6]
    rad = params[:, 6]
    cy, sy = params[:, 7], params[:, 8]
    sign = params[:, 9]
    fam = params[:, 10]
    act = params[:, 11]

    # --- family 0: box frame (yaw) coordinates, (R, K) ------------------
    rx = o[:, None, 0] - c[None, :, 0]
    ry = o[:, None, 1] - c[None, :, 1]
    px = cy * rx + sy * ry
    py = -sy * rx + cy * ry
    pz = o[:, None, 2] - c[None, :, 2]
    vx = cy * d[:, None, 0] + sy * d[:, None, 1]
    vy = -sy * d[:, None, 0] + cy * d[:, None, 1]
    vz = jnp.broadcast_to(d[:, None, 2], px.shape)
    H = he + (rad[:, None] + eps)  # radius- and eps-inflated halves (K, 3)

    def slab(p, v, h):
        safe = jnp.where(jnp.abs(v) < 1e-9,
                         jnp.where(v >= 0, 1e-9, -1e-9), v)
        t1 = (-h - p) / safe
        t2 = (h - p) / safe
        return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

    n1, f1 = slab(px, vx, H[None, :, 0])
    n2, f2 = slab(py, vy, H[None, :, 1])
    n3, f3 = slab(pz, vz, H[None, :, 2])
    tn = jnp.maximum(n1, jnp.maximum(n2, n3))
    tf = jnp.minimum(f1, jnp.minimum(f2, f3))
    t_solid = jnp.where((tn <= tf) & (tf > 0.0), jnp.maximum(tn, 0.0), big)
    # inverted room (sign < 0): from inside (tn ≤ 0 < tf) the hit is the
    # slab EXIT of the radius-inflated box (the wall of sdf=(d_box−rad)·sign
    # sits ``rad`` outside the he surface — exact on faces, overshoots only
    # in rounded-corner regions; rooms normally have rad = 0, and general
    # inverted rounded boxes trigger the pack_scenes warning). Matches the
    # Pallas kernel's slab (`pallas_trace._trace_tile`); an origin outside
    # sits in the solid complement → 0
    Hr = he + rad[:, None]
    nr1, fr1 = slab(px, vx, Hr[None, :, 0])
    nr2, fr2 = slab(py, vy, Hr[None, :, 1])
    nr3, fr3 = slab(pz, vz, Hr[None, :, 2])
    tnr = jnp.maximum(nr1, jnp.maximum(nr2, nr3))
    tfr = jnp.minimum(fr1, jnp.minimum(fr2, fr3))
    t_room = jnp.where(tnr <= 0.0, jnp.maximum(tfr, 0.0), 0.0)

    # sphere (he == 0): exact quadratic
    oc = o[:, None, :] - c[None]
    b_s = jnp.sum(oc * d[:, None, :], -1)
    c_s = jnp.sum(oc * oc, -1) - (rad[None] + eps) ** 2
    disc = b_s * b_s - c_s
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_in, t_out = -b_s - sq, -b_s + sq
    t_sphere = jnp.where(
        disc > 0.0,
        jnp.where(t_in >= 0.0, t_in, jnp.where(t_out > 0.0, 0.0, big)),
        big,
    )
    is_sphere = (jnp.sum(he, -1) < 1e-6)[None]
    t_fam0 = jnp.where(sign[None] < 0.0, t_room,
                       jnp.where(is_sphere, t_sphere, t_solid))

    # --- family 1: capsule = cylinder body ∪ two cap spheres -------------
    a = params[:, 0:3]
    bp = params[:, 3:6]
    ba = bp - a  # (K, 3)
    oa = o[:, None, :] - a[None]  # (R, K, 3)
    baba = jnp.sum(ba * ba, -1)[None]
    bard = jnp.sum(ba[None] * d[:, None, :], -1)
    baoa = jnp.sum(ba[None] * oa, -1)
    rdoa = jnp.sum(d[:, None, :] * oa, -1)
    oaoa = jnp.sum(oa * oa, -1)
    re_ = rad[None] + eps
    A = baba - bard * bard
    B = baba * rdoa - baoa * bard
    Cq = baba * oaoa - baoa * baoa - re_ ** 2 * baba
    hq = B * B - A * Cq
    t_cyl = (-B - jnp.sqrt(jnp.maximum(hq, 0.0))) / jnp.maximum(A, 1e-9)
    ycyl = baoa + t_cyl * bard
    cyl_ok = (hq > 0.0) & (A > 1e-7) & (ycyl >= 0.0) & (ycyl <= baba) & (
        t_cyl >= 0.0
    )

    def cap_sphere(center):
        occ = o[:, None, :] - center[None]
        bb = jnp.sum(occ * d[:, None, :], -1)
        cc = jnp.sum(occ * occ, -1) - re_ ** 2
        dd = bb * bb - cc
        ti = -bb - jnp.sqrt(jnp.maximum(dd, 0.0))
        return jnp.where((dd > 0.0) & (ti >= 0.0), ti, big)

    t_cap = jnp.minimum(jnp.where(cyl_ok, t_cyl, big),
                        jnp.minimum(cap_sphere(a), cap_sphere(bp)))
    # origin inside a static capsule → marched semantics hit at t = 0
    h0 = jnp.clip(baoa / jnp.maximum(baba, 1e-9), 0.0, 1.0)
    e0 = oa - ba[None] * h0[..., None]
    inside0 = jnp.sum(e0 * e0, -1) <= re_ ** 2
    t_cap = jnp.where(inside0, 0.0, t_cap)

    t_prim = jnp.where(fam[None] < 0.5, t_fam0, t_cap)
    t_prim = jnp.where(act[None] > 0.5, t_prim, big)
    t0 = jnp.min(t_prim, -1)

    # dynamic objects: spheres with origin-inside self-exclusion (a drone's
    # own body must not occlude its camera — `_scene_sdf_fn` parity)
    if obj_pos is not None:
        oco = o[:, None, :] - obj_pos[None]
        bo = jnp.sum(oco * d[:, None, :], -1)
        co = jnp.sum(oco * oco, -1) - (obj_radius[None] + eps) ** 2
        do = bo * bo - co
        tio = -bo - jnp.sqrt(jnp.maximum(do, 0.0))
        excl = jnp.sum(oco * oco, -1) <= (obj_radius[None] + 0.05) ** 2
        t_obj = jnp.where((do > 0.0) & (tio >= 0.0) & ~excl, tio, big)
        t0 = jnp.minimum(t0, jnp.min(t_obj, -1))

    return jnp.clip(t0, 0.0, max_depth)


def _trace_one_scene(
    params: Array,
    origins: Array,
    dirs: Array,
    obj_pos: Optional[Array],
    obj_radius: Optional[Array],
    n_steps: int,
    max_depth: float,
    eps: float,
    t_init: Optional[Array] = None,
    compute_dtype=jnp.bfloat16,
) -> Tuple[Array, Array]:
    """Trace R rays against one scene's primitives (+ dynamic objects).

    Marching distances are evaluated in ``compute_dtype`` (default bfloat16 —
    2× VPU rate; a bf16 ulp at 16 m is ~6 cm, absorbed by the march), the
    accumulated t stays float32, and the final refinement step runs in full
    float32 — measured p99 depth error ≤3 cm vs a 256-step f32 reference."""
    sdf_f32 = _scene_sdf_fn(params, obj_pos, obj_radius, origins)
    if compute_dtype == jnp.float32:
        sdf_march = sdf_f32
    else:
        params_c = params.astype(compute_dtype)
        obj_pos_c = None if obj_pos is None else obj_pos.astype(compute_dtype)
        obj_rad_c = None if obj_radius is None else obj_radius.astype(compute_dtype)
        sdf_c = _scene_sdf_fn(params_c, obj_pos_c, obj_rad_c,
                              None if obj_pos is None else origins.astype(compute_dtype))
        sdf_march = lambda p: sdf_c(p.astype(compute_dtype)).astype(jnp.float32)

    def body(_, carry):
        t, done = carry
        p = origins + dirs * t[:, None]
        d = sdf_march(p)
        done = done | (d < eps) | (t >= max_depth)
        t = jnp.where(done, t, t + d)
        return t, done

    t0 = (
        jnp.zeros(origins.shape[0], origins.dtype)
        if t_init is None
        else t_init.astype(origins.dtype)
    )
    done0 = jnp.zeros(origins.shape[0], bool)
    t, done = jax.lax.fori_loop(0, n_steps, body, (t0, done0))
    # full-precision refinement: advance by the residual signed distance
    t = jnp.clip(t + sdf_f32(origins + dirs * t[:, None]), 0.0, max_depth)
    # rays that exhausted the step budget without converging (grazing
    # incidence) report the marched t — a tight lower bound on the true
    # depth — rather than snapping to background.
    hit = t < max_depth
    return jnp.where(hit, t, max_depth), hit


def _trace_cones_one_scene(
    params: Array,
    origins: Array,  # (T, 3)
    dirs: Array,  # (T, 3) tile-centre directions
    tan: Array,  # (T,) cone half-angle tangents
    obj_pos: Optional[Array],
    obj_radius: Optional[Array],
    n_steps: int,
    max_depth: float,
    eps: float,
) -> Array:
    """Conservative cone march (hierarchical prepass): advance while the SDF
    exceeds the cone radius t·tanθ; the returned t cannot overshoot the
    first hit of ANY pixel ray inside the cone. Damped step (÷(1+tanθ))
    keeps the between-sample invariant for off-axis rays."""
    sdf = _scene_sdf_fn(params, obj_pos, obj_radius, origins)
    damp = 1.0 / (1.0 + tan)

    def body(_, carry):
        t, done = carry
        p = origins + dirs * t[:, None]
        d = sdf(p)
        margin = d - t * tan
        done = done | (margin < eps) | (t >= max_depth)
        t = jnp.where(done, t, t + margin * damp)
        return t, done

    t0 = jnp.zeros(origins.shape[0], origins.dtype)
    done0 = jnp.zeros(origins.shape[0], bool)
    t, _done = jax.lax.fori_loop(0, n_steps, body, (t0, done0))
    return jnp.maximum(t - 2.0 * eps, 0.0)


def trace_grouped(
    scene: PrimitiveScene,
    origins: Array,  # (S, R, 3)
    dirs: Array,  # (S, R, 3)
    objects=None,  # (obj_pos (S, M, 3), obj_radius (S, M)) or None
    n_steps: int = 40,
    max_depth: float = DEFAULT_MAX_DEPTH,
    t_init: Optional[Array] = None,  # (S, R) warm-start distances
    compute_dtype=jnp.bfloat16,
    mode: str = "march",  # "analytic" → closed-form t₀ + short refine
    refine_steps: int = 0,
) -> Tuple[Array, Array]:
    eps = scene.eps
    analytic = mode == "analytic"
    if analytic:
        # exact candidates replace the march; refine_steps=0 is exact for
        # every preset primitive (t within 1e-3 of refine_steps=2, hits
        # identical — `test_analytic_kernel_matches_xla`) and
        # saves one culled-SDF eval per step per refine. Scenes hand-built
        # with GENERAL rounded boxes (he>0 AND radius>0 — `pack_scenes`
        # warns) need refine_steps≥4 to converge their lower-bound slab
        # candidates; `_march` always appends one final residual eval.
        n_steps = refine_steps
        compute_dtype = jnp.float32

    def fn(prm, o, d, op, orad, t0):
        if analytic:
            t0 = jax.lax.stop_gradient(
                _analytic_t0(prm, o, d, op, orad, max_depth))
        return _trace_one_scene(prm, o, d, op, orad, n_steps, max_depth, eps,
                                t0, compute_dtype)

    if t_init is None:
        t_init = jnp.zeros(origins.shape[:2], origins.dtype)
    if objects is None:
        return jax.vmap(lambda prm, o, d, t0: fn(prm, o, d, None, None, t0))(
            scene.params, origins, dirs, t_init)
    obj_pos, obj_radius = objects[0], objects[1]
    return jax.vmap(fn)(scene.params, origins, dirs, obj_pos, obj_radius,
                        t_init)


def trace_cones_grouped(
    scene: PrimitiveScene,
    origins: Array,  # (S, T, 3)
    dirs: Array,  # (S, T, 3)
    tan: Array,  # (S, T)
    objects=None,
    n_steps: int = 32,
    max_depth: float = DEFAULT_MAX_DEPTH,
) -> Array:
    eps = scene.eps
    if objects is None:
        fn = lambda prm, o, d, tg: _trace_cones_one_scene(
            prm, o, d, tg, None, None, n_steps, max_depth, eps
        )
        return jax.vmap(fn)(scene.params, origins, dirs, tan)
    obj_pos, obj_radius = objects[0], objects[1]
    fn = lambda prm, o, d, tg, op, orad: _trace_cones_one_scene(
        prm, o, d, tg, op, orad, n_steps, max_depth, eps
    )
    return jax.vmap(fn)(scene.params, origins, dirs, tan, obj_pos, obj_radius)


# ---------------------------------------------------------------------------
# flat path (grid scenes) — kept for imported meshes
# ---------------------------------------------------------------------------


def _object_sphere_hits(objects, o, d, max_depth):
    """Nearest dynamic-object sphere hit per ray (``o``/``d`` (S, R, 3)) —
    lets cameras see drones/moving obstacles in MESH-backed scenes (tri and
    grid backends), matching the primitive kernels' composition. Spheres
    containing a ray's origin are excluded (a drone's own body — the same
    self-exclusion rule as `prepare_kernel_scene`'s dynamic capsules).
    Returns (t (S, R) — BIG where no hit, hit (S, R), normal (S, R, 3),
    color (S, R, 3) f32 — the winning object's albedo, 0 where none)."""
    obj_pos, obj_radius = objects[0], objects[1]
    if len(objects) > 2 and objects[2] is not None:
        obj_color = objects[2].astype(o.dtype)
    else:
        obj_color = jnp.full(obj_pos.shape, 110.0, o.dtype)
    t0 = jnp.full(o.shape[:2], BIG, o.dtype)
    n0 = jnp.zeros_like(o)

    # scan over objects: O(R) memory and one traced body (a Python unroll
    # emits M copies — at swarm scale, hundreds — bloating compile; a fully
    # batched (S, M, R) form costs M× the ray arrays in HBM)
    def body(carry, obj):
        t, n, col = carry
        c, r, oc_ = obj  # (S, 3), (S,), (S, 3)
        c = c[:, None]
        r = r[:, None]
        e = c - o
        b = jnp.sum(e * d, -1)
        ee = jnp.sum(e * e, -1)
        disc = b * b - (ee - r * r)
        tm = b - jnp.sqrt(jnp.maximum(disc, 0.0))
        ok = ((disc > 0.0) & (tm > 1e-4) & (ee > r * r) & (r > 1e-6)
              & (tm < max_depth))
        tm = jnp.where(ok, tm, BIG)
        better = tm < t
        p = o + d * tm[..., None]
        nm = (p - c) / jnp.maximum(r[..., None], 1e-9)
        n = jnp.where(better[..., None], nm, n)
        col = jnp.where(better[..., None], oc_[:, None], col)
        return (jnp.minimum(t, tm), n, col), None

    (t, n, col), _ = jax.lax.scan(
        body, (t0, n0, jnp.zeros_like(o)),
        (obj_pos.transpose(1, 0, 2), obj_radius.transpose(1, 0),
         obj_color.transpose(1, 0, 2)))
    return t, t < max_depth, n, col


def _object_mesh_hits(objects, o, d, max_depth):
    """Nearest dynamic-object hit per ray with TRUE render geometry: each
    object's local-frame triangle template (``objects[3]`` (S, M, K, 9),
    zero rows = padding) is posed at its current position (+ optional unit
    quaternion ``objects[4]`` (S, M, 4) — drone bodies rotate with the
    airframe) and intersected exactly; all-zero templates fall back to the
    analytic bounding sphere in the same pass. This is the tracer-side
    equivalent of the reference inserting object/drone GLBs into the
    habitat scene graph (`SceneManager.py:247-255,853-866`). The
    self-exclusion rule is shared with the sphere path: rays whose origin
    lies inside an object's bounding sphere ignore that object (a drone
    never sees its own body). Returns (t, hit, normal, color) shaped like
    :func:`_object_sphere_hits`."""
    mesh = objects[3] if len(objects) > 3 else None
    if mesh is None:
        return _object_sphere_hits(objects, o, d, max_depth)
    obj_pos, obj_radius = objects[0], objects[1]
    obj_color = (objects[2] if objects[2] is not None
                 else jnp.full(obj_pos.shape, 110.0, o.dtype))
    quat = objects[4] if len(objects) > 4 else None
    if quat is None:
        quat = jnp.zeros((*obj_pos.shape[:2], 4), o.dtype).at[..., 0].set(1.0)

    from ..core import quaternion as quat_mod

    t0 = jnp.full(o.shape[:2], BIG, o.dtype)
    n0 = jnp.zeros_like(o)

    def body(carry, obj):
        t, n, col = carry
        c, r, oc_, tris_l, q = obj  # (S,3) (S,) (S,3) (S,K,9) (S,4)
        has_mesh = jnp.any(jnp.abs(tris_l) > 0.0, axis=(-2, -1))  # (S,)
        # bounding sphere (also the fallback + the self-exclusion test)
        e = c[:, None] - o
        b = jnp.sum(e * d, -1)
        ee = jnp.sum(e * e, -1)
        rr = (r * r)[:, None]
        disc = b * b - (ee - rr)
        ts = b - jnp.sqrt(jnp.maximum(disc, 0.0))
        outside = ee > rr  # origin outside -> object visible to this ray
        ok_s = ((disc > 0.0) & (ts > 1e-4) & outside & (r[:, None] > 1e-6)
                & (ts < max_depth))
        ts = jnp.where(ok_s, ts, BIG)
        p_s = o + d * ts[..., None]
        n_s = (p_s - c[:, None]) / jnp.maximum(r[:, None, None], 1e-9)

        # posed template -> world triangles (S, K, 3, 3)
        R = quat_mod.to_rotation_matrix(q)  # (S, 3, 3)
        v_l = tris_l.reshape(*tris_l.shape[:-2], -1, 3)  # (S, 3K, 3)
        v_w = jnp.einsum("sij,skj->ski", R, v_l) + c[:, None]
        tri = v_w.reshape(*tris_l.shape[:-1], 3, 3)
        a_, b_, c_ = tri[..., 0, :], tri[..., 1, :], tri[..., 2, :]
        e1 = b_ - a_
        e2 = c_ - a_
        # Möller–Trumbore, rays (S, R, 3) × tris (S, K, 3): (S, R, K)
        h = jnp.cross(d[:, :, None], e2[:, None])
        det = jnp.sum(e1[:, None] * h, -1)
        inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        s_ = o[:, :, None] - a_[:, None]
        u = jnp.sum(s_ * h, -1) * inv
        qv = jnp.cross(s_, e1[:, None])
        v = jnp.sum(d[:, :, None] * qv, -1) * inv
        tk = jnp.sum(e2[:, None] * qv, -1) * inv
        ok_m = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0)
                & (u + v <= 1.0) & (tk > 1e-4) & (tk < max_depth))
        tk = jnp.where(ok_m, tk, BIG)
        kid = jnp.argmin(tk, -1)  # (S, R)
        tm = jnp.take_along_axis(tk, kid[..., None], -1)[..., 0]
        fn = jnp.cross(e1, e2)
        fn = fn / jnp.maximum(
            jnp.linalg.norm(fn, axis=-1, keepdims=True), 1e-12)
        n_m = jnp.take_along_axis(fn, kid[..., None], axis=1)  # (S, R, 3)
        # orient the face normal toward the viewer (templates are soups)
        n_m = jnp.where(jnp.sum(n_m * d, -1, keepdims=True) > 0, -n_m, n_m)
        tm = jnp.where(outside & has_mesh[:, None], tm, BIG)

        t_obj = jnp.where(has_mesh[:, None], tm, ts)
        n_obj = jnp.where(has_mesh[:, None, None], n_m, n_s)
        better = t_obj < t
        n = jnp.where(better[..., None], n_obj, n)
        col = jnp.where(better[..., None], oc_[:, None], col)
        return (jnp.minimum(t, t_obj), n, col), None

    (t, n, col), _ = jax.lax.scan(
        body, (t0, n0, jnp.zeros_like(o)),
        (obj_pos.transpose(1, 0, 2), obj_radius.transpose(1, 0),
         obj_color.transpose(1, 0, 2), mesh.transpose(1, 0, 2, 3),
         quat.transpose(1, 0, 2)))
    return t, t < max_depth, n, col


def trace_rays(
    data,
    sid: Array,
    origins: Array,
    dirs: Array,
    n_steps: int = 48,
    max_depth: float = DEFAULT_MAX_DEPTH,
    hit_eps: Optional[float] = None,
) -> Tuple[Array, Array]:
    """Flat-batch sphere trace; polymorphic over scene backends."""
    if isinstance(data, PrimitiveScene):
        eps = data.eps if hit_eps is None else hit_eps
        min_step = 0.0
    else:
        eps = data.spacing * 0.3 if hit_eps is None else hit_eps
        min_step = data.spacing * 0.5

    def body(_, carry):
        t, done = carry
        p = origins + dirs * t[:, None]
        d = sample_sdf(data, sid, p)
        done = done | (d < eps) | (t >= max_depth)
        t = jnp.where(done, t, t + jnp.maximum(d, min_step))
        return t, done

    t0 = jnp.zeros(origins.shape[0], origins.dtype)
    done0 = jnp.zeros(origins.shape[0], bool)
    t, done = jax.lax.fori_loop(0, n_steps, body, (t0, done0))
    t = jnp.clip(t + sample_sdf(data, sid, origins + dirs * t[:, None]), 0.0, max_depth)
    hit = t < max_depth
    return jnp.where(hit, t, max_depth), hit


# ---------------------------------------------------------------------------
# camera rendering
# ---------------------------------------------------------------------------


def _shade_primitive(
    scene: PrimitiveScene,
    p_hit: Array,  # (S, R, 3)
    hit: Array,  # (S, R)
    want: str,
    lighting=None,
) -> Array:
    """Color/semantic via one-hot matmul over the per-scene primitive tables
    (MXU-friendly; no gathers)."""

    # one-hot matmuls MUST run at full f32: the TPU default is bf16 inputs
    # (~8 mantissa bits), which truncates primitive centers/extents before
    # the closed-form normal (measured: 4.8% of hit pixels get a wrong-face/
    # flipped normal) and corrupts semantic ids ≥ 128. K is tiny — HIGHEST
    # costs nothing here.
    dot = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)

    def per_scene(params, colors, semantic, pts, hit_s):
        d = prim_distances(params, pts)  # (R, K)
        onehot = jax.nn.one_hot(jnp.argmin(d, axis=-1), d.shape[-1], dtype=pts.dtype)
        if want == "semantic":
            sem = dot(onehot, semantic.astype(pts.dtype))
            return jnp.where(hit_s, sem, 0.0)
        albedo = dot(onehot, colors)  # (R, 3)
        # Lambertian normal from the NEAREST primitive only: the scene SDF
        # is a hard min, so ∇min == ∇(argmin prim) — differentiating the
        # K-prim scene sum would cost K× more for the identical normal.
        # Per-ray prim params via one-hot matmul (MXU), no gathers; the
        # normal itself is closed-form (test_prim_normal_single_matches_grad).
        prow = dot(onehot, params)  # (R, 12)
        n = prim_normal_single(prow, pts)
        shade = lambert_shade(n, pts, lighting)
        return jnp.where(hit_s[:, None], albedo * shade, 0.0)

    return jax.vmap(per_scene)(scene.params, scene.colors, scene.semantic, p_hit, hit)


def _shade_primitive_indexed(
    scene: PrimitiveScene,
    p_hit: Array,  # (S, R, 3)
    hit: Array,  # (S, R)
    kid: Array,  # (S, R) winning primitive id from the kernel (−1 = none)
    want: str,
    lighting=None,
) -> Array:
    """Shading when the trace kernel already reported the winning primitive:
    ~K× cheaper than :func:`_shade_primitive` — no per-pixel all-K distance
    pass, just one-hot row selection (MXU) + the closed-form normal.
    Pixels whose winner is a dynamic object (kid −1) have no row in the
    color/semantic tables: they shade drone-body gray (the reference
    renders imported DJI-Mavic glbs there, `SceneManager.py:252-254`) with
    the reserved semantic id 255."""
    dot = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)

    def per_scene(params, colors, semantic, pts, hit_s, kid_s):
        K = params.shape[0]
        dyn_px = kid_s < 0
        onehot = (kid_s[:, None] == jnp.arange(K, dtype=kid_s.dtype)).astype(
            pts.dtype
        )
        if want == "semantic":
            sem = dot(onehot, semantic.astype(pts.dtype))
            sem = jnp.where(dyn_px, 255.0, sem)
            return jnp.where(hit_s, sem, 0.0)
        albedo = dot(onehot, colors)  # (R, 3)
        albedo = jnp.where(dyn_px[:, None], 110.0, albedo)
        prow = dot(onehot, params)  # (R, 12)
        n = prim_normal_single(prow, pts)
        shade = lambert_shade(n, pts, lighting)
        # dynamic pixels have no primitive row for a normal — flat shade
        shade = jnp.where(dyn_px[:, None], 0.75, shade)
        return jnp.where(hit_s[:, None], albedo * shade, 0.0)

    return jax.vmap(per_scene)(scene.params, scene.colors, scene.semantic,
                               p_hit, hit, kid)


def render_camera(
    data,
    sid: Array,
    pos: Array,
    q: Array,
    spec: Dict,
    n_steps: int = 40,
    max_depth: float = DEFAULT_MAX_DEPTH,
    objects=None,
    num_scene: Optional[int] = None,
    lighting=None,
) -> Dict[str, Array]:
    """Render one sensor for N agents. Output layouts match the reference
    observation pipeline (`droneEnv.py:296-333`):
    depth (N,1,H,W) f32 · color (N,3,H,W) uint8 · semantic (N,1,H,W) uint8.

    Agents must be ordered scene-contiguously (they are: scene id =
    agent // num_agent_per_scene)."""
    stype = str(spec.get("sensor_type", spec.get("uuid", "depth"))).lower()
    H, W = spec["resolution"]
    n = pos.shape[0]

    if isinstance(data, PrimitiveScene):
        S = data.num_scene if num_scene is None else num_scene
        R = (n // S) * H * W

        backend = spec.get("render_backend", "pallas")
        # "analytic" (default): closed-form ray–primitive intersection +
        # short residual refine — exact geometry, ~20× fewer VPU flops than
        # the 40-step march. "march": classic sphere trace (opt-in, e.g. for
        # custom SDFs or march-semantics comparisons).
        trace_mode = str(spec.get("trace_mode", "analytic"))
        # objects carrying triangle templates (drone bodies, model_path
        # objects) compose AFTER the trace with true geometry
        # (`_object_mesh_hits`, shared with the tri/grid backends) — the
        # kernel only ever sees the static scene; template-less object
        # soups keep the historic in-kernel sphere path unchanged
        mesh_objs = (objects is not None and len(objects) > 3
                     and objects[3] is not None)
        kern_objects = None if mesh_objs else objects
        use_pallas = (
            backend == "pallas"
            and jax.default_backend() == "tpu"
            and R % 1024 == 0
            and int(spec.get("tile", 1)) <= 1
        )
        if use_pallas:
            # component-major fast path: rays never exist as (R, 3) arrays
            from .camera import camera_rays_components
            from .pallas_trace import pallas_trace_diff_c, prepare_kernel_scene

            o_c, d_c, cos_flat = camera_rays_components(spec, pos, q)
            o_full = jnp.broadcast_to(
                o_c[:, :, None], (3, n, H * W)
            ).reshape(3, S, R)
            d_full = d_c.reshape(3, S, R)
            kscene = prepare_kernel_scene(data, kern_objects)
            t0 = jnp.zeros((S, R), o_full.dtype)
            # the winning-primitive id output is only materialised when
            # shading needs it (color/semantic) — depth renders skip the
            # in-kernel tracking (~4% of the frame)
            want_kid = stype != "depth" and trace_mode == "analytic"
            out = pallas_trace_diff_c(
                kscene, o_full, d_full, t0,
                int(spec.get("trace_steps_override", n_steps)), max_depth,
                float(spec.get("march_omega", 1.0)),
                bool(spec.get("cull", True)),
                # frustum-plane culling only when a kernel tile never spans
                # two cameras (exact wedge needs a single apex)
                W if (H * W) % 1024 == 0 else None,
                trace_mode == "analytic",
                int(spec.get("analytic_refine", 0)),
                want_kid,
            )
            t, hit = out[0], out[1]
            kid = out[2] if want_kid else None
            # named for remat policies: trainers save the kernel outputs so
            # a jax.checkpoint'd backward pass never replays the Mosaic
            # kernel (grad+remat+scan over its forward is a pathological
            # Mosaic compile — see DEVIATIONS.md)
            from jax.ad_checkpoint import checkpoint_name

            t = checkpoint_name(t, "pallas_render")
            hit = checkpoint_name(hit, "pallas_render")
            if kid is not None:
                kid = checkpoint_name(kid, "pallas_render")
            obj_px = None
            if mesh_objs:
                o_pm = jnp.transpose(o_full, (1, 2, 0))
                d_pm = jnp.transpose(d_full, (1, 2, 0))
                t_o, hit_o, n_o, c_o = _object_mesh_hits(objects, o_pm, d_pm,
                                                         max_depth)
                obj_px = hit_o & (t_o < jnp.where(hit, t, max_depth))
                t = jnp.where(obj_px, t_o, t)
                hit = hit | obj_px
            t_img = t.reshape(n, H, W)
            hit_img = hit.reshape(n, H, W)
            if stype == "depth":
                depth = jnp.where(hit_img, t_img * cos_flat.reshape(1, H, W),
                                  max_depth)
                return {"depth": depth[:, None, :, :]}
            # shading needs point-major arrays — convert once off the march
            if not mesh_objs:
                o_pm = jnp.transpose(o_full, (1, 2, 0))
                d_pm = jnp.transpose(d_full, (1, 2, 0))
            p_hit = o_pm + d_pm * t[..., None]
            if kid is not None:
                # the kernel reported the winning primitive — shading skips
                # the per-pixel all-K distance pass entirely
                shaded = _shade_primitive_indexed(data, p_hit, hit, kid,
                                                  stype, lighting)
            else:
                shaded = _shade_primitive(data, p_hit, hit, stype, lighting)
            if obj_px is not None:
                # object pixels shade with the OBJECT's albedo and mesh
                # normal (the reference's GL pass over inserted GLBs,
                # `SceneManager.py:252-254,853-866`)
                if stype == "semantic":
                    shaded = jnp.where(obj_px, 255.0, shaded)
                else:
                    rgb_o = c_o * lambert_shade(n_o, p_hit, lighting)
                    shaded = jnp.where(obj_px[..., None], rgb_o, shaded)
            if stype == "semantic":
                sem = jnp.round(shaded).astype(jnp.uint8).reshape(n, H, W)
                return {"semantic": sem[:, None, :, :]}
            rgb = jnp.clip(shaded, 0, 255).astype(jnp.uint8).reshape(n, H, W, 3)
            return {"color": jnp.transpose(rgb, (0, 3, 1, 2))}

    origins, dirs, cos_f = camera_rays(spec, pos, q)

    if isinstance(data, PrimitiveScene):
        o_g = jnp.broadcast_to(origins[:, None, :], (n, H * W, 3)).reshape(S, R, 3)
        d_g = dirs.reshape(S, R, 3)

        # optional hierarchical prepass: one conservative cone per tile of
        # pixels, then per-pixel rays warm-start from the tile depth. Off by
        # default: in cluttered rooms grazing rays dominate and the halved
        # per-pixel budget costs more accuracy than the prepass buys.
        t_init = None
        pixel_steps = n_steps
        tile = int(spec.get("tile", 1))
        # analytic tracing discards warm starts (the closed-form candidate
        # replaces t0 in both the XLA and Pallas sub-backends), so the cone
        # prepass would be dead compute — skip it entirely
        if trace_mode == "analytic":
            tile = 1
        if tile > 1 and H % tile == 0 and W % tile == 0 and H >= tile:
            from .camera import tile_cones_body
            from ..core import quaternion as quat

            tdirs_body, ttan = tile_cones_body(spec, tile)
            if tdirs_body is not None:
                Tn = tdirs_body.shape[0]
                tb = jnp.asarray(tdirs_body).reshape(1, Tn, 3)
                tdirs = quat.rotate_fused(
                    q[:, None, :], jnp.broadcast_to(tb, (n, Tn, 3))
                )
                to_g = jnp.broadcast_to(
                    origins[:, None, :], (n, Tn, 3)
                ).reshape(S, (n // S) * Tn, 3)
                td_g = tdirs.reshape(S, (n // S) * Tn, 3)
                tan_g = jnp.broadcast_to(
                    jnp.asarray(ttan)[None], (n, Tn)
                ).reshape(S, (n // S) * Tn)
                t_tile = trace_cones_grouped(
                    data, to_g, td_g, tan_g, kern_objects, n_steps, max_depth
                )
                # expand (n, Ht, Wt) tile depths to per-pixel warm starts
                t_tile = t_tile.reshape(n, H // tile, W // tile)
                t_px = jnp.repeat(jnp.repeat(t_tile, tile, axis=1), tile, axis=2)
                t_init = t_px.reshape(S, R)
                pixel_steps = max(8, n_steps // 2)

        backend = spec.get("render_backend", "pallas")
        use_pallas = (
            backend == "pallas"
            and jax.default_backend() == "tpu"
            and R % 1024 == 0
        )
        if use_pallas:
            # fused Pallas march (measured 2.1× the XLA path at full f32);
            # differentiable via the implicit-function-theorem custom VJP
            from .pallas_trace import pallas_trace_diff, prepare_kernel_scene

            kscene = prepare_kernel_scene(data, kern_objects)
            t0 = jnp.zeros((S, R), o_g.dtype) if t_init is None else t_init
            t, hit, _kid = pallas_trace_diff(kscene, o_g, d_g, t0,
                                             pixel_steps, max_depth)
            from jax.ad_checkpoint import checkpoint_name

            t = checkpoint_name(t, "pallas_render")
            hit = checkpoint_name(hit, "pallas_render")
        else:
            compute_dtype = jnp.dtype(spec.get("render_dtype", "bfloat16"))
            trace_mode = str(spec.get("trace_mode", "analytic"))
            t, hit = trace_grouped(data, o_g, d_g, kern_objects, pixel_steps,
                                   max_depth, t_init=t_init,
                                   compute_dtype=compute_dtype,
                                   mode=trace_mode,
                                   refine_steps=int(
                                       spec.get("analytic_refine", 0)))
        obj_px = None
        if mesh_objs:
            t_o, hit_o, n_o, c_o = _object_mesh_hits(objects, o_g, d_g,
                                                     max_depth)
            obj_px = hit_o & (t_o < jnp.where(hit, t, max_depth))
            t = jnp.where(obj_px, t_o, t)
            hit = hit | obj_px
        t_flat = t.reshape(n, H, W)
        hit_flat = hit.reshape(n, H, W)
        if stype == "depth":
            depth = jnp.where(hit_flat, t_flat * cos_f, max_depth)
            return {"depth": depth[:, None, :, :]}
        p_hit = o_g + d_g * t[..., None]
        shaded = _shade_primitive(data, p_hit, hit, stype, lighting)
        if obj_px is not None:
            # object pixels: object albedo × mesh-normal Lambertian (the
            # reference's GL pass over inserted GLBs, `SceneManager.py:
            # 252-254,853-866`)
            if stype == "semantic":
                shaded = jnp.where(obj_px, 255.0, shaded)
            else:
                rgb_o = c_o * lambert_shade(n_o, p_hit, lighting)
                shaded = jnp.where(obj_px[..., None], rgb_o, shaded)
        if stype == "semantic":
            sem = jnp.round(shaded).astype(jnp.uint8).reshape(n, H, W)
            return {"semantic": sem[:, None, :, :]}
        rgb = jnp.clip(shaded, 0, 255).astype(jnp.uint8).reshape(n, H, W, 3)
        return {"color": jnp.transpose(rgb, (0, 3, 1, 2))}

    # EXACT triangle path for imported meshes (`tri_trace.py` — the
    # reference rasterises true triangle geometry, `SceneManager.py:371-389`;
    # here a per-tile-culled Möller–Trumbore Pallas kernel does, with the
    # baked grid still serving collision queries). Default whenever the
    # scene carries triangles; `render_backend: "grid"` opts back into the
    # trilinear SDF march.
    tri = getattr(data, "triangles", ())
    if (getattr(tri, "ndim", 0) == 3
            and str(spec.get("render_backend", "tri")) != "grid"):
        from jax.ad_checkpoint import checkpoint_name

        from .tri_trace import default_tri_cap, tri_trace_diff

        S = data.num_scene
        Rs = (n // S) * H * W
        o_g3 = jnp.broadcast_to(origins[:, None, :], (n, H * W, 3)).reshape(
            S, Rs, 3)
        d_g3 = dirs.reshape(S, Rs, 3)
        o_c3 = jnp.transpose(o_g3, (2, 0, 1))
        d_c3 = jnp.transpose(d_g3, (2, 0, 1))
        use_pallas_tri = (jax.default_backend() == "tpu" and Rs % 1024 == 0)
        t, hit, normal, tri_gid = tri_trace_diff(
            tri, o_c3, d_c3, max_depth,
            int(spec.get("tri_cap", default_tri_cap(tri.shape[1]))),
            W if (use_pallas_tri and (H * W) % 1024 == 0) else None,
            use_pallas_tri,
            H * W if (use_pallas_tri and (H * W) % 1024 == 0) else None,
            # backface culling: exact for watertight consistently-wound
            # meshes (and habitat's GL default); opt-in per sensor because
            # open/soup geometry would lose its far side
            bool(spec.get("tri_backface", False)))
        t = checkpoint_name(t, "pallas_render")
        hit = checkpoint_name(hit, "pallas_render")
        normal = checkpoint_name(normal, "pallas_render")
        tri_gid = checkpoint_name(tri_gid, "pallas_render")
        # dynamic objects (other drones, moving obstacles) composed with
        # their true triangle templates where available (sphere fallback)
        obj_px = jnp.zeros_like(hit)
        obj_col = None
        if objects is not None:
            t_o, hit_o, n_o, c_o = _object_mesh_hits(objects, o_g3, d_g3,
                                                     max_depth)
            obj_px = hit_o & (t_o < t)  # tri t is max_depth on misses
            normal = jnp.where(obj_px[..., None], n_o, normal)
            t = jnp.where(obj_px, t_o, t)
            hit = hit | obj_px
            obj_col = c_o
        t_img = t.reshape(n, H, W)
        hit_img = hit.reshape(n, H, W)
        if stype == "depth":
            depth = jnp.where(hit_img, t_img * cos_f, max_depth)
            return {"depth": depth[:, None, :, :]}
        # color/semantic: albedo/ids from the baked grids at the EXACT hit
        p_hit3 = (o_g3 + d_g3 * t[..., None]).reshape(n * H * W, 3)
        hit_f = hit.reshape(n * H * W)
        # object pixels have no row in the scene albedo/semantic grids —
        # they shade to 0 (the `_shade_primitive_indexed` kid −1 contract)
        obj_f = obj_px.reshape(n * H * W)
        sid_f = jnp.broadcast_to(sid[:, None], (n, H * W)).reshape(-1)
        X, Y, Z = data.sdf.shape[1:]
        g = jnp.round((p_hit3 - data.origin) / data.spacing).astype(jnp.int32)
        g = jnp.clip(g, 0, jnp.asarray([X - 1, Y - 1, Z - 1]))
        lin = ((sid_f * X + g[..., 0]) * Y + g[..., 1]) * Z + g[..., 2]
        if stype == "semantic":
            sem = jnp.take(data.semantic.reshape(-1), lin)
            # dynamic-object pixels get the reserved id 255 (the grids
            # carry no row for runtime operands)
            sem = jnp.where(hit_f & ~obj_f, sem, 0)
            sem = jnp.where(hit_f & obj_f, 255, sem).reshape(n, H, W)
            return {"semantic": sem[:, None, :, :].astype(jnp.uint8)}
        tri_uv = getattr(data, "tri_uv", ())
        if getattr(tri_uv, "ndim", 0) == 3:
            # TEXTURED path: UV-interpolate the winning triangle's corner
            # texcoords at the hit's barycentrics and sample the stacked
            # atlas (nearest texel, wrap) — the habitat GL texture pipeline
            # (`SceneManager.py:1013-1035`) re-expressed as two gathers
            gid_f = tri_gid.reshape(S, Rs)
            rows = jnp.take_along_axis(tri, gid_f[..., None], axis=1)
            uv3 = jnp.take_along_axis(tri_uv, gid_f[..., None], axis=1)
            rect = jnp.take_along_axis(data.tri_rect, gid_f[..., None],
                                       axis=1)
            p3 = (o_g3 + d_g3 * t[..., None])
            va = rows[..., 0:3]
            v0 = rows[..., 3:6] - va
            v1 = rows[..., 6:9] - va
            v2 = p3 - va
            d00 = jnp.sum(v0 * v0, -1)
            d01 = jnp.sum(v0 * v1, -1)
            d11 = jnp.sum(v1 * v1, -1)
            d20 = jnp.sum(v2 * v0, -1)
            d21 = jnp.sum(v2 * v1, -1)
            den = d00 * d11 - d01 * d01
            den = jnp.where(jnp.abs(den) > 1e-12, den, 1.0)
            bu = (d11 * d20 - d01 * d21) / den
            bv = (d00 * d21 - d01 * d20) / den
            uv = (uv3[..., 0:2] * (1.0 - bu - bv)[..., None]
                  + uv3[..., 2:4] * bu[..., None]
                  + uv3[..., 4:6] * bv[..., None])
            uv = uv - jnp.floor(uv)  # glTF REPEAT wrap
            tw, th = rect[..., 0], rect[..., 1]
            col = jnp.clip(jnp.round(uv[..., 0] * (tw - 1.0)), 0,
                           jnp.maximum(tw - 1.0, 0.0)) + rect[..., 3]
            row = jnp.clip(jnp.round(uv[..., 1] * (th - 1.0)), 0,
                           jnp.maximum(th - 1.0, 0.0)) + rect[..., 2]
            AH, AW = data.atlas.shape[1], data.atlas.shape[2]
            lin_t = ((jnp.arange(S)[:, None] * AH
                      + row.astype(jnp.int32)) * AW
                     + col.astype(jnp.int32)).reshape(-1)
            albedo = jnp.take(data.atlas.reshape(-1, 3), lin_t,
                              axis=0).astype(jnp.float32)
        else:
            albedo = jnp.take(data.albedo.reshape(-1, 3), lin,
                              axis=0).astype(jnp.float32)
        if obj_col is not None:
            # dynamic-object pixels shade with the OBJECT's albedo — the
            # reference renders its DJI-Mavic glbs through the same GL
            # pass (`SceneManager.py:252-254`); previously these shaded 0
            albedo = jnp.where(obj_f[:, None], obj_col.reshape(-1, 3),
                               albedo)
        vis = None
        if lighting is not None and len(lighting) > 5 and lighting[5]:
            # opt-in shadow rays against the true soup (exact-tri backend
            # only; dynamic-object templates receive but don't cast)
            vis = shadow_visibility(
                tri, (o_g3 + d_g3 * t[..., None]),
                normal.reshape(S, Rs, 3), lighting)
            vis = vis.reshape(n * H * W, -1)
        shade = lambert_shade(normal.reshape(-1, 3), p_hit3, lighting, vis)
        rgb = jnp.clip(albedo * shade, 0, 255)
        rgb = jnp.where(hit_f[:, None], rgb, 0.0).reshape(n, H, W, 3)
        return {"color": jnp.transpose(rgb, (0, 3, 1, 2)).astype(jnp.uint8)}

    # grid backend (meshes): flat batch with per-ray scene ids
    R = n * H * W
    flat_o = jnp.broadcast_to(origins[:, None, :], (n, H * W, 3)).reshape(R, 3)
    flat_d = dirs.reshape(R, 3)
    flat_sid = jnp.broadcast_to(sid[:, None], (n, H * W)).reshape(R)
    t, hit = trace_rays(data, flat_sid, flat_o, flat_d, n_steps, max_depth)

    obj_flat = jnp.zeros_like(hit)
    obj_col_g = None
    obj_nrm_g = None
    if objects is not None:
        S_g = data.sdf.shape[0] if num_scene is None else num_scene
        t_o, hit_o, n_o, c_o = _object_mesh_hits(
            objects, flat_o.reshape(S_g, R // S_g, 3),
            flat_d.reshape(S_g, R // S_g, 3), max_depth)
        t_o, hit_o = t_o.reshape(R), hit_o.reshape(R)
        obj_flat = hit_o & (t_o < t)
        t = jnp.where(obj_flat, t_o, t)
        hit = hit | obj_flat
        obj_col_g = c_o.reshape(R, 3)
        obj_nrm_g = n_o.reshape(R, 3)

    if stype == "depth":
        depth = jnp.where(hit.reshape(n, H, W), t.reshape(n, H, W) * cos_f, max_depth)
        return {"depth": depth[:, None, :, :]}

    p_hit = flat_o + flat_d * t[:, None]
    X, Y, Z = data.sdf.shape[1:]
    g = jnp.round((p_hit - data.origin) / data.spacing).astype(jnp.int32)
    g = jnp.clip(g, 0, jnp.asarray([X - 1, Y - 1, Z - 1]))
    lin = ((flat_sid * X + g[..., 0]) * Y + g[..., 1]) * Z + g[..., 2]

    if stype == "semantic":
        sem = jnp.take(data.semantic.reshape(-1), lin)
        sem = jnp.where(hit & ~obj_flat, sem, 0)
        sem = jnp.where(hit & obj_flat, 255, sem).reshape(n, H, W)
        return {"semantic": sem[:, None, :, :].astype(jnp.uint8)}

    from ..scene.queries import sdf_normal

    albedo = jnp.take(data.albedo.reshape(-1, 3), lin, axis=0).astype(jnp.float32)
    if obj_col_g is not None:
        albedo = jnp.where(obj_flat[:, None], obj_col_g, albedo)
    normal = sdf_normal(data, flat_sid, p_hit)
    if obj_nrm_g is not None:
        # shade dynamic-object pixels with the SPHERE normal, not the
        # scene SDF's gradient at the hit point (the tri backend already
        # substitutes it — parity between backends)
        normal = jnp.where(obj_flat[:, None], obj_nrm_g, normal)
    shade = lambert_shade(normal, p_hit, lighting)
    rgb = jnp.clip(albedo * shade, 0, 255)
    rgb = jnp.where(hit[:, None], rgb, 0.0).reshape(n, H, W, 3)
    return {"color": jnp.transpose(rgb, (0, 3, 1, 2)).astype(jnp.uint8)}


def render_sensors(env, state) -> Dict[str, Array]:
    """Render every sensor in ``env.sensor_kwargs`` (the per-agent sensor
    suite of `SceneManager.py:1013-1035`), applying each sensor's configured
    noise model (`SceneManager.py:1030-1033` hookup) under the per-step
    PRNG."""
    if env.scene is None:
        return {}
    scene = env._scene_of(state) if hasattr(env, "_scene_of") else env.scene
    out: Dict[str, Array] = {}
    sid = env._scene_ids()
    objects = env.render_objects(state)
    noise_settings = getattr(env, "noise_settings", None) or {}
    # habitat lighting setup from scene_kwargs (baked once per env)
    lighting = getattr(env, "_baked_lighting", False)
    if lighting is False:
        lighting = bake_lighting(env.scene_kwargs.get("lighting"))
        env._baked_lighting = lighting
    for i, spec in enumerate(env.sensor_kwargs):
        res = render_camera(
            scene,
            sid,
            state.dyn.pos,
            state.dyn.q,
            spec,
            n_steps=int(env.scene_kwargs.get("trace_steps", 40)),
            objects=objects,
            num_scene=env.num_scene,
            lighting=lighting,
        )
        for k, v in res.items():
            uuid = spec.get("uuid", k)
            if uuid in noise_settings and uuid != "IMU":
                from .noise import apply_noise

                key = jax.random.fold_in(state.key, 1000 + i)
                v = apply_noise(key, uuid, v, noise_settings)
            out[uuid] = v
    return out
