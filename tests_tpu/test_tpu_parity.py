"""Mosaic-lowered kernels vs the XLA oracles on real TPU hardware.

Interpret mode (the CPU suite) checks kernel MATH; this lane checks the
LOWERING — vector layouts, SMEM scalar prefetch, grid revisiting, DMA
masking — the failure modes interpret mode cannot see. One test per
kernel family, tiny shapes, shared meshes, so the whole lane compiles and
runs in a few minutes over the axon tunnel.

Oracles are the same ones the CPU suite trusts: `trace_grouped` (XLA
primitive tracer) and `tri_trace_xla` (brute-force Möller–Trumbore).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visfly_tpu.core import quaternion as quat
from visfly_tpu.render.camera import camera_rays_components
from visfly_tpu.render.pallas_trace import (TILE, pallas_trace,
                                            pallas_trace_c,
                                            prepare_kernel_scene)
from visfly_tpu.render.sphere_trace import trace_grouped
from visfly_tpu.render import tri_trace as tt
from visfly_tpu.scene import make_scene, pack_scenes


@pytest.fixture(scope="module")
def scene():
    return pack_scenes([make_scene("garage_simple", seed=1)])


def rays(n=TILE, seed=0):
    key = jax.random.PRNGKey(seed)
    o = jnp.asarray([1.0, 0.0, 1.5]) + jax.random.uniform(
        key, (1, n, 3), minval=-1, maxval=1
    ) * jnp.asarray([0.5, 2.0, 0.7])
    d = jax.random.normal(key, (1, n, 3))
    return o, d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def test_march_kernel_matches_xla_on_tpu(scene):
    o, d = rays(2 * TILE)
    t_k, hit_k, _ = pallas_trace(prepare_kernel_scene(scene), o, d,
                                 n_steps=40)
    t_x, hit_x = trace_grouped(scene, o, d, n_steps=40,
                               compute_dtype=jnp.float32)
    assert (np.asarray(hit_k) == np.asarray(hit_x)).all()
    np.testing.assert_allclose(np.asarray(t_k), np.asarray(t_x), atol=1e-3)


@pytest.mark.parametrize("cull", [False, True])
def test_analytic_kernel_matches_xla_on_tpu(scene, cull):
    o, d = rays(2 * TILE, seed=4)
    t_x, hit_x = trace_grouped(scene, o, d, mode="analytic")
    ks = prepare_kernel_scene(scene)
    oc = jnp.transpose(o, (2, 0, 1))
    dc = jnp.transpose(d, (2, 0, 1))
    t_k, hit_k, _ = pallas_trace_c(ks, oc, dc, None, analytic=True,
                                   n_refine=0, cull=cull)
    assert (np.asarray(hit_k) == np.asarray(hit_x)).all()
    np.testing.assert_allclose(np.asarray(t_k), np.asarray(t_x), atol=1e-3)


# --- triangle tiers --------------------------------------------------------


def cube_mesh(center, half):
    c = np.asarray(center, np.float32)
    v = np.asarray([[x, y, z] for x in (-half, half) for y in (-half, half)
                    for z in (-half, half)], np.float32) + c
    f = np.asarray([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],
    ], np.int32)
    return v, f


@pytest.fixture(scope="module")
def camera_workload():
    """192-cube field + one 64×64 camera: triggers per-tile culling and,
    with the right cap/mesh-size arguments, every dense tier."""
    verts, faces = [], []
    for i in range(8):
        for j in range(8):
            for k in range(3):
                v, f = cube_mesh((i * 2.0 + 2.0, j * 2.0 - 8.0, k * 2.0),
                                 0.4)
                faces.append(f + 8 * len(verts))
                verts.append(v)
    tris = jnp.asarray(tt.pack_triangles(np.concatenate(verts),
                                         np.concatenate(faces))[None])
    spec = {"sensor_type": "depth", "resolution": [64, 64]}
    pos = jnp.asarray([[-2.03, 0.011, 1.017]])
    q = quat.from_euler(jnp.zeros(1), jnp.asarray([0.013]),
                        jnp.asarray([0.021]))
    o_c, d_c, _ = camera_rays_components(spec, pos, q)
    o_full = jnp.broadcast_to(o_c[:, :, None], (3, 1, 64 * 64))
    d_full = d_c.reshape(3, 1, -1)
    t_x, hit_x, n_x, *_ = tt.tri_trace_xla(
        tris, jnp.transpose(o_full, (1, 2, 0)),
        jnp.transpose(d_full, (1, 2, 0)))
    return tris, o_full, d_full, np.asarray(t_x), np.asarray(hit_x)


def _check(t, hit, t_x, hit_x, atol=1e-3):
    assert (np.asarray(hit) == hit_x).all()
    np.testing.assert_allclose(np.asarray(t), t_x, atol=atol)


def test_tri_small_tier_on_tpu(camera_workload):
    # cap must cover the worst tile (1,664 visible tris measured on this
    # workload) — at 512 half the tiles overflow and far hits are
    # legitimately dropped (the documented nearest-first contract)
    tris, o_full, d_full, t_x, hit_x = camera_workload
    t, hit, *_ = tt.tri_trace_pallas(tris, o_full, d_full, cap=2048,
                                     img_w=64, cam_rays=64 * 64)
    _check(t, hit, t_x, hit_x)


def test_tri_compactfine_tier_on_tpu(camera_workload):
    tris, o_full, d_full, t_x, hit_x = camera_workload
    t, hit, *_ = tt._tri_trace_pallas_compactfine(
        tris, o_full, d_full, 20.0, tris.shape[1], 64, 64 * 64, False)
    _check(t, hit, t_x, hit_x)


def test_tri_camsoup_tier_on_tpu(camera_workload):
    tris, o_full, d_full, t_x, hit_x = camera_workload
    t, hit, *_ = tt._tri_trace_pallas_camsoup(
        tris, o_full, d_full, 20.0, tris.shape[1], 64, 64 * 64, False)
    _check(t, hit, t_x, hit_x)


def test_tri_camsoup_mx_tier_on_tpu(camera_workload):
    # t re-derived through an fp32 matmul: slightly looser atol
    tris, o_full, d_full, t_x, hit_x = camera_workload
    t, hit, *_ = tt._tri_trace_pallas_camsoup_mx(
        tris, o_full, d_full, 20.0, tris.shape[1], 64, 64 * 64, False)
    _check(t, hit, t_x, hit_x, atol=5e-3)


def test_tri_worklist_tier_on_tpu(camera_workload):
    tris, o_full, d_full, t_x, hit_x = camera_workload
    t, hit, *_ = tt._tri_trace_pallas_worklist(
        tris, o_full, d_full, 20.0, tris.shape[1], 64, 64 * 64, False,
        work_budget=10 ** 6)
    _check(t, hit, t_x, hit_x)
