"""Exact triangle-mesh ray tracing (`render/tri_trace.py`): XLA parity,
interpret-mode Pallas kernel + cull, IFT gradients, and the env round trip.

Parity target: the reference renders imported stages as exact triangle
geometry (`/root/reference/utils/SceneManager.py:371-389`)."""
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from visfly_tpu.render.tri_trace import (
    TILE,
    cull_stats,
    pack_triangles,
    tri_cull_compact,
    tri_trace_diff,
    tri_trace_pallas,
    tri_trace_xla,
)


@pytest.fixture
def interpret_pallas():
    orig = pl.pallas_call

    def patched(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    with mock.patch.object(pl, "pallas_call", patched):
        yield


def cube_mesh(center=(0.0, 0.0, 0.0), half=1.0):
    c = np.asarray(center, np.float32)
    v = np.asarray([[x, y, z] for x in (-half, half) for y in (-half, half)
                    for z in (-half, half)], np.float32) + c
    f = np.asarray([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],
    ], np.int32)
    return v, f


def scene_tris():
    """Two cubes (the decomposition test scene)."""
    v1, f1 = cube_mesh((0.0, 0.0, 0.0), 1.0)
    v2, f2 = cube_mesh((4.0, 0.0, 0.0), 0.8)
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, f2 + len(v1)])
    return jnp.asarray(pack_triangles(verts, faces)[None])  # (1, T, 9)


def rays(n=TILE, seed=0, origin=(-3.0, 0.0, 0.0)):
    key = jax.random.PRNGKey(seed)
    o = jnp.asarray(origin) + jax.random.uniform(
        key, (1, n, 3), minval=-0.5, maxval=0.5)
    d = jax.random.normal(key, (1, n, 3)) + jnp.asarray([2.0, 0.0, 0.0])
    return o, d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def test_xla_bruteforce_geometry():
    tris = scene_tris()
    o = jnp.asarray([[[-3.0, 0.0, 0.0], [2.0, 0.0, 0.0], [0.0, 5.0, 0.0]]])
    d = jnp.asarray([[[1.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, -1.0, 0.0]]])
    t, hit, n, *_ = tri_trace_xla(tris, o, d)
    # ray 1: cube face at x=-1 → t=2; ray 2: second cube at x=3.2 → t=1.2;
    # ray 3: first cube top at y=1 → t=4
    np.testing.assert_allclose(np.asarray(t[0]), [2.0, 1.2, 4.0], atol=1e-5)
    assert bool(hit.all())
    # normals face the rays
    np.testing.assert_allclose(np.asarray(n[0, 0]), [-1, 0, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(n[0, 2]), [0, 1, 0], atol=1e-5)


def test_pallas_matches_xla(interpret_pallas):
    tris = scene_tris()
    o, d = rays(TILE, seed=3)
    t_x, hit_x, n_x, *_ = tri_trace_xla(tris, o, d)
    o_c = jnp.transpose(o, (2, 0, 1))
    d_c = jnp.transpose(d, (2, 0, 1))
    t_p, hit_p, n_p, *_ = tri_trace_pallas(tris, o_c, d_c, cap=32)
    np.testing.assert_array_equal(np.asarray(hit_x), np.asarray(hit_p))
    np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_x), atol=1e-4)
    h = np.asarray(hit_x)[0]
    np.testing.assert_allclose(np.asarray(n_p)[0][h], np.asarray(n_x)[0][h],
                               atol=1e-4)


def test_cull_keeps_image_and_culls(interpret_pallas):
    tris = scene_tris()
    o, d = rays(TILE, seed=5)
    o_c = jnp.transpose(o, (2, 0, 1))
    d_c = jnp.transpose(d, (2, 0, 1))
    # tiny cap still produces the right image for this 24-tri scene when
    # every visible triangle fits
    stats = cull_stats(tris, o_c, d_c, cap=24)
    assert stats["max"] <= tris.shape[1]
    t_full, hit_full, _, *_ = tri_trace_pallas(tris, o_c, d_c,
                                           cap=tris.shape[1])
    t_c, hit_c, _, *_ = tri_trace_pallas(tris, o_c, d_c, cap=24)
    np.testing.assert_array_equal(np.asarray(hit_full), np.asarray(hit_c))
    np.testing.assert_allclose(np.asarray(t_c), np.asarray(t_full),
                               atol=1e-5)


def test_ift_gradient_matches_fd():
    tris = scene_tris()
    o, d = rays(64, seed=7)
    o_c = jnp.transpose(o, (2, 0, 1))
    d_c = jnp.transpose(d, (2, 0, 1))

    def mean_depth(oc):
        t, hit, _, *_ = tri_trace_diff(tris, oc, d_c, 20.0, 32, None, False)
        return jnp.where(hit, t, 0.0).sum()

    g = jax.grad(mean_depth)(o_c)
    assert np.isfinite(np.asarray(g)).all()
    eps = 1e-3
    f_p = mean_depth(o_c.at[0, 0, 0].add(eps))
    f_m = mean_depth(o_c.at[0, 0, 0].add(-eps))
    fd = (f_p - f_m) / (2 * eps)
    np.testing.assert_allclose(float(g[0, 0, 0]), float(fd), atol=0.05)


def test_env_renders_exact_triangles(tmp_path):
    """Env pointed at a mesh with backend='grid' scene data now renders the
    EXACT triangles by default; depth matches the analytic expectation at
    the centre pixel better than one grid spacing."""
    from visfly_tpu.render import render_camera
    from visfly_tpu.scene.mesh import bake_mesh_scene

    v, f = cube_mesh((1.0, 0.0, 0.0), 1.0)
    p = tmp_path / "cube.obj"
    with open(p, "w") as fo:
        for vv in v:
            fo.write(f"v {vv[0]} {vv[1]} {vv[2]}\n")
        for t in f:
            fo.write(f"f {t[0]+1} {t[1]+1} {t[2]+1}\n")
    data = bake_mesh_scene(str(p), spacing=0.08, margin=2.0)
    assert data.triangles.shape[-1] == 9

    pos = jnp.asarray([[-2.0, 0.0, 0.0]])
    q = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    out = render_camera(data, jnp.zeros(1, jnp.int32), pos, q,
                        {"sensor_type": "depth", "resolution": [32, 32]},
                        max_depth=10.0)
    depth = np.asarray(out["depth"])[0, 0]
    # exact: the cube face at x=0 is 2.0 away — tighter than the grid's
    # ~0.08 discretisation
    np.testing.assert_allclose(depth[16, 16], 2.0, atol=0.01)
    # grid opt-out still works
    out_g = render_camera(data, jnp.zeros(1, jnp.int32), pos, q,
                          {"sensor_type": "depth", "resolution": [32, 32],
                           "render_backend": "grid"},
                          n_steps=64, max_depth=10.0)
    np.testing.assert_allclose(np.asarray(out_g["depth"])[0, 0, 16, 16],
                               2.0, atol=0.1)


def test_overflow_keeps_nearest_triangles(interpret_pallas):
    """Distance-priority compaction: when a tile's visible count exceeds
    ``cap``, the NEAREST triangles are kept — the near cube must render
    exactly and only the far cube may degrade to background (never the
    reverse)."""
    tris = scene_tris()  # near cube at x∈[-1,1], far cube at x∈[3.2,4.8]
    o = jnp.zeros((1, TILE, 3)) + jnp.asarray([-3.0, 0.0, 0.0])
    key = jax.random.PRNGKey(11)
    d = jax.random.normal(key, (1, TILE, 3)) * jnp.asarray([0.0, 0.2, 0.2]) \
        + jnp.asarray([1.0, 0.0, 0.0])
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o_c = jnp.transpose(o, (2, 0, 1))
    d_c = jnp.transpose(d, (2, 0, 1))
    t_full, hit_full, _, *_ = tri_trace_pallas(tris, o_c, d_c,
                                           cap=tris.shape[1])
    # cap 8 < the 12 visible near-cube faces alone → guaranteed overflow
    t_c, hit_c, _, *_ = tri_trace_pallas(tris, o_c, d_c, cap=8)
    tf = np.asarray(t_full)[0]
    tc = np.asarray(t_c)[0]
    hf = np.asarray(hit_full)[0]
    hc = np.asarray(hit_c)[0]
    near = hf & (tf < 3.0)  # rays whose true hit is the near cube
    # near-field rays are bit-identical under overflow
    np.testing.assert_array_equal(hc[near], hf[near])
    np.testing.assert_allclose(tc[near], tf[near], atol=1e-6)
    # degraded rays only ever LOSE far hits (t_c >= t_full, i.e. background)
    assert np.all(tc >= tf - 1e-6)


def test_frustum_cull_camera_tiles(interpret_pallas):
    """Camera-grid rays (one tile per camera) enable the exact frustum
    plane cull (img_w): the image must match the unculled trace and the
    prepass must remove triangles behind the cameras."""
    from visfly_tpu.core import quaternion as quat
    from visfly_tpu.render.camera import camera_rays_components

    tris = scene_tris()
    spec = {"sensor_type": "depth", "resolution": [16, 64]}  # 1024 = 1 tile
    pos = jnp.asarray([[-3.0, 0.0, 0.0], [6.5, 0.0, 0.0]])
    yaw = jnp.asarray([0.0, np.pi])  # both look at the cubes
    q = quat.from_euler(jnp.zeros(2), jnp.zeros(2), yaw)
    o_c, d_c, _ = camera_rays_components(spec, pos, q)
    o_full = jnp.broadcast_to(o_c[:, :, None], (3, 2, 1024)).reshape(3, 1, 2048)
    d_full = d_c.reshape(3, 1, 2048)

    _, counts, _, _ = tri_cull_compact(tris, o_full, d_full, 20.0, cap=8,
                                 img_w=64)
    c = np.asarray(counts)
    assert c.max() <= tris.shape[1]
    # camera 2 at x=6.5 looking -x sees both cubes; camera 1 sees both too,
    # but each frustum drops SOME back-facing/behind geometry relative to
    # the no-frustum AABB cull
    _, counts_nofr, _, _ = tri_cull_compact(tris, o_full, d_full, 20.0, cap=8,
                                      img_w=None)
    assert c.sum() <= np.asarray(counts_nofr).sum()

    t_u, hit_u, _, *_ = tri_trace_pallas(tris, o_full, d_full,
                                     cap=tris.shape[1])
    t_c, hit_c, _, *_ = tri_trace_pallas(tris, o_full, d_full,
                                     cap=tris.shape[1], img_w=64)
    np.testing.assert_array_equal(np.asarray(hit_u), np.asarray(hit_c))
    np.testing.assert_allclose(np.asarray(t_c), np.asarray(t_u), atol=1e-5)


def test_cluster_cull_path_matches_xla(interpret_pallas):
    """Meshes past CLUSTER_CULL_MIN_T cull at Morton-cluster granularity
    (`tri_cull_compact` → `_cluster_cull_compact`); with cap covering every
    cluster the image must equal brute force exactly."""
    from visfly_tpu.render.tri_trace import CLUSTER, CLUSTER_CULL_MIN_T

    # grid of small cubes → > CLUSTER_CULL_MIN_T triangles
    verts, faces = [], []
    for i in range(8):
        for j in range(8):
            for k in range(3):
                v, f = cube_mesh((i * 2.0, j * 2.0 - 8.0, k * 2.0), 0.4)
                faces.append(f + 8 * len(verts))
                verts.append(v)
    v = np.concatenate(verts)
    f = np.concatenate(faces)
    assert len(f) > CLUSTER_CULL_MIN_T
    packed = pack_triangles(v, f)
    assert packed.shape[0] % CLUSTER == 0
    # Morton sort permutes rows but keeps the triangle set
    orig = {tuple(np.round(r, 5)) for r in v[f.reshape(-1)].reshape(-1, 9)}
    kept = {tuple(np.round(r, 5)) for r in packed if np.abs(r).sum() > 0}
    assert kept == orig

    tris = jnp.asarray(packed[None])
    o, d = rays(TILE, seed=11, origin=(-4.0, 0.0, 1.0))
    t_x, hit_x, _, *_ = tri_trace_xla(tris, o, d)
    o_c = jnp.transpose(o, (2, 0, 1))
    d_c = jnp.transpose(d, (2, 0, 1))
    t_p, hit_p, _, *_ = tri_trace_pallas(tris, o_c, d_c, cap=tris.shape[1])
    np.testing.assert_array_equal(np.asarray(hit_x), np.asarray(hit_p))
    np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_x), atol=1e-4)


def test_default_tri_cap_scales_with_mesh():
    from visfly_tpu.render.tri_trace import (CLUSTER, CLUSTER_CULL_MIN_T,
                                             default_tri_cap)

    assert default_tri_cap(24) == 24
    assert default_tri_cap(360) == 256
    assert default_tri_cap(CLUSTER_CULL_MIN_T) == 256
    big = default_tri_cap(5760)
    assert big >= 1024 and big % CLUSTER == 0 and big <= 5760
    assert default_tri_cap(100_000) == 25_024  # ~T/4, cluster multiple


def test_mesh_backends_render_dynamic_objects():
    """Dynamic objects (other drones, moving obstacles) must be visible to
    cameras in MESH scenes too, not just primitive scenes — the reference
    draws drone models into any scene (`SceneManager.py:1013-1035`). The
    camera's own sphere (origin inside) is excluded."""
    from visfly_tpu.render.sphere_trace import render_camera
    from visfly_tpu.scene.mesh import bake_scene_from_arrays

    v, f = cube_mesh((6.0, 0.0, 1.0), 1.0)  # wall cube ahead of the camera
    data = bake_scene_from_arrays(v, f, spacing=0.1)
    pos = jnp.asarray([[0.0, 0.0, 1.0]])
    q = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    spec = {"sensor_type": "depth", "resolution": [16, 16]}
    sid = jnp.zeros((1,), jnp.int32)
    # one sphere between camera and wall + the camera's own body
    objects = (jnp.asarray([[[3.0, 0.0, 1.0], [0.0, 0.0, 1.0]]]),
               jnp.asarray([[0.4, 0.4]]))

    cy, cx = 8, 8
    d_no = render_camera(data, sid, pos, q, spec)["depth"][0, 0]
    assert abs(float(d_no[cy, cx]) - 5.0) < 0.25  # cube face at x=5
    for extra in ({}, {"render_backend": "grid"}):
        d = render_camera(data, sid, pos, q, {**spec, **extra},
                          objects=objects)["depth"][0, 0]
        # centre ray now hits the sphere surface at x = 3 - 0.4
        assert abs(float(d[cy, cx]) - 2.6) < 0.25, extra
        # corner rays still reach past the sphere (wall or background)
        assert float(d[0, 0]) > 3.0, extra


def test_shared_soup_path_matches_xla(interpret_pallas, monkeypatch):
    """Huge-mesh shared-soup path (`_tri_trace_pallas_soup`): per-tile
    cluster-ID lists index the kernel's triangle DMA straight out of the
    shared soup. Forced on by lowering the threshold; with cap covering
    every cluster the image must equal brute force."""
    import visfly_tpu.render.tri_trace as tt

    verts, faces = [], []
    for i in range(8):
        for j in range(8):
            for k in range(3):
                v, f = cube_mesh((i * 2.0, j * 2.0 - 8.0, k * 2.0), 0.4)
                faces.append(f + 8 * len(verts))
                verts.append(v)
    v = np.concatenate(verts)
    f = np.concatenate(faces)
    packed = pack_triangles(v, f)
    monkeypatch.setattr(tt, "SHARED_SOUP_MIN_T", packed.shape[0] - 1)

    tris = jnp.asarray(packed[None])
    o, d = rays(TILE, seed=13, origin=(-4.0, 0.0, 1.0))
    t_x, hit_x, _, *_ = tri_trace_xla(tris, o, d)
    o_c = jnp.transpose(o, (2, 0, 1))
    d_c = jnp.transpose(d, (2, 0, 1))
    t_p, hit_p, _, *_ = tri_trace_pallas(tris, o_c, d_c, cap=tris.shape[1])
    np.testing.assert_array_equal(np.asarray(hit_x), np.asarray(hit_p))
    np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_x), atol=1e-4)


def test_shared_soup_multi_scene(interpret_pallas, monkeypatch):
    """Multi-scene soup path: per-scene cluster-ID lists, S-aware SMEM
    group sizing, zero-padded shorter soups."""
    import visfly_tpu.render.tri_trace as tt

    def grid_mesh(nx, ny, z):
        verts, faces = [], []
        for i in range(nx):
            for j in range(ny):
                v, f = cube_mesh((i * 2.0, j * 2.0 - 8.0, z), 0.4)
                faces.append(f + 8 * len(verts))
                verts.append(v)
        return np.concatenate(verts), np.concatenate(faces)

    v1, f1 = grid_mesh(8, 8, 1.0)
    v2, f2 = grid_mesh(8, 6, 0.5)  # fewer cubes → zero-padded soup
    p1, p2 = pack_triangles(v1, f1), pack_triangles(v2, f2)
    T = max(p1.shape[0], p2.shape[0])
    tris = np.zeros((2, T, 9), np.float32)
    tris[0, :p1.shape[0]] = p1
    tris[1, :p2.shape[0]] = p2
    tris = jnp.asarray(tris)
    monkeypatch.setattr(tt, "SHARED_SOUP_MIN_T", T - 1)

    o1, d1 = rays(TILE, seed=21, origin=(-4.0, 0.0, 1.0))
    o2, d2 = rays(TILE, seed=22, origin=(-4.0, 0.0, 0.5))
    o = jnp.concatenate([o1, o2])
    d = jnp.concatenate([d1, d2])
    t_x, hit_x, _, *_ = tri_trace_xla(tris, o, d)
    t_p, hit_p, _, *_ = tri_trace_pallas(tris, jnp.transpose(o, (2, 0, 1)),
                                     jnp.transpose(d, (2, 0, 1)),
                                     cap=T)
    np.testing.assert_array_equal(np.asarray(hit_x), np.asarray(hit_p))
    np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_x), atol=1e-4)


def test_camsoup_path_matches_xla(interpret_pallas, monkeypatch):
    """Dense-mesh per-camera signed-volume path
    (`_tri_trace_pallas_camsoup`) + the square pixel-block repack: a real
    64×64 pinhole camera (whole-camera tiles), threshold lowered to force
    the tier, cap covering every cluster → must equal brute force."""
    import visfly_tpu.render.tri_trace as tt
    from visfly_tpu.core import quaternion as quat
    from visfly_tpu.render.camera import camera_rays_components

    verts, faces = [], []
    for i in range(8):
        for j in range(8):
            for k in range(3):
                v, f = cube_mesh((i * 2.0 + 2.0, j * 2.0 - 8.0, k * 2.0),
                                 0.4)
                faces.append(f + 8 * len(verts))
                verts.append(v)
    packed = pack_triangles(np.concatenate(verts), np.concatenate(faces))
    monkeypatch.setattr(tt, "SHARED_SOUP_MIN_T", packed.shape[0] - 1)
    tris = jnp.asarray(packed[None])

    spec = {"sensor_type": "depth", "resolution": [64, 64]}
    # jittered off the grid's symmetry axes: a centered camera aims dozens
    # of rays EXACTLY along shared cube edges, where f32 rounding
    # legitimately differs between the signed-volume and Möller–Trumbore
    # forms (verified float64-equal); generic poses have no such rays
    pos = jnp.asarray([[-2.03, 0.011, 1.017]])
    q = quat.from_euler(jnp.zeros(1), jnp.asarray([0.013]),
                        jnp.asarray([0.021]))
    o_c, d_c, _ = camera_rays_components(spec, pos, q)
    o_full = jnp.broadcast_to(o_c[:, :, None], (3, 1, 64 * 64))
    d_full = d_c.reshape(3, 1, -1)

    t_p, hit_p, n_p, *_ = tri_trace_pallas(tris, o_full, d_full,
                                       cap=tris.shape[1], img_w=64,
                                       cam_rays=64 * 64)
    t_x, hit_x, n_x, *_ = tri_trace_xla(tris, jnp.transpose(o_full, (1, 2, 0)),
                                    jnp.transpose(d_full, (1, 2, 0)))
    assert int((np.asarray(hit_p) != np.asarray(hit_x)).sum()) == 0
    np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_x), atol=1e-3)
    both = np.asarray(hit_p) & np.asarray(hit_x)
    # normals from the gid gather match brute force (up to sign flip
    # already handled by the against-ray orientation)
    nd = np.abs(np.asarray(n_p) - np.asarray(n_x)).max(-1)[both]
    assert nd.max() < 1e-4


def test_backface_cull_identical_on_closed_mesh(interpret_pallas,
                                                monkeypatch):
    """Backface culling is EXACT on watertight meshes: the image with
    ``backface=True`` must equal the uncull'd one, on both the compacted
    tier and the camsoup tier. Verifies the cone bound's conservatism AND
    the cube winding convention in one shot."""
    import visfly_tpu.render.tri_trace as tt
    from visfly_tpu.core import quaternion as quat
    from visfly_tpu.render.camera import camera_rays_components

    verts, faces = [], []
    for i in range(6):
        for j in range(6):
            v, f = cube_mesh((i * 2.0 + 2.0, j * 2.0 - 6.0, 1.0), 0.45)
            faces.append(f + 8 * len(verts))
            verts.append(v)
    packed = pack_triangles(np.concatenate(verts), np.concatenate(faces))
    tris = jnp.asarray(packed[None])

    spec = {"sensor_type": "depth", "resolution": [64, 64]}
    pos = jnp.asarray([[-1.57, 0.23, 1.11]])
    q = quat.from_euler(jnp.zeros(1), jnp.asarray([0.04]),
                        jnp.asarray([-0.03]))
    o_c, d_c, _ = camera_rays_components(spec, pos, q)
    o_full = jnp.broadcast_to(o_c[:, :, None], (3, 1, 64 * 64))
    d_full = d_c.reshape(3, 1, -1)

    for min_t in (10 ** 9, packed.shape[0] - 1):  # compacted / camsoup
        monkeypatch.setattr(tt, "SHARED_SOUP_MIN_T", min_t)
        t0, h0, n0, *_ = tri_trace_pallas(tris, o_full, d_full,
                                      cap=tris.shape[1], img_w=64,
                                      cam_rays=64 * 64, backface=False)
        t1, h1, n1, *_ = tri_trace_pallas(tris, o_full, d_full,
                                      cap=tris.shape[1], img_w=64,
                                      cam_rays=64 * 64, backface=True)
        np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
        np.testing.assert_allclose(np.asarray(t0), np.asarray(t1),
                                   atol=1e-5)


def test_dynamic_objects_are_colored_in_rgb():
    """Round-4 closure of the dynamic-pixels-shade-to-0 deviation: a
    dynamic object in front of the camera must contribute NON-ZERO RGB and
    the reserved semantic id 255 in the mesh (tri) backend."""
    from visfly_tpu.render.sphere_trace import render_camera
    from visfly_tpu.scene.mesh import bake_scene_from_arrays

    v, f = cube_mesh((4.0, 0.0, 0.0), 1.0)
    data = bake_scene_from_arrays(v, f, spacing=0.2, margin=3.0)
    pos = jnp.asarray([[-2.0, 0.0, 0.0]])
    q = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    # one red sphere at x=0 (between camera and cube)
    objects = (jnp.asarray([[[0.0, 0.0, 0.0]]]),
               jnp.asarray([[0.5]]),
               jnp.asarray([[[200.0, 30.0, 30.0]]]))
    out = render_camera(data, jnp.zeros(1, jnp.int32), pos, q,
                        {"sensor_type": "color", "resolution": [32, 32]},
                        max_depth=10.0, objects=objects)
    rgb = np.transpose(np.asarray(out["color"])[0], (1, 2, 0))
    centre = rgb[14:18, 14:18].astype(np.float32).mean((0, 1))
    assert centre[0] > 40 and centre[0] > 2.5 * max(centre[1], 1.0), \
        f"object pixels must be red-ish, got {centre}"
    sem = render_camera(data, jnp.zeros(1, jnp.int32), pos, q,
                        {"sensor_type": "semantic", "resolution": [32, 32]},
                        max_depth=10.0, objects=objects)["semantic"]
    assert int(np.asarray(sem)[0, 0, 16, 16]) == 255


def test_camsoup_v2_matches_v1(interpret_pallas, monkeypatch):
    """Merged-operand camsoup kernel (`_tri_trace_pallas_camsoup_v2`):
    identical t/hit/gid to the reference camsoup implementation on a real
    camera workload."""
    import visfly_tpu.render.tri_trace as tt
    from visfly_tpu.core import quaternion as quat
    from visfly_tpu.render.camera import camera_rays_components

    verts, faces = [], []
    for i in range(8):
        for j in range(8):
            for k in range(3):
                v, f = cube_mesh((i * 2.0 + 2.0, j * 2.0 - 8.0, k * 2.0),
                                 0.4)
                faces.append(f + 8 * len(verts))
                verts.append(v)
    packed = pack_triangles(np.concatenate(verts), np.concatenate(faces))
    tris = jnp.asarray(packed[None])

    spec = {"sensor_type": "depth", "resolution": [64, 64]}
    pos = jnp.asarray([[-2.03, 0.011, 1.017]])
    q = quat.from_euler(jnp.zeros(1), jnp.asarray([0.013]),
                        jnp.asarray([0.021]))
    o_c, d_c, _ = camera_rays_components(spec, pos, q)
    o_full = jnp.broadcast_to(o_c[:, :, None], (3, 1, 64 * 64))
    d_full = d_c.reshape(3, 1, -1)

    kw = dict(max_depth=20.0, cap=tris.shape[1], img_w=64,
              cam_rays=64 * 64)
    t1, h1, n1, g1 = tt._tri_trace_pallas_camsoup(tris, o_full, d_full, **kw)
    t2, h2, n2, g2 = tt._tri_trace_pallas_camsoup_v2(tris, o_full, d_full,
                                                     **kw)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))

    # MXU matmul body (`_tri_trace_pallas_camsoup_mx`): same prepass and
    # scheduling, G-matrix payload — identical winners, t within fp32
    # matmul rounding (HIGHEST-precision dot vs FMA chains)
    t3, h3, n3, g3 = tt._tri_trace_pallas_camsoup_mx(tris, o_full, d_full,
                                                     **kw)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h3))
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t3), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g3))


def test_worklist_path_matches_xla(interpret_pallas):
    """Flattened-worklist dense-mesh path (`_tri_trace_pallas_worklist`):
    16-triangle cluster culling, prefix-sum flattened grid, gathered
    contiguous signed-volume pages. With the budget covering every chunk
    the image must equal brute force."""
    import visfly_tpu.render.tri_trace as tt
    from visfly_tpu.core import quaternion as quat
    from visfly_tpu.render.camera import camera_rays_components

    verts, faces = [], []
    for i in range(8):
        for j in range(8):
            for k in range(3):
                v, f = cube_mesh((i * 2.0 + 2.0, j * 2.0 - 8.0, k * 2.0),
                                 0.4)
                faces.append(f + 8 * len(verts))
                verts.append(v)
    packed = pack_triangles(np.concatenate(verts), np.concatenate(faces))
    tris = jnp.asarray(packed[None])

    spec = {"sensor_type": "depth", "resolution": [64, 64]}
    pos = jnp.asarray([[-2.03, 0.011, 1.017]])
    q = quat.from_euler(jnp.zeros(1), jnp.asarray([0.013]),
                        jnp.asarray([0.021]))
    o_c, d_c, _ = camera_rays_components(spec, pos, q)
    o_full = jnp.broadcast_to(o_c[:, :, None], (3, 1, 64 * 64))
    d_full = d_c.reshape(3, 1, -1)

    t_x, hit_x, n_x, *_ = tri_trace_xla(
        tris, jnp.transpose(o_full, (1, 2, 0)),
        jnp.transpose(d_full, (1, 2, 0)))

    # budget covering every chunk: must equal brute force exactly
    t_p, hit_p, n_p, g_p = tt._tri_trace_pallas_worklist(
        tris, o_full, d_full, 20.0, tris.shape[1], 64, 64 * 64,
        work_budget=10 ** 6)
    assert int((np.asarray(hit_p) != np.asarray(hit_x)).sum()) == 0
    np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_x), atol=1e-3)
    both = np.asarray(hit_p) & np.asarray(hit_x)
    nd = np.abs(np.asarray(n_p) - np.asarray(n_x)).max(-1)[both]
    assert nd.max() < 1e-4

    # under-budget: the overflow CONTRACT — dropped chunks are each tile's
    # farthest, so depth only ever increases (far field -> background),
    # never a spurious nearer hit
    t_p, hit_p, _, _ = tt._tri_trace_pallas_worklist(
        tris, o_full, d_full, 20.0, tris.shape[1], 64, 64 * 64,
        work_budget=8)
    assert bool((np.asarray(t_p) >= np.asarray(t_x) - 1e-3).all())
