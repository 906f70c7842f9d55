"""Native mesh→SDF pipeline: C++ BVH baker accuracy vs analytic geometry,
OBJ/GLB loaders, and the grid-backend round trip."""
import os
import struct
import json

import numpy as np
import pytest

from visfly_tpu.scene.mesh import (
    _load_native,
    bake_mesh_scene,
    load_glb,
    load_obj,
    mesh_to_sdf_grid,
)


def unit_cube(center=(0.0, 0.0, 0.0), half=1.0):
    c = np.asarray(center, np.float32)
    v = np.asarray(
        [[x, y, z] for x in (-half, half) for y in (-half, half) for z in (-half, half)],
        np.float32,
    ) + c
    # 12 triangles, outward-ish winding
    f = np.asarray(
        [
            [0, 1, 3], [0, 3, 2],  # -x
            [4, 6, 7], [4, 7, 5],  # +x
            [0, 4, 5], [0, 5, 1],  # -y
            [2, 3, 7], [2, 7, 6],  # +y
            [0, 2, 6], [0, 6, 4],  # -z
            [1, 5, 7], [1, 7, 3],  # +z
        ],
        np.int32,
    )
    return v, f


def test_native_builds():
    lib = _load_native()
    assert lib is not None, "native mesh_sdf library failed to build"


def test_sdf_grid_cube_accuracy():
    verts, faces = unit_cube(half=1.0)
    origin = np.asarray([-2.0, -2.0, -2.0], np.float32)
    dims = (41, 41, 41)
    spacing = 0.1
    grid = mesh_to_sdf_grid(verts, faces, origin, spacing, dims, signed=True)

    def at(p):
        idx = np.round((np.asarray(p) - origin) / spacing).astype(int)
        return grid[tuple(idx)]

    np.testing.assert_allclose(at([0, 0, 0]), -1.0, atol=0.02)  # centre: 1 inside
    np.testing.assert_allclose(at([1.5, 0, 0]), 0.5, atol=0.02)  # 0.5 outside
    np.testing.assert_allclose(at([0, 0, 1.8]), 0.8, atol=0.02)
    corner = at([1.8, 1.8, 1.8])  # diagonal distance to the corner
    np.testing.assert_allclose(corner, np.sqrt(3 * 0.8**2), atol=0.02)


def test_obj_roundtrip(tmp_path):
    verts, faces = unit_cube()
    p = tmp_path / "cube.obj"
    with open(p, "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for t in faces:
            f.write(f"f {t[0]+1} {t[1]+1} {t[2]+1}\n")
    v2, f2 = load_obj(str(p))
    assert v2.shape == verts.shape and f2.shape == faces.shape
    np.testing.assert_allclose(v2, verts)


def _write_glb(path, verts, faces):
    pos = verts.astype(np.float32).tobytes()
    idx = faces.astype(np.uint32).tobytes()
    bin_chunk = pos + idx
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": [1.0, 0.0, 0.0]}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0}, "indices": 1}]}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": len(verts),
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5125, "count": faces.size,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(pos)},
            {"buffer": 0, "byteOffset": len(pos), "byteLength": len(idx)},
        ],
        "buffers": [{"byteLength": len(bin_chunk)}],
    }
    js = json.dumps(gltf).encode()
    js += b" " * (-len(js) % 4)
    bin_chunk += b"\x00" * (-len(bin_chunk) % 4)
    total = 12 + 8 + len(js) + 8 + len(bin_chunk)
    with open(path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))
        f.write(struct.pack("<II", len(js), 0x4E4F534A))
        f.write(js)
        f.write(struct.pack("<II", len(bin_chunk), 0x004E4942))
        f.write(bin_chunk)


def test_glb_loader_with_transform(tmp_path):
    verts, faces = unit_cube()
    p = tmp_path / "cube.glb"
    _write_glb(str(p), verts, faces)
    v2, f2 = load_glb(str(p))
    # node translation [1,0,0] applied
    np.testing.assert_allclose(v2.mean(axis=0), [1.0, 0.0, 0.0], atol=1e-5)
    assert f2.shape == faces.shape


def test_mesh_scene_render(tmp_path):
    """End-to-end: GLB → native SDF bake → grid backend depth render."""
    import jax
    import jax.numpy as jnp

    from visfly_tpu.render import render_camera

    verts, faces = unit_cube(half=1.0)
    p = tmp_path / "cube.glb"
    _write_glb(str(p), verts, faces)  # cube centred at (1,0,0)
    data = bake_mesh_scene(str(p), spacing=0.08, margin=2.0)

    pos = jnp.asarray([[-2.0, 0.0, 0.0]])
    q = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])  # facing +x → cube face at x=0
    out = render_camera(data, jnp.zeros(1, jnp.int32), pos, q,
                        {"sensor_type": "depth", "resolution": [32, 32]},
                        n_steps=64, max_depth=10.0)
    depth = np.asarray(out["depth"])
    np.testing.assert_allclose(depth[0, 0, 16, 16], 2.0, atol=0.1)


def test_mesh_decomposition_boxes(tmp_path):
    """Mesh → greedy box decomposition: boxes stay inside the occupancy, the
    cover target is met, and the decomposed primitive scene renders depth
    matching the exact grid backend to within the grid spacing."""
    import jax
    import jax.numpy as jnp

    from visfly_tpu.render import render_camera
    from visfly_tpu.scene.decompose import decompose_mesh_scene, sdf_grid_to_boxes
    from visfly_tpu.scene.mesh import mesh_to_sdf_grid
    from visfly_tpu.scene.prim_scene import pack_scenes

    # two separated cubes → expect ≈2 boxes reproducing both
    v1, f1 = unit_cube(center=(0.0, 0.0, 0.0), half=1.0)
    v2, f2 = unit_cube(center=(4.0, 0.0, 0.0), half=0.8)
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, f2 + len(v1)])
    p = tmp_path / "two.obj"
    with open(p, "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for t in faces:
            f.write(f"f {t[0]+1} {t[1]+1} {t[2]+1}\n")

    spacing = 0.1
    spec = decompose_mesh_scene(str(p), spacing=spacing, margin=1.5,
                                max_prims=16, min_cover=0.97)
    assert 2 <= len(spec.primitives) <= 6, len(spec.primitives)
    # every box must lie inside the true occupancy (conservative)
    for pr in spec.primitives:
        c, h = np.asarray(pr["center"]), np.asarray(pr["half_extents"])
        inside1 = np.all(np.abs(c) + h <= 1.0 + 1.5 * spacing)
        inside2 = np.all(np.abs(c - [4, 0, 0]) + h <= 0.8 + 1.5 * spacing)
        assert inside1 or inside2, (c, h)

    # depth parity vs the exact grid backend
    from visfly_tpu.scene.mesh import bake_mesh_scene

    grid_data = bake_mesh_scene(str(p), spacing=spacing, margin=1.5)
    prim_data = pack_scenes([spec])
    pos = jnp.asarray([[-2.5, 0.0, 0.0]])
    q = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    spec_cam = {"sensor_type": "depth", "resolution": [32, 32]}
    d_grid = np.asarray(render_camera(grid_data, jnp.zeros(1, jnp.int32),
                                      pos, q, spec_cam, n_steps=64,
                                      max_depth=10.0)["depth"])
    d_prim = np.asarray(render_camera(prim_data, jnp.zeros(1, jnp.int32),
                                      pos, q, spec_cam, n_steps=64,
                                      max_depth=10.0)["depth"])
    # centre pixel: the first cube's face at x=-1 → depth 1.5
    np.testing.assert_allclose(d_prim[0, 0, 16, 16], 1.5, atol=2 * spacing)
    hit_both = (d_grid < 9.9) & (d_prim < 9.9)
    assert hit_both.mean() > 0.1
    err = np.abs(d_grid - d_prim)[hit_both]
    assert np.percentile(err, 95) < 2 * spacing, np.percentile(err, 95)


def test_mesh_file_env_uses_primitive_backend(tmp_path):
    """An env pointed at a GLB/OBJ file decomposes it to primitives by
    default (fast path); backend='grid' opts into the exact grid."""
    import jax

    from visfly_tpu.envs import NavigationEnv
    from visfly_tpu.scene.prim_scene import PrimitiveScene
    from visfly_tpu.scene.scene import SceneData

    verts, faces = unit_cube(center=(0.0, 0.0, 2.0), half=1.0)
    p = tmp_path / "room.obj"
    with open(p, "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for t in faces:
            f.write(f"f {t[0]+1} {t[1]+1} {t[2]+1}\n")

    def mkenv(**scene_kw):
        return NavigationEnv(
            num_agent_per_scene=2, visual=True,
            scene_kwargs={"path": str(p), "margin": 3.0, **scene_kw},
            sensor_kwargs=[{"sensor_type": "depth", "uuid": "depth",
                            "resolution": [16, 16]}],
            random_kwargs={"state_generator": {"class": "Uniform", "kwargs": [
                {"position": {"mean": [-2.5, 0.0, 2.0],
                              "half": [0.1, 0.1, 0.1]}}]}},
            dynamics_kwargs={"dt": 0.03, "ctrl_dt": 0.03},
            max_episode_steps=16)

    env = mkenv()
    assert isinstance(env.scene, PrimitiveScene)
    st, obs = env.reset(jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(obs["depth"])).all()

    env_g = mkenv(backend="grid")
    assert isinstance(env_g.scene, SceneData)


def _cylinder_mesh(cx, cy, radius, z0, z1, n=24):
    """Closed n-gon prism approximating a vertical cylinder."""
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    ring = np.stack([cx + radius * np.cos(ang), cy + radius * np.sin(ang)], 1)
    bot = np.concatenate([ring, np.full((n, 1), z0)], 1)
    top = np.concatenate([ring, np.full((n, 1), z1)], 1)
    cb = np.array([[cx, cy, z0]])
    ct = np.array([[cx, cy, z1]])
    verts = np.concatenate([bot, top, cb, ct]).astype(np.float32)
    faces = []
    for i in range(n):
        j = (i + 1) % n
        faces += [[i, j, n + j], [i, n + j, n + i]]        # side
        faces += [[2 * n, j, i], [2 * n + 1, n + i, n + j]]  # caps
    return verts, np.asarray(faces, np.int32)


def _ramp_mesh(x0, x1, y0, y1, h):
    """Triangular prism: rises from z=0 at x0 to z=h at x1, extruded in y."""
    verts = np.asarray([
        [x0, y0, 0], [x1, y0, 0], [x1, y0, h],
        [x0, y1, 0], [x1, y1, 0], [x1, y1, h],
    ], np.float32)
    faces = np.asarray([
        [0, 1, 2], [3, 5, 4],              # ends
        [0, 2, 5], [0, 5, 3],              # sloped face
        [0, 3, 4], [0, 4, 1],              # bottom
        [1, 4, 5], [1, 5, 2],              # back
    ], np.int32)
    return verts, faces


def test_mesh_decomposition_curved_fidelity(tmp_path):
    """VERDICT r2 item 6: decomposition quality on CURVED/thin geometry —
    two round columns and a 45° ramp. The cylinder fitting must engage
    (greedy boxes alone square off columns), and the decomposed render must
    match the exact grid render to p95 ≤ 2× spacing with ≤2% see-through."""
    import jax.numpy as jnp

    from visfly_tpu.render import render_camera
    from visfly_tpu.scene.decompose import decompose_mesh_scene
    from visfly_tpu.scene.prim_scene import pack_scenes

    vs, fs = [], []

    def add(v, f):
        base = sum(len(x) for x in vs)
        vs.append(v)
        fs.append(f + base)

    add(*_cylinder_mesh(1.5, -0.8, 0.4, 0.0, 3.0))
    add(*_cylinder_mesh(2.5, 0.9, 0.3, 0.0, 3.0))
    add(*_ramp_mesh(3.5, 5.0, -1.5, 1.5, 1.5))
    verts = np.concatenate(vs)
    faces = np.concatenate(fs)
    p = tmp_path / "curved.obj"
    with open(p, "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for t in faces:
            f.write(f"f {t[0]+1} {t[1]+1} {t[2]+1}\n")

    spacing = 0.08
    spec = decompose_mesh_scene(str(p), spacing=spacing, margin=1.0,
                                max_prims=96, min_cover=0.995)
    kinds = [pr["type"] for pr in spec.primitives]
    assert "cylinder" in kinds, f"cylinder fitting did not engage: {kinds}"

    from visfly_tpu.scene.mesh import bake_mesh_scene

    grid_data = bake_mesh_scene(str(p), spacing=spacing, margin=1.0)
    prim_data = pack_scenes([spec])
    pos = jnp.asarray([[-1.5, 0.0, 1.2]])
    q = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])  # facing +x at both columns
    cam = {"sensor_type": "depth", "resolution": [48, 48]}
    d_grid = np.asarray(render_camera(grid_data, jnp.zeros(1, jnp.int32),
                                      pos, q, cam, n_steps=96,
                                      max_depth=12.0)["depth"])[0, 0]
    d_prim = np.asarray(render_camera(prim_data, jnp.zeros(1, jnp.int32),
                                      pos, q, cam, n_steps=96,
                                      max_depth=12.0)["depth"])[0, 0]
    g_hit = d_grid < 11.9
    p_hit = d_prim < 11.9
    # see-through: grid hits geometry the decomposition lost entirely
    holes = (g_hit & ~p_hit).mean()
    assert holes <= 0.02, f"see-through fraction {holes:.3f}"
    both = g_hit & p_hit
    assert both.mean() > 0.08  # the sparse scene fills ~13% of the frame
    err = np.abs(d_grid - d_prim)[both]
    p95 = float(np.percentile(err, 95))
    assert p95 <= 2 * spacing, f"p95 depth error {p95:.3f} > {2*spacing:.3f}"
    print(f"curved-fidelity: p95={p95*100:.1f} cm, holes={holes:.3%}, "
          f"prims={len(spec.primitives)} ({kinds.count('cylinder')} cyl)")


def test_tri_closest_point_exact_on_cube():
    """Exact point-to-soup query vs the ANALYTIC point-to-box-surface
    distance on a 12-triangle cube: outside points (clamp formula), inside
    points (min face distance), and points exactly on the surface. Also
    checks the returned point achieves the returned distance and lies on
    the cube surface."""
    import jax.numpy as jnp

    from visfly_tpu.render.tri_trace import pack_triangles
    from visfly_tpu.scene.queries import tri_closest_point

    v, f = unit_cube(half=1.0)
    tris = jnp.asarray(pack_triangles(v, f)[None])  # (1, T, 9) zero-padded
    rng = np.random.RandomState(0)
    p_out = rng.uniform(-3, 3, (400, 3)).astype(np.float32)
    p_out = p_out[np.abs(p_out).max(1) > 1.01][:200]
    p_in = rng.uniform(-0.95, 0.95, (100, 3)).astype(np.float32)
    p = np.concatenate([p_out, p_in]).astype(np.float32)
    sid = jnp.zeros(len(p), jnp.int32)

    pt, dis = tri_closest_point(tris, sid, jnp.asarray(p))
    pt, dis = np.asarray(pt), np.asarray(dis)

    d_clamp = np.linalg.norm(np.maximum(np.abs(p) - 1.0, 0.0), axis=-1)
    inside = np.abs(p).max(1) <= 1.0
    d_ref = np.where(inside, 1.0 - np.abs(p).max(1), d_clamp)
    assert np.allclose(dis, d_ref, atol=1e-5), (
        f"max err {np.abs(dis - d_ref).max():.2e}")
    # the point itself: on the surface, at the claimed distance
    assert np.allclose(np.linalg.norm(pt - p, axis=-1), dis, atol=1e-5)
    assert np.allclose(np.abs(pt).max(1), 1.0, atol=1e-5)


def test_closest_point_query_mesh_scene_is_exact_and_grid_error_bounded():
    """VERDICT r3 item 3: imported-mesh collision accuracy. Bakes the
    garage OBJ (8 cm grid), queries 1,000 random poses through the public
    `closest_point_query` (which now takes the EXACT triangle path when
    the soup is attached), and quantifies what the old grid-interpolation
    path would have returned. The exact path must match brute-force
    point-to-triangle to ≤1 mm; the measured grid error is reported (and
    bounded loosely) to document what the fallback costs."""
    import sys

    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    from mesh_assets import make_garage_obj

    from visfly_tpu.scene.mesh import bake_scene_from_arrays
    from visfly_tpu.scene.queries import (closest_point_query, sample_sdf,
                                          sdf_normal, tri_closest_point)

    path = make_garage_obj(os.path.join("/tmp", "q_garage.obj"),
                           n_pillars=12)
    v, fc = load_obj(path)
    data = bake_scene_from_arrays(v, fc, spacing=0.08)
    rng = np.random.RandomState(1)
    p = np.stack([rng.uniform(1, 15, 1000), rng.uniform(-3.5, 3.5, 1000),
                  rng.uniform(0.2, 2.8, 1000)], -1).astype(np.float32)
    sid = jnp.zeros(len(p), jnp.int32)
    pj = jnp.asarray(p)

    point, dis, out = closest_point_query(data, sid, pj)

    # oracle: brute force in float64 numpy over every triangle
    tris = np.asarray(data.triangles[0], np.float64)
    tris = tris[np.any(tris != 0, -1)]
    import jax

    pt64, d64 = jax.jit(tri_closest_point)(
        jnp.asarray(tris[None]), sid, jnp.asarray(p))
    free = np.asarray(sample_sdf(data, sid, pj)) > 0.04  # clearly outside
    err = np.abs(np.asarray(dis) - np.asarray(d64))[free]
    assert err.max() <= 1e-3, f"exact-path error {err.max():.2e}"

    # the grid fallback's error on the same poses (documentation number)
    n = sdf_normal(data, sid, pj)
    g_dis = np.maximum(np.asarray(sample_sdf(data, sid, pj)), 0.0)
    g_err = np.abs(g_dis - np.asarray(d64))[free]
    p95 = float(np.percentile(g_err, 95))
    print(f"grid-collision error vs exact (8 cm bake): "
          f"p95={p95*100:.1f} cm max={g_err.max()*100:.1f} cm")
    assert p95 < 0.08, "grid p95 error should stay under one cell"


def _write_glb_textured(path, verts, faces, uvs, png_bytes):
    """GLB with TEXCOORD_0 + an embedded PNG baseColorTexture."""
    pos = verts.astype(np.float32).tobytes()
    idx = faces.astype(np.uint32).tobytes()
    uv = uvs.astype(np.float32).tobytes()
    bin_chunk = pos + idx + uv + png_bytes
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "TEXCOORD_0": 2},
            "indices": 1, "material": 0}]}],
        "materials": [{"pbrMetallicRoughness": {
            "baseColorTexture": {"index": 0}}}],
        "textures": [{"source": 0}],
        "images": [{"bufferView": 3, "mimeType": "image/png"}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": len(verts),
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5125, "count": faces.size,
             "type": "SCALAR"},
            {"bufferView": 2, "componentType": 5126, "count": len(uvs),
             "type": "VEC2"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(pos)},
            {"buffer": 0, "byteOffset": len(pos), "byteLength": len(idx)},
            {"buffer": 0, "byteOffset": len(pos) + len(idx),
             "byteLength": len(uv)},
            {"buffer": 0, "byteOffset": len(pos) + len(idx) + len(uv),
             "byteLength": len(png_bytes)},
        ],
        "buffers": [{"byteLength": len(bin_chunk)}],
    }
    js = json.dumps(gltf).encode()
    js += b" " * (-len(js) % 4)
    bin_chunk += b"\x00" * (-len(bin_chunk) % 4)
    total = 12 + 8 + len(js) + 8 + len(bin_chunk)
    with open(path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))
        f.write(struct.pack("<II", len(js), 0x4E4F534A))
        f.write(js)
        f.write(struct.pack("<II", len(bin_chunk), 0x004E4942))
        f.write(bin_chunk)


def test_textured_glb_renders_checkerboard(tmp_path):
    """VERDICT r3 item 2 golden test: a checkerboard baseColorTexture on a
    wall quad must come back as CHECKERBOARD PIXELS from the exact-tri RGB
    backend (UV interpolation + atlas sampling), not a flat mean color."""
    import io

    import jax.numpy as jnp
    from PIL import Image

    from visfly_tpu.render import render_camera
    from visfly_tpu.scene.mesh import bake_mesh_scene, load_glb_textured

    # 8×8 checkerboard, 64×64 px (dark gray / near-white, so BOTH cell
    # colors render non-zero and 'hit' can be read off the pixel sum)
    cells = (np.indices((8, 8)).sum(0) % 2) * 160 + 60
    img = np.kron(cells, np.ones((8, 8), np.uint8)).astype(np.uint8)
    img = np.stack([img] * 3, -1).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")

    # wall quad at x=2, spanning y∈[-2,2], z∈[-2,2], facing −x
    verts = np.asarray([[2, -2, -2], [2, 2, -2], [2, 2, 2], [2, -2, 2]],
                       np.float32)
    faces = np.asarray([[0, 1, 2], [0, 2, 3]], np.uint32)
    uvs = np.asarray([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32)
    p = str(tmp_path / "checker.glb")
    _write_glb_textured(p, verts, faces, uvs, buf.getvalue())

    v, f, texinfo = load_glb_textured(p)
    assert texinfo is not None and len(texinfo["images"]) == 1

    data = bake_mesh_scene(p, spacing=0.25, margin=2.5)
    assert data.tri_uv.shape[-1] == 6 and data.atlas.ndim == 4

    pos = jnp.asarray([[-0.5, 0.0, 0.0]])
    q = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    out = render_camera(data, jnp.zeros(1, jnp.int32), pos, q,
                        {"sensor_type": "color", "resolution": [64, 64]},
                        max_depth=10.0)
    rgb = np.transpose(np.asarray(out["color"])[0], (1, 2, 0))
    hit = rgb.sum(-1) > 0
    assert hit.mean() > 0.5, "wall must fill most of the frame"
    # checkerboard: both dark and bright texels present in quantity,
    # and alternating structure along a row (many sign changes)
    g = rgb[..., 0].astype(np.int32)[hit.any(1)][:, hit.any(0)]
    mid = (g.max() + g.min()) / 2
    # the two cell colors must keep their ~3.7× contrast through shading
    assert g.max() > 2.5 * max(g.min(), 1)
    row = g[g.shape[0] // 2]
    flips = int((np.abs(np.diff((row > mid).astype(int))) > 0).sum())
    assert flips >= 4, f"expected alternating cells, got {flips} flips"
    frac_dark = float((g < mid).mean())
    assert 0.2 < frac_dark < 0.8, "both cell colors must cover the wall"


def test_tiled_scene_data_keeps_textures(tmp_path):
    """ADVICE r4 (high): tiling a single-scene textured SceneData across the
    scene axis must tile tri_uv/tri_rect/atlas too — the textured RGB path
    indexes the stacked atlas by scene id, so an untiled atlas makes scenes
    >= 1 read out of bounds and shade garbage. Scene 1 must render pixel-
    identical to scene 0."""
    import io

    import jax.numpy as jnp
    from PIL import Image

    from visfly_tpu.render import render_camera
    from visfly_tpu.scene.mesh import bake_mesh_scene
    from visfly_tpu.scene.scene import _tile_scene_data

    cells = (np.indices((8, 8)).sum(0) % 2) * 160 + 60
    img = np.kron(cells, np.ones((8, 8), np.uint8)).astype(np.uint8)
    img = np.stack([img] * 3, -1).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")

    verts = np.asarray([[2, -2, -2], [2, 2, -2], [2, 2, 2], [2, -2, 2]],
                       np.float32)
    faces = np.asarray([[0, 1, 2], [0, 2, 3]], np.uint32)
    uvs = np.asarray([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32)
    p = str(tmp_path / "checker.glb")
    _write_glb_textured(p, verts, faces, uvs, buf.getvalue())

    data = _tile_scene_data(bake_mesh_scene(p, spacing=0.25, margin=2.5), 2)
    assert data.num_scene == 2
    assert data.atlas.shape[0] == 2 and data.tri_uv.shape[0] == 2
    assert data.tri_rect.shape[0] == 2

    # one camera per scene, identical pose: scene 1 must shade identically
    pos = jnp.asarray([[-0.5, 0.0, 0.0], [-0.5, 0.0, 0.0]])
    q = jnp.asarray([[1.0, 0.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0]])
    cam = {"sensor_type": "color", "resolution": [32, 32]}
    out = render_camera(data, jnp.asarray([0, 1], jnp.int32), pos, q, cam,
                        max_depth=10.0)
    r0 = np.asarray(out["color"][0])
    r1 = np.asarray(out["color"][1])
    assert r0.sum() > 0
    np.testing.assert_array_equal(r0, r1)
