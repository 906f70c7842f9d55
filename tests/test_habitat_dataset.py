"""Habitat-format composite-scene ingest (stage + object placements).

Parity target: the reference's dataset resolution + composite scene load
(`/root/reference/utils/SceneManager.py:243-271,893-929`, layout
`readme.md:75-93`). A synthetic dataset in the habitat JSON schema (y-up
frame) is built on the fly; ingestion must place instanced meshes at the
correct std-frame (z-up) coordinates and produce a renderable env scene.
"""
import json
import os

import numpy as np
import pytest


def _write_cuboid_obj(path, center, half, extra=None):
    """Axis-aligned cuboid(s) as a minimal OBJ (habitat-frame coords)."""
    cuboids = [(center, half)] + (extra or [])
    v_lines, f_lines = [], []
    base = 0
    for c, h in cuboids:
        c, h = np.asarray(c, float), np.asarray(h, float)
        corners = [c + h * np.array([sx, sy, sz])
                   for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
        for p in corners:
            v_lines.append(f"v {p[0]} {p[1]} {p[2]}")
        quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
                 (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3)]
        for a, b, cc, d in quads:
            f_lines.append(f"f {base+a+1} {base+b+1} {base+cc+1}")
            f_lines.append(f"f {base+a+1} {base+cc+1} {base+d+1}")
        base += 8
    with open(path, "w") as f:
        f.write("\n".join(v_lines + f_lines) + "\n")


@pytest.fixture(scope="module")
def habitat_dataset_dir(tmp_path_factory):
    """Synthetic habitat dataset: garage stage + cube object, two scenes.

    Geometry is authored in the HABITAT frame (y-up). Std frame mapping:
    std = (-hab_z, -hab_x, hab_y). The stage interior spans std
    x∈[0,8], y∈[-3,3], z∈[0,3]."""
    root = tmp_path_factory.mktemp("habdata")
    for d in ("configs/stages", "configs/objects", "configs/scenes",
              "meshes"):
        os.makedirs(root / d, exist_ok=True)

    # stage: floor + 4 walls, habitat frame. hab_x = -std_y ∈ [-3, 3],
    # hab_y = std_z ∈ [0, 3], hab_z = -std_x ∈ [-8, 0]
    t = 0.2
    _write_cuboid_obj(
        root / "meshes" / "garage.obj",
        [0.0, -t / 2, -4.0], [3 + t, t / 2, 4 + t],  # floor
        extra=[
            ([-(3 + t / 2), 1.5, -4.0], [t / 2, 1.5, 4 + t]),  # std +y wall
            ([+(3 + t / 2), 1.5, -4.0], [t / 2, 1.5, 4 + t]),  # std -y wall
            ([0.0, 1.5, t / 2], [3 + t, 1.5, t / 2]),          # std x=0 wall
            ([0.0, 1.5, -(8 + t / 2)], [3 + t, 1.5, t / 2]),   # std x=8 wall
        ])
    _write_cuboid_obj(root / "meshes" / "cube.obj", [0, 0, 0],
                      [0.3, 0.3, 0.3])

    (root / "configs" / "stages" / "garage.stage_config.json").write_text(
        json.dumps({"render_asset": "../../meshes/garage.obj"}))
    (root / "configs" / "objects" / "cube.object_config.json").write_text(
        json.dumps({"render_asset": "../../meshes/cube.obj"}))

    # scene 1: cube at std (4, 0, 1) → hab (-std_y, std_z, -std_x) = (0,1,-4)
    scene1 = {
        "stage_instance": {"template_name": "garage"},
        "object_instances": [
            {"template_name": "cube", "translation": [0.0, 1.0, -4.0],
             "rotation": [1.0, 0.0, 0.0, 0.0]},
        ],
    }
    # scene 2: two cubes, one rotated 45° about the up axis, one scaled
    s2 = np.sin(np.pi / 8)
    c2 = np.cos(np.pi / 8)
    scene2 = {
        "stage_instance": {"template_name": "garage"},
        "object_instances": [
            {"template_name": "cube", "translation": [1.0, 1.0, -4.0],
             "rotation": [c2, 0.0, s2, 0.0]},  # 45° about hab y (= std z)
            {"template_name": "cube", "translation": [-1.0, 0.5, -6.0],
             "non_uniform_scale": [1.0, 1.5, 1.0]},
        ],
    }
    for name, sc in (("garage_a", scene1), ("garage_b", scene2)):
        (root / "configs" / "scenes" / f"{name}.scene_instance.json"
         ).write_text(json.dumps(sc))

    (root / "test.scene_dataset_config.json").write_text(json.dumps({
        "stages": {"paths": {".json": ["configs/stages/*.json"]}},
        "objects": {"paths": {".json": ["configs/objects/*.json"]}},
        "scene_instances": {"paths": {".json": ["configs/scenes/*.json"]}},
    }))
    return str(root)


def test_dataset_index_and_scene_list(habitat_dataset_dir):
    from visfly_tpu.scene.habitat_dataset import (
        HabitatDataset, is_habitat_scene_path, list_habitat_scenes)

    cfg = os.path.join(habitat_dataset_dir, "test.scene_dataset_config.json")
    ds = HabitatDataset(cfg)
    assert "garage" in ds.stages and "cube" in ds.objects
    assert len(ds.scenes) == 2

    scenes_dir = os.path.join(habitat_dataset_dir, "configs", "scenes")
    assert is_habitat_scene_path(scenes_dir)
    assert is_habitat_scene_path(cfg)
    assert len(list_habitat_scenes(scenes_dir)) == 2


def test_composite_scene_geometry(habitat_dataset_dir):
    """Ingested scene has the cube at std (4,0,1) and the stage's bbox."""
    from visfly_tpu.scene.habitat_dataset import load_habitat_scene

    scene_f = os.path.join(habitat_dataset_dir, "configs", "scenes",
                           "garage_a.scene_instance.json")
    spec = load_habitat_scene(scene_f, spacing=0.1)
    assert len(spec.primitives) > 0
    # flight volume = stage bounds (std frame)
    assert np.allclose(spec.bounds_min, [-0.2, -3.2, -0.2], atol=0.05)
    assert np.allclose(spec.bounds_max, [8.2, 3.2, 3.0], atol=0.05)
    # some box must cover the cube at std (4, 0, 1)
    centers = np.array([p["center"] for p in spec.primitives])
    halves = np.array([p["half_extents"] for p in spec.primitives])
    inside = np.all(np.abs(centers - [4.0, 0.0, 1.0]) <= halves + 0.15,
                    axis=1)
    assert inside.any(), f"no box covers the cube; centers={centers[:8]}"
    # every box must stay within one spacing of the authored geometry:
    # no box may cover the open interior point std (2, 0, 1)
    covers_free = np.all(np.abs(centers - [2.0, 0.0, 1.0]) <= halves - 0.05,
                         axis=1)
    assert not covers_free.any()


def test_env_renders_habitat_scene(habitat_dataset_dir):
    """End-to-end: env loads the scene set, renders depth, sees the cube."""
    import jax
    import jax.numpy as jnp
    from visfly_tpu.envs import NavigationEnv

    scenes_dir = os.path.join(habitat_dataset_dir, "configs", "scenes")
    env = NavigationEnv(
        num_agent_per_scene=2, num_scene=2, visual=True,
        random_kwargs={"state_generator": {"class": "Uniform", "kwargs": [
            {"position": {"mean": [1.0, 0.0, 1.5], "half": [0.0, 0.5, 0.5]}}
        ]}},
        scene_kwargs={"path": scenes_dir, "spacing": 0.1},
        sensor_kwargs=[{"uuid": "depth", "sensor_type": "depth",
                        "resolution": [16, 16]}],
        target=[7.0, 0.0, 1.0],
    )
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs["depth"].shape == (4, 1, 16, 16)
    assert bool(jnp.isfinite(obs["depth"]).all())
    # the stage is open-topped (rays over the walls miss → max_depth), but
    # a forward-looking centre ray must hit the far wall (≤ ~7.2 m) or an
    # object — never the 20 m no-hit sentinel
    centre = np.asarray(obs["depth"])[:, 0, 8, 8]
    assert (centre <= 9.0).all() and (centre >= 0.3).all(), centre
    state, out = env.step(state, jnp.zeros((4, 4)))
    assert bool(jnp.isfinite(out.reward).all())


def test_scene_swap_rotates_habitat_scenes(habitat_dataset_dir):
    """reset_env_by_id pulls the next scene instance from the dataset."""
    import jax
    from visfly_tpu.envs import NavigationEnv

    scenes_dir = os.path.join(habitat_dataset_dir, "configs", "scenes")
    env = NavigationEnv(
        num_agent_per_scene=1, num_scene=1, visual=True,
        random_kwargs={"state_generator": {"class": "Uniform", "kwargs": [
            {"position": {"mean": [1.0, 0.0, 1.5], "half": [0.0, 0.5, 0.5]}}
        ]}},
        scene_kwargs={"path": scenes_dir, "spacing": 0.1},
        sensor_kwargs=[{"uuid": "depth", "sensor_type": "depth",
                        "resolution": [16, 16]}],
    )
    state, _ = env.reset(jax.random.PRNGKey(0))
    before = np.asarray(jax.tree_util.tree_leaves(env.scene.params)[0]).copy()
    state = env.reset_env_by_id(state, 0)
    after = np.asarray(jax.tree_util.tree_leaves(env.scene.params)[0])
    assert before.shape == after.shape  # zero-recompile contract
    assert not np.allclose(before, after)  # a different scene landed


def test_habitat_exact_backend_renders_triangles(habitat_dataset_dir):
    """backend='grid' on a habitat scene set: the merged composite mesh is
    baked with its exact triangles, and the env camera ray-traces them
    (depth at the centre ray matches the wall analytically)."""
    import jax
    import jax.numpy as jnp
    from visfly_tpu.envs import NavigationEnv
    from visfly_tpu.scene.scene import SceneData

    scenes_dir = os.path.join(habitat_dataset_dir, "configs", "scenes")
    env = NavigationEnv(
        num_agent_per_scene=1, num_scene=2, visual=True,
        random_kwargs={"state_generator": {"class": "Uniform", "kwargs": [
            {"position": {"mean": [1.0, 0.0, 1.5], "half": [0.0, 0.0, 0.0]}}
        ]}},
        scene_kwargs={"path": scenes_dir, "backend": "grid",
                      "sdf_spacing": 0.1},
        sensor_kwargs=[{"uuid": "depth", "sensor_type": "depth",
                        "resolution": [16, 16]}],
        target=[7.0, 0.0, 1.0],
    )
    assert isinstance(env.scene, SceneData)
    assert env.scene.triangles.shape[-1] == 9
    assert env.scene.num_scene == 2  # multi-scene exact batching
    state, obs = env.reset(jax.random.PRNGKey(0))
    d = np.asarray(obs["depth"])[:, 0]
    # centre-ish ray from (1, 0, 1.5) looking +x: either the far wall at
    # x=8 (EXACT 7.0 — a grid render would be ~1 cell off) or a grazing
    # cube-top hit at x≈4 depending on which shuffled scene landed where
    centres = d[:, 8, 8]
    assert ((np.abs(centres - 7.0) < 0.05)
            | ((centres > 2.5) & (centres < 3.5))).all(), centres
    # at least one scene's centre ray reaches the wall, exactly
    assert (np.abs(centres - 7.0) < 0.05).any(), centres


def test_habitat_exact_backend_instance_semantics(habitat_dataset_dir):
    """The exact backend labels its semantic grid per instance (habitat's
    per-instance semantic sensor): stage renders id 1, object placements
    render ids 2.., and the albedo palette keys off the instance id."""
    import jax
    from visfly_tpu.envs import NavigationEnv

    scenes_dir = os.path.join(habitat_dataset_dir, "configs", "scenes")
    env = NavigationEnv(
        num_agent_per_scene=1, num_scene=2, visual=True,
        random_kwargs={"state_generator": {"class": "Uniform", "kwargs": [
            {"position": {"mean": [1.0, 0.0, 1.5], "half": [0.0, 0.0, 0.0]}}
        ]}},
        scene_kwargs={"path": scenes_dir, "backend": "grid",
                      "sdf_spacing": 0.1},
        sensor_kwargs=[{"uuid": "semantic", "sensor_type": "semantic",
                        "resolution": [32, 32]},
                       {"uuid": "color", "sensor_type": "color",
                        "resolution": [32, 32]}],
        target=[7.0, 0.0, 1.0],
    )
    state, _obs = env.reset(jax.random.PRNGKey(0))
    from visfly_tpu.render.sphere_trace import render_sensors

    sens = render_sensors(env, state)
    sem = np.asarray(sens["semantic"])[:, 0]  # (2, 32, 32)
    for s in range(2):
        ids = set(np.unique(sem[s])) - {0}
        assert 1 in ids, ids  # stage visible
        assert any(i >= 2 for i in ids), ids  # a cube instance visible
    # scene with two cubes shows two distinct object ids
    assert any(len(set(np.unique(sem[s])) - {0, 1}) >= 2 for s in range(2))
    # the cube pixels get a palette color distinct from the gray stage
    rgb = np.asarray(sens["color"])  # (2, 3, 32, 32)
    for s in range(2):
        obj_px = sem[s] >= 2
        stage_px = sem[s] == 1
        assert obj_px.any() and stage_px.any()
        c_obj = rgb[s, :, obj_px].mean(axis=0)
        c_stage = rgb[s, :, stage_px].mean(axis=0)
        assert np.abs(c_obj - c_stage).max() > 20.0


def test_habitat_primitive_backend_instance_semantics(habitat_dataset_dir):
    """The DEFAULT (decomposed-primitive) backend also labels primitives by
    instance: boxes covering an object placement carry its id + palette
    color, not the stage's."""
    from visfly_tpu.scene.habitat_dataset import load_habitat_scene

    f = os.path.join(habitat_dataset_dir, "configs", "scenes",
                     "garage_b.scene_instance.json")
    spec = load_habitat_scene(f)
    sems = {p["semantic"] for p in spec.primitives}
    assert 1 in sems  # stage boxes
    assert {2, 3} <= sems, sems  # both cube instances got their own boxes
    # a cube primitive sits near its placement (std (-?, ...)); check one
    cube_prims = [p for p in spec.primitives if p["semantic"] == 2]
    c = np.asarray(cube_prims[0]["center"])
    assert np.linalg.norm(c - np.asarray([4.0, -1.0, 1.0])) < 1.0, c


def test_mesh_base_color_parsers(tmp_path):
    """Asset material colors: OBJ-MTL Kd and glTF baseColorFactor, face/
    index-count weighted."""
    from visfly_tpu.scene.mesh import mesh_base_color

    (tmp_path / "red.mtl").write_text(
        "newmtl a\nKd 1.0 0.0 0.0\nnewmtl b\nKd 0.0 0.0 1.0\n")
    obj = tmp_path / "two.obj"
    obj.write_text(
        "mtllib red.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "usemtl a\nf 1 2 3\nf 1 2 3\nf 1 2 3\n"  # 3 red faces
        "usemtl b\nf 1 2 3\n")                    # 1 blue face
    c = mesh_base_color(str(obj))
    assert c is not None and c[0] > 180 and c[2] < 80, c  # red-dominated

    gltf = {
        "asset": {"version": "2.0"},
        "materials": [{"pbrMetallicRoughness":
                       {"baseColorFactor": [0.0, 1.0, 0.0, 1.0]}}],
        "meshes": [{"primitives": [
            {"attributes": {"POSITION": 0}, "indices": 1, "material": 0}]}],
        "accessors": [{"count": 3, "componentType": 5126, "type": "VEC3"},
                      {"count": 3, "componentType": 5125, "type": "SCALAR"}],
    }
    g = tmp_path / "green.gltf"
    g.write_text(json.dumps(gltf))
    c = mesh_base_color(str(g))
    assert c is not None and c[1] == 255 and c[0] == 0, c

    # no material → None (palette fallback)
    plain = tmp_path / "plain.obj"
    plain.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    assert mesh_base_color(str(plain)) is None


def test_habitat_material_colors_reach_render(tmp_path):
    """An object whose asset carries a red material renders red pixels in
    the DEFAULT backend (primitive labeling) and the spec records the
    material color rather than a palette entry."""
    from visfly_tpu.scene.habitat_dataset import load_habitat_scene

    for d in ("configs/stages", "configs/objects", "configs/scenes",
              "meshes"):
        os.makedirs(tmp_path / d, exist_ok=True)
    _write_cuboid_obj(tmp_path / "meshes" / "floor.obj",
                      [0.0, -0.1, -2.0], [2.2, 0.1, 2.2])
    (tmp_path / "meshes" / "red.mtl").write_text("newmtl r\nKd 1 0 0\n")
    # red cube authored with a material library
    cube = tmp_path / "meshes" / "cube.obj"
    v_lines, f_lines = [], []
    c, h = np.zeros(3), np.full(3, 0.3)
    corners = [c + h * np.array([sx, sy, sz])
               for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
    for p in corners:
        v_lines.append(f"v {p[0]} {p[1]} {p[2]}")
    quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
             (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3)]
    for a, b, cc, d in quads:
        f_lines.append(f"f {a+1} {b+1} {cc+1}")
        f_lines.append(f"f {a+1} {cc+1} {d+1}")
    cube.write_text("mtllib red.mtl\nusemtl r\n"
                    + "\n".join(v_lines + f_lines) + "\n")

    (tmp_path / "configs" / "stages" / "floor.stage_config.json").write_text(
        json.dumps({"render_asset": "../../meshes/floor.obj"}))
    (tmp_path / "configs" / "objects" / "cube.object_config.json").write_text(
        json.dumps({"render_asset": "../../meshes/cube.obj"}))
    (tmp_path / "configs" / "scenes" / "s.scene_instance.json").write_text(
        json.dumps({"stage_instance": {"template_name": "floor"},
                    "object_instances": [
                        {"template_name": "cube",
                         "translation": [0.0, 1.0, -2.0]}]}))
    (tmp_path / "t.scene_dataset_config.json").write_text(json.dumps({
        "stages": {"paths": {".json": ["configs/stages/*.json"]}},
        "objects": {"paths": {".json": ["configs/objects/*.json"]}},
        "scene_instances": {"paths": {".json": ["configs/scenes/*.json"]}},
    }))

    spec = load_habitat_scene(
        str(tmp_path / "configs" / "scenes" / "s.scene_instance.json"))
    cube_prims = [p for p in spec.primitives if p["semantic"] == 2]
    assert cube_prims, [p["semantic"] for p in spec.primitives]
    col = np.asarray(cube_prims[0]["color"], int)
    assert col[0] == 255 and col[1] == 0 and col[2] == 0, col


def test_habitat_textured_glb_object_renders_texture(tmp_path):
    """VERDICT r3 item 2, composite-scene leg: a habitat dataset whose
    object is a TEXTURED GLB must come back with merged UV/atlas tables
    and render the texture's two colors through the exact-tri backend
    (untextured OBJ instances coexist as flat 1×1 texels)."""
    import io
    import sys

    from PIL import Image

    sys.path.insert(0, os.path.dirname(__file__))
    from test_mesh_native import _write_glb_textured

    from visfly_tpu.envs import NavigationEnv
    from visfly_tpu.scene.habitat_dataset import load_habitat_scene_mesh

    root = tmp_path
    for d in ("configs/stages", "configs/objects", "configs/scenes",
              "meshes"):
        os.makedirs(root / d, exist_ok=True)
    t = 0.2
    _write_cuboid_obj(
        root / "meshes" / "room.obj",
        [0.0, -t / 2, -4.0], [3 + t, t / 2, 4 + t],
        extra=[([0.0, 1.5, -(8 + t / 2)], [3 + t, 1.5, t / 2])])

    # checkered wall quad, habitat frame: std x∈[2,2] plane won't survive
    # the axis map trivially — author it as a vertical quad at hab_z=-4
    # (std x=4) spanning hab_x∈[-2,2] (std y∈[-2,2]) hab_y∈[0,3] (std z)
    cells = (np.indices((8, 8)).sum(0) % 2) * 160 + 60
    img = np.kron(cells, np.ones((8, 8), np.uint8)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(np.stack([img] * 3, -1)).save(buf, format="PNG")
    verts = np.asarray([[-2, 0, 0], [2, 0, 0], [2, 3, 0], [-2, 3, 0]],
                       np.float32)
    faces = np.asarray([[0, 1, 2], [0, 2, 3]], np.uint32)
    uvs = np.asarray([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32)
    _write_glb_textured(str(root / "meshes" / "wall.glb"), verts, faces,
                        uvs, buf.getvalue())

    (root / "configs" / "stages" / "room.stage_config.json").write_text(
        json.dumps({"render_asset": "../../meshes/room.obj"}))
    (root / "configs" / "objects" / "wall.object_config.json").write_text(
        json.dumps({"render_asset": "../../meshes/wall.glb"}))
    (root / "configs" / "scenes" / "s1.scene_instance.json").write_text(
        json.dumps({
            "stage_instance": {"template_name": "room"},
            "object_instances": [
                {"template_name": "wall", "translation": [0.0, 0.0, -4.0]}],
        }))
    (root / "demo.scene_dataset_config.json").write_text(json.dumps({
        "stages": {"paths": {".json": ["configs/stages"]}},
        "objects": {"paths": {".json": ["configs/objects"]}},
    }))

    out = load_habitat_scene_mesh(
        str(root / "configs" / "scenes" / "s1.scene_instance.json"),
        return_instances=True, return_textures=True)
    texinfo = out[-1]
    assert len(texinfo["images"]) >= 2  # checker + flat stage texel
    assert texinfo["uv"].shape[0] == texinfo["tex"].shape[0]

    import jax.numpy as jnp

    from visfly_tpu.render import render_camera
    from visfly_tpu.scene.mesh import bake_scenes_from_meshes

    v, fc, _b, inst, cols, tex = out
    data = bake_scenes_from_meshes([(v, fc, inst, cols, tex)],
                                   spacing=0.15)
    assert data.tri_uv.shape[-1] == 6 and data.atlas.ndim == 4
    rgb = render_camera(
        data, jnp.zeros(1, jnp.int32), jnp.asarray([[1.0, 0.0, 1.5]]),
        jnp.asarray([[1.0, 0.0, 0.0, 0.0]]),
        {"uuid": "color", "sensor_type": "color", "resolution": [32, 32]},
        max_depth=12.0)["color"]
    g = np.asarray(rgb)[0, 0].astype(np.int32)
    vals = g[g > 0]
    assert vals.size > 200
    # the checkered wall fills the forward view: both cell colors present
    assert vals.max() > 2.2 * max(np.percentile(vals, 10), 1)
