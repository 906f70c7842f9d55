"""Scene construction and device-resident scene data.

Replaces the reference's SceneManager + habitat scene loading
(`/root/reference/utils/SceneManager.py:826-929`) and the procedural
``SceneGenerator`` (`/root/reference/utils/datasets/datasets.py:90-300`):
scenes are described as primitive lists, baked host-side into dense SDF (+
albedo + semantic-id) grids, and stacked into one ``SceneData`` pytree that
lives in HBM for the whole training run — rendering, collision queries and
spawn rejection all read from it without any host round-trip.

Named presets mirror the reference dataset scene families (visfly-beta):
``box15_wall_empty`` (the non-visual empty box world, `droneEnv.py:67-72`),
``garage_simple``, ``garage_crossing``, ``garage_landing``, ``racing``,
``forest`` (random columns), ``box_random`` (random boxes/spheres).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, NamedTuple, Sequence, Tuple

import numpy as np

from . import primitives as prim


# ---------------------------------------------------------------------------
# host-side scene description
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class SceneSpec:
    """One scene: bounds + primitive list (with color/semantic metadata)."""

    bounds_min: np.ndarray
    bounds_max: np.ndarray
    primitives: List[Dict[str, Any]]
    name: str = "scene"

    def sdf(self, p: np.ndarray) -> np.ndarray:
        return prim.eval_scene_sdf(p, self.primitives)


def best_candidate_points(
    rng: np.random.Generator,
    n: int,
    bounds_min: np.ndarray,
    bounds_max: np.ndarray,
    n_candidates: int = 16,
) -> np.ndarray:
    """Mitchell best-candidate (blue-noise) placement, mirroring
    ``datasets.py:170-300``: each new point is the candidate farthest from
    all previously chosen points."""
    pts: List[np.ndarray] = []
    for _ in range(n):
        cand = rng.uniform(bounds_min, bounds_max, size=(n_candidates, len(bounds_min)))
        if not pts:
            pts.append(cand[0])
            continue
        d = np.linalg.norm(
            cand[:, None, :] - np.asarray(pts)[None, :, :], axis=-1
        ).min(axis=1)
        pts.append(cand[int(np.argmax(d))])
    return np.asarray(pts)


_COLORS = np.asarray(
    [
        [188, 143, 143],
        [112, 128, 144],
        [160, 82, 45],
        [85, 107, 47],
        [70, 130, 180],
        [205, 133, 63],
        [119, 136, 153],
        [139, 69, 19],
    ],
    dtype=np.uint8,
)


def _room(bmin, bmax, open_top: bool = True) -> Dict[str, Any]:
    """Hollow room. ``open_top`` removes the ceiling from the geometry (like
    the reference garage stages — enables top-down debug/render views); the
    flight-volume z-bound is still enforced via the scene bbox
    (out-of-bounds test), not by a solid ceiling."""
    bmax_geo = np.asarray(bmax, np.float32).copy()
    if open_top:
        bmax_geo[2] += 50.0
    return {
        "type": "room",
        "bounds_min": np.asarray(bmin, np.float32),
        "bounds_max": bmax_geo,
        "color": np.asarray([210, 210, 205], np.uint8),
        "semantic": 1,
    }


def make_scene(name: str, seed: int = 42, **kwargs) -> SceneSpec:
    """Procedural scene presets (counterparts of the visfly-beta scenes)."""
    rng = np.random.default_rng(seed)

    if name in ("box15_wall_empty", "empty"):
        bmin, bmax = np.asarray([-30.0, -30.0, 0.0]), np.asarray([30.0, 30.0, 8.0])
        return SceneSpec(bmin, bmax, [_room(bmin, bmax)], name)

    if name in ("garage_simple", "garage_simple_l_medium", "cluttered"):
        # rectangular garage with random columns and boxes between spawn
        # (x≈1) and target (x≈9..14) — the cluttered_flight setting.
        # ``obstacle_scale`` shrinks obstacle cross-sections (same primitive
        # COUNT → same packed shapes → difficulty curricula are pure
        # runtime-operand scene swaps, zero recompilation)
        bmin, bmax = np.asarray([-2.0, -6.0, 0.0]), np.asarray([18.0, 6.0, 5.0])
        prims = [_room(bmin, bmax)]
        n_obs = kwargs.get("n_obstacles", 14)
        scale = float(kwargs.get("obstacle_scale", 1.0))
        pts = best_candidate_points(
            rng, n_obs, np.asarray([2.5, -5.0]), np.asarray([13.0, 5.0])
        )
        for i, (x, y) in enumerate(pts):
            if rng.uniform() < 0.6:
                prims.append(
                    {
                        "type": "cylinder",
                        "center": np.asarray([x, y, 2.5], np.float32),
                        "radius": float(rng.uniform(0.25, 0.5)) * scale,
                        "half_height": 2.5,
                        "color": _COLORS[i % len(_COLORS)],
                        "semantic": 2 + (i % 8),
                    }
                )
            else:
                prims.append(
                    {
                        "type": "box",
                        "center": np.asarray(
                            [x, y, float(rng.uniform(0.6, 1.8))], np.float32
                        ),
                        "half_extents": np.asarray(
                            [
                                rng.uniform(0.3, 0.8) * scale,
                                rng.uniform(0.3, 0.8) * scale,
                                rng.uniform(0.6, 1.8),
                            ],
                            np.float32,
                        ),
                        "color": _COLORS[i % len(_COLORS)],
                        "semantic": 2 + (i % 8),
                    }
                )
        return SceneSpec(bmin, bmax, prims, name)

    if name in ("garage_crossing", "crossing"):
        bmin, bmax = np.asarray([-8.0, -8.0, 0.0]), np.asarray([8.0, 8.0, 5.0])
        prims = [_room(bmin, bmax)]
        for i, (x, y) in enumerate(
            best_candidate_points(rng, kwargs.get("n_obstacles", 10),
                                  np.asarray([-6.0, -6.0]), np.asarray([6.0, 6.0]))
        ):
            prims.append(
                {
                    "type": "cylinder",
                    "center": np.asarray([x, y, 2.5], np.float32),
                    "radius": float(rng.uniform(0.2, 0.45)),
                    "half_height": 2.5,
                    "color": _COLORS[i % len(_COLORS)],
                    "semantic": 2 + (i % 8),
                }
            )
        return SceneSpec(bmin, bmax, prims, name)

    if name in ("garage_landing", "landing"):
        bmin, bmax = np.asarray([-4.0, -4.0, 0.0]), np.asarray([8.0, 4.0, 5.0])
        prims = [_room(bmin, bmax)]
        # landing pad: a dark flat box — the reference pad is detected by a
        # dark-pixel threshold (channel mean < 70, `LandingEnv.py:73`)
        prims.append(
            {
                "type": "box",
                "center": np.asarray(kwargs.get("pad_center", [2.0, 0.0, 0.05]), np.float32),
                "half_extents": np.asarray([0.5, 0.5, 0.05], np.float32),
                "color": np.asarray([35, 35, 40], np.uint8),
                "semantic": 9,
            }
        )
        return SceneSpec(bmin, bmax, prims, name)

    if name in ("racing", "racing_gates"):
        bmin, bmax = np.asarray([-12.0, -12.0, 0.0]), np.asarray([12.0, 12.0, 6.0])
        prims = [_room(bmin, bmax)]
        gates = kwargs.get(
            "gates",
            [
                ([6.0, 0.0, 2.0], np.pi / 2),
                ([0.0, 6.0, 2.0], 0.0),
                ([-6.0, 0.0, 2.0], np.pi / 2),
                ([0.0, -6.0, 2.0], 0.0),
            ],
        )
        for i, (c, yaw) in enumerate(gates):
            prims.append(
                {
                    "type": "gate",
                    "center": np.asarray(c, np.float32),
                    "yaw": float(yaw),
                    "inner_half": 0.7,
                    "thickness": 0.08,
                    "color": np.asarray([240, 120, 20], np.uint8),
                    "semantic": 10 + i,
                }
            )
        return SceneSpec(bmin, bmax, prims, name)

    if name == "forest":
        bmin, bmax = np.asarray([-10.0, -10.0, 0.0]), np.asarray([10.0, 10.0, 6.0])
        prims = [_room(bmin, bmax)]
        for i, (x, y) in enumerate(
            best_candidate_points(rng, kwargs.get("n_obstacles", 24),
                                  bmin[:2] + 1, bmax[:2] - 1)
        ):
            prims.append(
                {
                    "type": "cylinder",
                    "center": np.asarray([x, y, 3.0], np.float32),
                    "radius": float(rng.uniform(0.15, 0.35)),
                    "half_height": 3.0,
                    "color": _COLORS[i % len(_COLORS)],
                    "semantic": 2,
                }
            )
        return SceneSpec(bmin, bmax, prims, name)

    if name == "box_random":
        bmin, bmax = np.asarray([-8.0, -8.0, 0.0]), np.asarray([8.0, 8.0, 5.0])
        prims = [_room(bmin, bmax)]
        for i, (x, y) in enumerate(
            best_candidate_points(rng, kwargs.get("n_obstacles", 12),
                                  bmin[:2] + 1, bmax[:2] - 1)
        ):
            prims.append(
                {
                    "type": "sphere" if rng.uniform() < 0.3 else "box",
                    "center": np.asarray([x, y, rng.uniform(0.5, 2.0)], np.float32),
                    "radius": float(rng.uniform(0.3, 0.8)),
                    "half_extents": np.asarray(
                        [rng.uniform(0.3, 0.9)] * 3, np.float32
                    ),
                    "color": _COLORS[i % len(_COLORS)],
                    "semantic": 2 + (i % 8),
                }
            )
        return SceneSpec(bmin, bmax, prims, name)

    raise ValueError(f"unknown scene preset {name!r}")


SCENE_PATH_ALIASES = {
    # reference dataset paths (`exps/examples/env_cfgs/*.yaml`) → presets
    "box15_wall_empty": "box15_wall_empty",
    "box15_center_wall_empty": "box15_wall_empty",
    "garage_simple_l_medium": "garage_simple",
    "garage_crossing": "garage_crossing",
    "garage_landing": "garage_landing",
    "racing": "racing",
}


def resolve_scene_path(path: str) -> str:
    """Map a reference-style dataset path to a preset name."""
    base = path.rstrip("/").split("/")[-1]
    return SCENE_PATH_ALIASES.get(base, base)


# ---------------------------------------------------------------------------
# baking: SceneSpec → dense grids → SceneData (device pytree)
# ---------------------------------------------------------------------------


class SceneData(NamedTuple):
    """Stacked multi-scene grids resident in HBM.

    sdf: (S, X, Y, Z) float32 — signed distance
    albedo: (S, X, Y, Z, 3) uint8 — nearest-primitive color (zero-size array
        when color rendering is off)
    semantic: (S, X, Y, Z) uint8 — nearest-primitive semantic id
    origin: (3,) float32 grid frame origin (shared across scenes)
    spacing: () float32 cell size
    bbox: (2, 3) float32 world bounds (union)
    """

    sdf: Any
    albedo: Any
    semantic: Any
    origin: Any
    spacing: Any
    bbox: Any
    # optional EXACT geometry: (S, T, 9) padded triangle soup
    # [ax ay az bx by bz cx cy cz] — when present, cameras ray-trace the
    # true mesh (render/tri_trace.py) and collision queries answer exactly
    # (scene/queries.py::tri_closest_point)
    triangles: Any = ()
    # optional TEXTURES for the exact-tri backend (empty tuples when the
    # asset has none): per-packed-face UV corners (S, T, 6), atlas rects
    # (S, T, 4) [tw th y0 x0] texels, and the stacked atlas (S, AH, AW, 3)
    # uint8 — habitat renders these through GL (`SceneManager.py:1013-1035`)
    tri_uv: Any = ()
    tri_rect: Any = ()
    atlas: Any = ()

    @property
    def num_scene(self):
        return self.sdf.shape[0]


def bake_scenes(
    specs: Sequence[SceneSpec],
    spacing: float = 0.1,
    margin: float = 0.4,
    with_color: bool = True,
    max_cells: int = 384,
) -> SceneData:
    """Evaluate primitive SDFs on a shared dense grid and stack.

    All scenes share one grid frame sized to the union of their bounds (a
    static shape requirement — scene heterogeneity must not change shapes,
    SURVEY §7 hard part (c))."""
    import jax.numpy as jnp

    lo = np.min([s.bounds_min for s in specs], axis=0) - margin
    hi = np.max([s.bounds_max for s in specs], axis=0) + margin
    shape = np.minimum(
        np.ceil((hi - lo) / spacing).astype(int) + 1, max_cells
    )
    spacing = float(np.max((hi - lo) / (shape - 1)))
    xs = lo[0] + np.arange(shape[0]) * spacing
    ys = lo[1] + np.arange(shape[1]) * spacing
    zs = lo[2] + np.arange(shape[2]) * spacing
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    pts = np.stack([gx, gy, gz], axis=-1).astype(np.float32)  # (X,Y,Z,3)

    sdfs, colors, sems = [], [], []
    for spec in specs:
        d = None
        nearest = None
        for idx, pr in enumerate(spec.primitives):
            di = prim.eval_primitive(pts, pr).astype(np.float32)
            if d is None:
                d, nearest = di, np.zeros(di.shape, np.int16)
            else:
                closer = di < d
                d = np.where(closer, di, d)
                nearest = np.where(closer, idx, nearest)
        sdfs.append(d)
        col = np.zeros((*d.shape, 3), np.uint8)
        sem = np.zeros(d.shape, np.uint8)
        for idx, pr in enumerate(spec.primitives):
            m = nearest == idx
            col[m] = pr.get("color", np.asarray([180, 180, 180], np.uint8))
            sem[m] = pr.get("semantic", 0)
        colors.append(col)
        sems.append(sem)

    albedo = (
        jnp.asarray(np.stack(colors))
        if with_color
        else jnp.zeros((len(specs), 0, 0, 0, 3), jnp.uint8)
    )
    return SceneData(
        sdf=jnp.asarray(np.stack(sdfs)),
        albedo=albedo,
        semantic=jnp.asarray(np.stack(sems)),
        origin=jnp.asarray(lo, jnp.float32),
        spacing=jnp.asarray(spacing, jnp.float32),
        bbox=jnp.asarray(np.stack([lo + margin, hi - margin]), jnp.float32),
    )


def save_scene_spec(spec: SceneSpec, path: str) -> None:
    """Serialise a SceneSpec to JSON — counterpart of the reference
    ``SceneGenerator`` writing ``*.scene_instance.json`` datasets
    (`datasets.py:90-167`)."""
    import json
    import os

    def enc(v):
        return v.tolist() if isinstance(v, np.ndarray) else v

    data = {
        "name": spec.name,
        "bounds_min": spec.bounds_min.tolist(),
        "bounds_max": spec.bounds_max.tolist(),
        "primitives": [{k: enc(v) for k, v in p.items()} for p in spec.primitives],
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(data, f, indent=1)


def load_scene_spec(path: str) -> SceneSpec:
    import json

    with open(path) as f:
        data = json.load(f)
    prims = []
    for p in data["primitives"]:
        prims.append(
            {
                k: (np.asarray(v, np.float32) if isinstance(v, list) else v)
                for k, v in p.items()
            }
        )
        if "color" in prims[-1]:
            prims[-1]["color"] = prims[-1]["color"].astype(np.uint8)
        if "semantic" in prims[-1]:
            prims[-1]["semantic"] = int(prims[-1]["semantic"])
    return SceneSpec(
        bounds_min=np.asarray(data["bounds_min"], np.float32),
        bounds_max=np.asarray(data["bounds_max"], np.float32),
        primitives=prims,
        name=data.get("name", "scene"),
    )


def generate_scene_dataset(out_dir: str, preset: str, count: int,
                           seed: int = 42, **kwargs) -> List[str]:
    """Write ``count`` procedurally generated scene JSONs — the dataset-
    generation workflow of the reference ``SceneGenerator``."""
    import os

    paths = []
    for i in range(count):
        spec = make_scene(preset, seed=seed + i, **kwargs)
        p = os.path.join(out_dir, f"{preset}_{i:04d}.scene_instance.json")
        save_scene_spec(spec, p)
        paths.append(p)
    return paths


def _tile_scene_data(data: "SceneData", num_scene: int) -> "SceneData":
    """Tile a single-scene SceneData across the scene axis.

    Tiles EVERY per-scene leaf — including the texture tables (tri_uv,
    tri_rect, atlas): the textured-RGB path indexes the stacked atlas by
    scene id, so leaving those untiled makes scenes >= 1 read out of
    bounds and shade garbage."""
    import jax.numpy as jnp

    def tile(x):
        if getattr(x, "ndim", 0) == 0 or isinstance(x, tuple):
            return x
        return jnp.tile(x, (num_scene,) + (1,) * (x.ndim - 1))

    tri = data.triangles
    return data._replace(
        sdf=tile(data.sdf),
        albedo=tile(data.albedo),
        semantic=tile(data.semantic),
        triangles=(tile(tri) if getattr(tri, "ndim", 0) == 3 else tri),
        tri_uv=tile(data.tri_uv),
        tri_rect=tile(data.tri_rect),
        atlas=tile(data.atlas),
    )


def load_scenes_for_env(env):
    """Build the device scene from an env's scene_kwargs (reference
    ``SceneManager.load_scenes``, `SceneManager.py:826-891`).

    Default backend is the gather-free packed-primitive scene
    (`prim_scene.py`); pass ``scene_kwargs={"backend": "grid"}`` for the
    dense-grid (mesh) backend."""
    import os

    kw = dict(env.scene_kwargs)
    path = kw.get("path", "box15_wall_empty")
    seed = kw.get("seed", env.seed)

    # pre-baked scene injection: scene_kwargs={"data": SceneData} hands the
    # env an already-baked scene (benchmarks, procedurally generated or
    # externally converted geometry) — tiled across num_scene like the
    # mesh-file branch
    if "data" in kw:
        data = kw["data"]
        if getattr(data, "num_scene", env.num_scene) == 1 \
                and env.num_scene > 1:
            data = _tile_scene_data(data, env.num_scene)
        return data

    # imported mesh file (GLB/OBJ — the reference's habitat GLB stages,
    # `SceneManager.py:893-929`): by default decompose the baked SDF into
    # boxes so imported scenes run on the fast culled primitive kernel;
    # backend="grid" opts into the exact (but gather-bound) trilinear path
    if (isinstance(path, str) and os.path.isfile(path)
            and path.lower().endswith((".glb", ".gltf", ".obj"))):
        if kw.get("backend", "primitive") == "grid":
            from .mesh import bake_mesh_scene

            data = bake_mesh_scene(path, spacing=kw.get("sdf_spacing", 0.1),
                                   margin=kw.get("margin", 0.5))
            if env.num_scene > 1:
                data = _tile_scene_data(data, env.num_scene)
            return data
        from .decompose import decompose_mesh_scene

        spec = decompose_mesh_scene(
            path, spacing=kw.get("sdf_spacing", 0.1),
            margin=kw.get("margin", 0.5),
            max_prims=kw.get("max_prims", 48),
            min_cover=kw.get("min_cover", 0.98),
        )
        specs = [spec] * env.num_scene
        env._scene_specs = specs
        return _build_scene(env, specs)

    # habitat-format composite scenes (stage + object placements resolved
    # through a *.scene_dataset_config.json — `SceneManager.py:243-271,
    # 893-929`): a scene_instance file, a directory of them (scene set /
    # dataset rotation), or a dataset config listing them
    from .habitat_dataset import is_habitat_scene_path

    if is_habitat_scene_path(path):
        from ..utils.dataloader import SimpleDataLoader
        from .habitat_dataset import (HabitatDataset, find_dataset_config,
                                      list_habitat_scenes,
                                      load_habitat_scene)

        if getattr(env, "_scene_loader", None) is None:
            files = list_habitat_scenes(path)
            if not files:
                raise FileNotFoundError(f"no scene instances under {path}")
            env._scene_loader = SimpleDataLoader(files, seed=seed)
            cfg = (path if path.endswith(".scene_dataset_config.json")
                   else find_dataset_config(files[0]))
            env._habitat_dataset = HabitatDataset(cfg) if cfg else None
        files = env._scene_loader.next(env.num_scene)
        if kw.get("backend", "primitive") == "grid":
            # EXACT path: merged meshes baked to stacked grids (collisions,
            # union-bounds shared frame) with the true triangles attached
            # (cameras — `render/tri_trace.py`)
            from .habitat_dataset import load_habitat_scene_mesh
            from .mesh import bake_scenes_from_meshes

            # (verts, faces, face_inst_ids, inst_colors) → per-instance
            # semantic grid + material/palette albedo (habitat's
            # per-instance semantic sensor)
            loaded = [load_habitat_scene_mesh(f, env._habitat_dataset,
                                              return_instances=True,
                                              return_textures=True)
                      for f in files]
            meshes = [(v, fc, inst, cols, tex)
                      for v, fc, _b, inst, cols, tex in loaded]
            return bake_scenes_from_meshes(
                meshes, spacing=kw.get("sdf_spacing", 0.1),
                margin=kw.get("margin", 0.5),
                max_cells=kw.get("max_cells", 384))
        hab_kw = {k: kw[k] for k in
                  ("spacing", "margin", "max_prims", "min_cover", "max_cells")
                  if k in kw}
        specs = [load_habitat_scene(f, env._habitat_dataset, **hab_kw)
                 for f in files]
        env._scene_specs = specs
        # different dataset scenes decompose into different primitive
        # counts; a swap that grows packed shapes forces a retrace. Floor
        # the pack at the max seen so far rounded up a whole ×8 bucket —
        # absorbs typical scene-to-scene variation without bloating the
        # kernel's unrolled row count (a retrace still happens if a later
        # scene overflows the bucket; raise max_prims-level padding via
        # scene_kwargs min_k to pin it entirely)
        n_max = max(len(s.primitives) for s in specs)
        env._pack_floor = max(int(getattr(env, "_pack_floor", 0)),
                              -(-(n_max + 4) // 8) * 8)
        return _build_scene(env, specs)

    # dataset directory of scene JSONs → round-robin loader (the reference's
    # SimpleDataLoader scene iteration, `SceneManager.py:826-891`)
    if os.path.isdir(path):
        from ..utils.dataloader import ChildrenPathDataset, SimpleDataLoader

        if getattr(env, "_scene_loader", None) is None:
            env._scene_loader = SimpleDataLoader(
                ChildrenPathDataset(path, seed=seed), seed=seed
            )
        files = env._scene_loader.next(env.num_scene)
        specs = [load_scene_spec(f) for f in files]
    else:
        preset = resolve_scene_path(path)
        specs = [
            make_scene(preset, seed=seed + i, **kw.get("scene_gen_kwargs", {}))
            for i in range(env.num_scene)
        ]
    env._scene_specs = specs  # retained for per-scene swaps (reset_env_by_id)
    return _build_scene(env, specs)


def _build_scene(env, specs):
    kw = dict(env.scene_kwargs)
    if kw.get("backend", "primitive") == "grid":
        return bake_scenes(
            specs,
            spacing=kw.get("sdf_spacing", 0.1),
            with_color=kw.get("with_color", True),
        )
    from .prim_scene import pack_scenes

    old = getattr(env, "scene", None)
    floor = int(getattr(env, "_pack_floor", 0))
    floors = dict(min_k=floor, min_kb=floor, min_kc=floor) if floor else {}
    if old is not None and hasattr(old, "params"):
        # keep the compiled program's shapes across swaps
        floors = dict(min_k=max(floor, old.params.shape[1]),
                      min_kb=max(floor, old.boxes.shape[1]),
                      min_kc=max(floor, old.capsules.shape[1]))
    return pack_scenes(specs, **floors)


def swap_scene_for_env(env, scene_id: int):
    """Regenerate ONE scene's assets and rebuild the packed scene pytree —
    the asset half of the reference's per-scene ``reset_env_by_id``
    (`droneGymEnv.py:329-337`: swaps a single habitat scene). Other scenes'
    specs are unchanged, so their packed rows are bit-identical; shape
    floors keep the result compatible with already-compiled programs."""
    import os

    kw = dict(env.scene_kwargs)
    path = kw.get("path", "box15_wall_empty")
    if (isinstance(path, str)
            and path.lower().endswith((".glb", ".gltf", ".obj"))):
        # imported mesh scenes are deterministic (every scene shares the
        # decomposed spec) — swapping one is the identity, not a re-roll
        return env.scene
    from .habitat_dataset import is_habitat_scene_path

    if is_habitat_scene_path(path):
        from .habitat_dataset import load_habitat_scene

        hab_kw = {k: kw[k] for k in
                  ("spacing", "margin", "max_prims", "min_cover", "max_cells")
                  if k in kw}
        spec = load_habitat_scene(env._scene_loader.next(1)[0],
                                  getattr(env, "_habitat_dataset", None),
                                  **hab_kw)
    elif os.path.isdir(path):
        spec = load_scene_spec(env._scene_loader.next(1)[0])
    else:
        env._scene_swap_count = getattr(env, "_scene_swap_count", 0) + 1
        seed = (kw.get("seed", env.seed) + env.num_scene * 1000
                + env._scene_swap_count)
        spec = make_scene(resolve_scene_path(path), seed=seed,
                          **kw.get("scene_gen_kwargs", {}))
    specs = list(env._scene_specs)
    specs[scene_id] = spec
    env._scene_specs = specs
    scene = _build_scene(env, specs)
    env.scene = scene
    return scene
