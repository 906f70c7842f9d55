from .prim_scene import PrimitiveScene, pack_scenes
from .queries import (
    closest_point_query,
    point_is_collision,
    sample_sdf,
    sample_sdf_nearest,
    sdf_normal,
)
from .scene import (
    SceneData,
    SceneSpec,
    bake_scenes,
    best_candidate_points,
    load_scenes_for_env,
    make_scene,
    swap_scene_for_env,
    resolve_scene_path,
)

__all__ = [
    "PrimitiveScene",
    "pack_scenes",
    "SceneData",
    "SceneSpec",
    "make_scene",
    "bake_scenes",
    "best_candidate_points",
    "load_scenes_for_env",
    "swap_scene_for_env",
    "resolve_scene_path",
    "sample_sdf",
    "sample_sdf_nearest",
    "sdf_normal",
    "closest_point_query",
    "point_is_collision",
]
