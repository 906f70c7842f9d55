from .camera import camera_rays, pixel_dirs_body
from .sphere_trace import render_camera, render_sensors, trace_rays
from .tri_trace import (
    cull_stats,
    default_tri_cap,
    pack_triangles,
    tri_trace_diff,
    tri_trace_pallas,
    tri_trace_xla,
)

__all__ = [
    "camera_rays",
    "pixel_dirs_body",
    "trace_rays",
    "render_camera",
    "render_sensors",
    "cull_stats",
    "default_tri_cap",
    "pack_triangles",
    "tri_trace_diff",
    "tri_trace_pallas",
    "tri_trace_xla",
]
