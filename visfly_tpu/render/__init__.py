from .camera import camera_rays, pixel_dirs_body
from .sphere_trace import render_camera, render_sensors, trace_rays

__all__ = [
    "camera_rays",
    "pixel_dirs_body",
    "trace_rays",
    "render_camera",
    "render_sensors",
]
