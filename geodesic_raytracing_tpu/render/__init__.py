from . import background, colour, pipeline
from .pipeline import (
    RenderData,
    RenderSettings,
    compute_render_data,
    init_camera_rays,
    render_frame,
    shade,
    trace_frame,
)

__all__ = [
    "background",
    "colour",
    "pipeline",
    "RenderData",
    "RenderSettings",
    "compute_render_data",
    "init_camera_rays",
    "render_frame",
    "shade",
    "trace_frame",
]
