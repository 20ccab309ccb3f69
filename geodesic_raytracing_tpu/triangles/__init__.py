from .scene import (
    Object3,
    TriangleScene,
    make_cube,
    object_from_obj,
    subtriangulate,
)
from .physics import ObjectGeodesic, precompute_object
from .render import (
    build_swept_triangles,
    intersect_scene,
    intersect_scene_binned,
    render_triangles,
)

__all__ = [
    "Object3",
    "TriangleScene",
    "make_cube",
    "object_from_obj",
    "subtriangulate",
    "ObjectGeodesic",
    "precompute_object",
    "build_swept_triangles",
    "intersect_scene",
    "intersect_scene_binned",
    "render_triangles",
]
