from .scene import (
    Object3,
    TriangleScene,
    make_cube,
    object_from_obj,
    subtriangulate,
)
from .physics import ObjectGeodesic, precompute_object
from .render import render_triangles

__all__ = [
    "Object3",
    "TriangleScene",
    "make_cube",
    "object_from_obj",
    "subtriangulate",
    "ObjectGeodesic",
    "precompute_object",
    "render_triangles",
]
