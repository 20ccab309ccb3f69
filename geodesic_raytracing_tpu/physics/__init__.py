from .geodesics import (
    GeodesicPath,
    interpolate_camera,
    parallel_transport_quantity,
    parallel_transport_tetrads,
    record_geodesic,
    tetrad_inverses_along_path,
)

__all__ = [
    "GeodesicPath",
    "interpolate_camera",
    "parallel_transport_quantity",
    "parallel_transport_tetrads",
    "record_geodesic",
    "tetrad_inverses_along_path",
]
