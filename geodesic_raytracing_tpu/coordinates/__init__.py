from .transforms import (
    TRANSFORMS,
    PERIODICITY,
    get_transform,
    get_periodicity,
    velocity_transform,
    cartesian_to_polar3,
    polar_to_cartesian3,
    cartesian_velocity_to_polar_velocity,
    spherical_velocity_to_cartesian_velocity,
)

__all__ = [
    "TRANSFORMS",
    "PERIODICITY",
    "get_transform",
    "get_periodicity",
    "velocity_transform",
    "cartesian_to_polar3",
    "polar_to_cartesian3",
    "cartesian_velocity_to_polar_velocity",
    "spherical_velocity_to_cartesian_velocity",
]
