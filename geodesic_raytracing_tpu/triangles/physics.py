"""Per-object geodesic precompute for triangle rendering.

Behavioural twin of ``physics::setup``/``physics::trace`` (physics.hpp:49-278):
every object gets a timelike geodesic traced once, tetrads parallel-
transported along it, the tetrads inverted, and the path subsampled by proper
distance (``subsample_tri_quantity`` cl.cl:3643-3834, ``DISTANCE_SKIPPING``)
so the renderer interpolates over a short, evenly-spaced segment list.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..metrics.base import Metric
from ..ops import tetrad
from ..ops.integrate import Features
from ..physics import geodesics
from .scene import Object3

Array = jax.Array


class ObjectGeodesic(NamedTuple):
    """Subsampled object worldline + frames (the 11 parallel buffers of
    physics.hpp:99-278, reduced to what the renderer consumes)."""

    positions: Array  # (K, 4)
    tetrads: Array  # (K, 4, 4) transported tetrads (rows = legs)
    inv_tetrads: Array  # (K, 4, 4) inverse (co-frame) tetrads
    count: Array  # () valid segment-node count


def precompute_object(metric: Metric, obj: Object3, params,
                      features: Features | None = None,
                      n_steps: int = 2048, segments: int = 64,
                      forward_and_back: bool = False) -> ObjectGeodesic:
    """Trace the object's timelike geodesic and build its frame data
    (physics.hpp:99-278 pipeline: cart_to_generic -> init_basis_vectors ->
    boost_tetrad -> init_inertial_ray -> get_geodesic_path ->
    parallel_transport_tetrads -> calculate_tetrad_inverse ->
    subsample_tri_quantity)."""
    if features is None:
        features = Features.for_metric(metric)

    # Object position: (t, x, y, z) world cartesian -> generic coordinates.
    cart = jnp.asarray(obj.position, dtype=jnp.float32)
    polar3 = _cart_to_polar3(cart[1:])
    polar = jnp.concatenate([cart[:1], polar3])
    x0 = metric.from_polar(polar, params)

    gab = metric.fn(x0, params)
    es, _ = tetrad.frame_basis(gab)
    es = tetrad.boost_tetrad(
        es, jnp.asarray(obj.velocity, dtype=jnp.float32), gab
    )
    v0 = es[0]  # the boosted timelike leg is the object's 4-velocity

    path = geodesics.record_geodesic(metric, x0, v0, params, features,
                                     n_steps=n_steps)
    tets = geodesics.parallel_transport_tetrads(metric, path, es, params)

    # Proper-distance subsampling (DISTANCE_SKIPPING cl.cl:3762-3834):
    # pick nodes at equal proper-time intervals.
    count = jnp.maximum(path.count, 2)
    total = path.proper_time[count - 1]
    targets = jnp.linspace(0.0, 1.0, segments) * total
    idx = jnp.searchsorted(path.proper_time, targets)
    idx = jnp.clip(idx, 0, count - 1)

    positions = path.positions[idx]
    sub_tets = tets[idx]
    inv = geodesics.tetrad_inverses_along_path(sub_tets)
    return ObjectGeodesic(positions=positions, tetrads=sub_tets,
                          inv_tetrads=inv,
                          count=jnp.asarray(segments, jnp.int32))


def _cart_to_polar3(c):
    x, y, z = c[0], c[1], c[2]
    r = jnp.sqrt(x * x + y * y + z * z)
    theta = jnp.arctan2(jnp.sqrt(x * x + y * y), z)
    phi = jnp.arctan2(y, x)
    return jnp.stack([r, theta, phi])
