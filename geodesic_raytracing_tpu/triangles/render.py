"""GR triangle rendering: swept-volume ("toblerone") intersection.

Behavioural twin of the reference's triangle pipeline (§3.4 of the survey):
camera ray paths are recorded (cl.cl:4181-4232); each object sweeps its
triangles along its precomputed geodesic; a ray segment hits a triangle when
the fixed-point solve of ``ray_intersects_toblerone2`` (cl.cl:3846-3952)
converges onto a consistent coordinate time, where a Moller-Trumbore test in
the object's local (inverse-tetrad) frame decides the hit, shaded by surface
normal (``render_chunked_tris`` cl.cl:4573-4734).

TPU design note: the reference builds per-chunk 4D AABB triangle bins with
atomic allocators (cl.cl:4265-4571) because its scenes reach 800 MB of swept
triangles.  Here rays x object-segments x triangles are tested densely under
masks, scanned over ray segments to bound memory — binning can be added as a
gather stage when scene sizes demand it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..metrics.base import Metric
from ..ops import integrate
from ..ops.integrate import Features, RayState, TraceOptions
from .physics import ObjectGeodesic
from .scene import TriangleScene

Array = jax.Array


def periodic_diff(a: Array, b: Array, periods: Array) -> Array:
    """Shortest difference a - b with per-coordinate wrapping
    (cl.cl:3598-3630)."""
    d = a - b
    safe = jnp.where(periods > 0, periods, 1.0)
    wrapped = d - jnp.round(d / safe) * safe
    return jnp.where(periods > 0, wrapped, d)


def _ray_plane(pos3, dir3, p0, n):
    """cl.cl:3436-3456 ray/plane; returns (ok, t)."""
    denom = jnp.sum(dir3 * n, axis=-1)
    ok = jnp.abs(denom) >= 1e-6
    t = jnp.sum((p0 - pos3) * n, axis=-1) / jnp.where(ok, denom, 1.0)
    return ok, jnp.where(ok, t, 0.0)


def _moller_trumbore(o, d, v0, v1, v2):
    """Moller-Trumbore (cl.cl:3473-3520); returns (hit, t) with t in ray
    parameter units."""
    e1 = v1 - v0
    e2 = v2 - v0
    h = jnp.cross(d, e2)
    a = jnp.sum(e1 * h, axis=-1)
    ok = jnp.abs(a) > 1e-9
    f = 1.0 / jnp.where(ok, a, 1.0)
    s = o - v0
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e1)
    v = f * jnp.sum(d * q, axis=-1)
    t = f * jnp.sum(e2 * q, axis=-1)
    hit = ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t > 1e-6)
    return hit, jnp.where(hit, t, jnp.inf)


def _toblerone_hit(ga, gb, v0, v1, v2, p1, p2, ie_r, ie_n, periods):
    """One (ray segment) x (object segment) x (triangle) test
    (``ray_intersects_toblerone2`` cl.cl:3846-3952).

    ``ie_r``/``ie_n`` are inverse tetrads (rows = co-frame legs) at the two
    object nodes.  Returns (hit, t) with t in [0, 1] along the ray segment.
    """
    plane_n = jnp.cross(v1 - v0, v2 - v0)
    plane_n = plane_n / jnp.maximum(jnp.linalg.norm(plane_n), 1e-12)

    ray_vel = gb - ga
    initial_diff = periodic_diff(ga, p1, periods)

    def body(carry, _):
        next_frac, _, _, _, _ = carry
        frac = jnp.clip(next_frac, 0.0, 1.0)
        ie = ie_r + frac * (ie_n - ie_r)
        obj_pos = p1 + frac * (p2 - p1)

        diff = initial_diff + p1 - obj_pos
        pos = ie @ diff
        dirv = ie @ ray_vel

        _, found_t = _ray_plane(pos[1:], dirv[1:], v0, plane_n)

        o_start = (ie @ (p1 - obj_pos))[0]
        o_end = (ie @ (p2 - obj_pos))[0]

        ipt = pos + dirv * found_t
        denom = jnp.where(jnp.abs(o_end - o_start) < 1e-12, 1.0,
                          o_end - o_start)
        nf = (ipt[0] - o_start) / denom
        return (nf, pos, dirv, o_start, o_end), None

    init = (jnp.asarray(0.0, ga.dtype), jnp.zeros(4, ga.dtype),
            jnp.zeros(4, ga.dtype), jnp.asarray(0.0, ga.dtype),
            jnp.asarray(0.0, ga.dtype))
    (nf, pos, dirv, o_start, o_end), _ = jax.lax.scan(
        body, init, None, length=8
    )

    hit, ray_t = _moller_trumbore(pos[1:], dirv[1:], v0, v1, v2)
    end_t = pos[0] + dirv[0] * ray_t
    hit = hit & (end_t >= jnp.minimum(o_start, o_end)) & (
        end_t <= jnp.maximum(o_start, o_end)
    )
    hit = hit & (ray_t >= 0) & (ray_t <= 1)
    return hit, jnp.where(hit, ray_t, jnp.inf)


def intersect_scene(metric: Metric, path: Array, scene: TriangleScene,
                    geos: list[ObjectGeodesic], params):
    """Test every recorded ray segment against every object's swept triangles.

    ``path``: (S+1, N, 4).  Returns ``(hit (N,), colour (N, 3))`` taking the
    earliest-segment nearest hit, shaded by local-frame normal.
    """
    periods = metric.periods(params)
    S = path.shape[0] - 1
    n = path.shape[1]

    best_key = jnp.full((n,), jnp.inf)
    colour = jnp.zeros((n, 3))

    tri_sets = []
    for oi, geo in enumerate(geos):
        mask = scene.parent == oi
        tri_sets.append(
            (
                jnp.asarray(scene.v0[mask]),
                jnp.asarray(scene.v1[mask]),
                jnp.asarray(scene.v2[mask]),
                geo,
            )
        )

    def per_segment(s, carry):
        best_key, colour = carry
        ga = path[s]      # (N, 4)
        gb = path[s + 1]  # (N, 4)

        for v0s, v1s, v2s, geo in tri_sets:
            K = geo.positions.shape[0] - 1
            p1 = geo.positions[:-1]      # (K, 4)
            p2 = geo.positions[1:]
            ier = geo.inv_tetrads[:-1]   # (K, 4, 4)
            ien = geo.inv_tetrads[1:]

            def for_ray(a, b):
                def for_seg(p1k, p2k, ierk, ienk):
                    def for_tri(t0, t1, t2):
                        return _toblerone_hit(a, b, t0, t1, t2, p1k, p2k,
                                              ierk, ienk, periods)

                    return jax.vmap(for_tri)(v0s, v1s, v2s)

                hits, ts = jax.vmap(for_seg)(p1, p2, ier, ien)
                return hits, ts  # (K, T)

            hits, ts = jax.vmap(for_ray)(ga, gb)  # (N, K, T)
            flat_t = jnp.where(hits, ts, jnp.inf).reshape(n, -1)
            arg = jnp.argmin(flat_t, axis=1)
            t_best = jnp.take_along_axis(flat_t, arg[:, None], axis=1)[:, 0]
            any_hit = jnp.isfinite(t_best)

            # Normal-colour shading (render_chunked_tris cl.cl:4700-4720).
            e1 = (v1s - v0s)
            e2 = (v2s - v0s)
            normals = jnp.cross(e1, e2)
            normals = normals / jnp.maximum(
                jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12
            )
            tri_idx = arg % v0s.shape[0]
            col = jnp.abs(normals)[tri_idx]

            key = s + jnp.clip(t_best, 0.0, 1.0)
            better = any_hit & (key < best_key)
            best_key = jnp.where(better, key, best_key)
            colour = jnp.where(better[:, None], col, colour)

        return best_key, colour

    # Python loop over ray segments (S is small and static).
    for s in range(S):
        best_key, colour = per_segment(s, (best_key, colour))

    return jnp.isfinite(best_key), colour


def render_triangles(metric: Metric, state: RayState, params,
                     scene: TriangleScene, geos: list[ObjectGeodesic],
                     features: Features | None = None,
                     opts: TraceOptions = TraceOptions(),
                     n_slots: int = 16, steps_per_slot: int = 64):
    """Trace rays with path recording, then intersect the scene.

    Returns ``(final RayState, hit (N,), colour (N, 3))``.
    """
    if features is None:
        features = Features.for_metric(metric)
    final, path = integrate.trace_rays_recorded(
        metric, state, params, features=features, opts=opts,
        n_slots=n_slots, steps_per_slot=steps_per_slot,
    )
    hit, colour = intersect_scene(metric, path, scene, geos, params)
    return final, hit, colour
