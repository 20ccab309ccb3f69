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
triangles.  Two intersectors are provided:

* :func:`intersect_scene` — rays x object-segments x triangles tested
  densely under masks (exact; right for small scenes), and
* :func:`intersect_scene_binned` — the reference's binning re-expressed
  without atomics: swept-triangle 4D AABBs (``generate_computed_tris``
  cl.cl:4386), per-ray-chunk 4D AABBs (``generate_clip_regions``
  cl.cl:4265), a dense periodic-overlap matrix replacing the atomic bin
  allocator (``generate_tri_lists2`` cl.cl:4490, ``common.cl:58-119``), and
  a static per-chunk candidate budget selected with ``top_k`` — the
  variable-length bins of the reference become fixed-size gathers.
"""

from __future__ import annotations

from typing import NamedTuple

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


def _moller_trumbore_cf(o, d, v0, v1, v2):
    """Component-first Moller-Trumbore: each argument is a 3-tuple of
    mutually-broadcastable arrays (x, y, z).  Same math as
    :func:`_moller_trumbore`, but the arrays keep the triangle axis minor
    instead of a size-3 component axis — the vector form ran the compact
    intersector's (Wt, ps, 3) elementwise stream at 3/128 lane occupancy
    (BENCH_NOTES round-5 stage table: MT+scatter 0.33 s vs ~10 ms of
    roofline flops)."""
    def _cross(a, b):
        return (a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0])

    def _dot(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    e1 = tuple(v1[i] - v0[i] for i in range(3))
    e2 = tuple(v2[i] - v0[i] for i in range(3))
    h = _cross(d, e2)
    a = _dot(e1, h)
    ok = jnp.abs(a) > 1e-9
    f = 1.0 / jnp.where(ok, a, 1.0)
    s = tuple(o[i] - v0[i] for i in range(3))
    u = f * _dot(s, h)
    q = _cross(s, e1)
    v = f * _dot(d, q)
    t = f * _dot(e2, q)
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


class SweptTriangles(NamedTuple):
    """The "computed tris" buffer (``generate_computed_tris`` cl.cl:4386):
    one entry per (object geodesic segment x triangle), all objects
    concatenated, with padded 4D AABBs and everything the toblerone solve
    needs gathered per entry."""

    lo: Array  # (M, 4) AABB min (generic coordinates)
    hi: Array  # (M, 4) AABB max
    v0: Array  # (M, 3) local-frame triangle vertices
    v1: Array
    v2: Array
    p1: Array  # (M, 4) object node positions bounding the segment
    p2: Array
    ier: Array  # (M, 4, 4) inverse tetrads at the nodes
    ien: Array
    normal: Array  # (M, 3) local-frame unit normal (shading)


def build_swept_triangles(scene: TriangleScene,
                          geos: list["ObjectGeodesic"],
                          pad: float = 0.0) -> SweptTriangles:
    """Sweep every object's triangles along its geodesic segments and bound
    each swept volume with a 4D AABB (``generate_computed_tris``
    cl.cl:4386-4488).  Triangle world extents come from the transported
    tetrads: vertex^mu = p^mu + v^a e_a^mu at each bounding node."""
    parts = []
    for oi, geo in enumerate(geos):
        mask = np.asarray(scene.parent) == oi
        if not mask.any():
            continue
        v0 = jnp.asarray(scene.v0[mask])  # (T, 3)
        v1 = jnp.asarray(scene.v1[mask])
        v2 = jnp.asarray(scene.v2[mask])
        T = v0.shape[0]
        p = geo.positions          # (K, 4)
        es = geo.tetrads           # (K, 4, 4) rows = legs
        K = p.shape[0]

        verts = jnp.stack([v0, v1, v2], axis=1)  # (T, 3, 3)
        local4 = jnp.concatenate(
            [jnp.zeros(verts.shape[:-1] + (1,), verts.dtype), verts], axis=-1
        )  # (T, 3, 4)
        # world offset^mu = v^a e_a^mu  (tetrad_to_coordinate, cl.cl:2150)
        offs = jnp.einsum("tva,kam->ktvm", local4, es)  # (K, T, 3, 4)
        world = p[:, None, None, :] + offs

        # Per segment: bound the 6 vertices at nodes k and k+1.
        w1, w2 = world[:-1], world[1:]  # (K-1, T, 3, 4)
        both = jnp.concatenate([w1, w2], axis=2)  # (K-1, T, 6, 4)
        lo = jnp.min(both, axis=2) - pad
        hi = jnp.max(both, axis=2) + pad

        e1 = v1 - v0
        e2 = v2 - v0
        nrm = jnp.cross(e1, e2)
        nrm = nrm / jnp.maximum(
            jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12
        )

        def seg_tri(x, extra=(K - 1, T)):  # (K-1, T, ...) -> (M_o, ...)
            return x.reshape((extra[0] * extra[1],) + x.shape[2:])

        def per_tri(x):  # (T, ...) -> (M_o, ...) tiled over segments
            return jnp.tile(x, (K - 1,) + (1,) * (x.ndim - 1))

        def per_seg(x):  # (K-1, ...) -> (M_o, ...) repeated over triangles
            return jnp.repeat(x, T, axis=0)

        parts.append(SweptTriangles(
            lo=seg_tri(lo), hi=seg_tri(hi),
            v0=per_tri(v0), v1=per_tri(v1), v2=per_tri(v2),
            p1=per_seg(p[:-1]), p2=per_seg(p[1:]),
            ier=per_seg(geo.inv_tetrads[:-1]),
            ien=per_seg(geo.inv_tetrads[1:]),
            normal=per_tri(nrm),
        ))
    return jax.tree.map(lambda *xs: jnp.concatenate(xs), *parts)


def _periodic_aabb_overlap(lo1, hi1, lo2, hi2, periods):
    """Periodic 4D AABB overlap (``common.cl:58-119``): compare centre
    distances (shortest wrapped) against summed half-extents.  Shapes
    broadcast; the coordinate axis is last."""
    c1, h1 = (lo1 + hi1) * 0.5, (hi1 - lo1) * 0.5
    c2, h2 = (lo2 + hi2) * 0.5, (hi2 - lo2) * 0.5
    d = jnp.abs(periodic_diff(c1, c2, periods))
    return jnp.all(d <= h1 + h2, axis=-1)


def intersect_scene_binned(metric: Metric, path: Array,
                           scene: TriangleScene,
                           geos: list["ObjectGeodesic"], params,
                           block: int = 256, budget: int = 64,
                           pad: float = 0.0, with_stats: bool = False):
    """Binned twin of :func:`intersect_scene`: per (ray block x ray segment)
    chunk, only the ``budget`` swept triangles whose AABBs overlap the
    chunk's AABB run the toblerone solve (``generate_clip_regions`` ->
    ``generate_tri_lists2`` -> ``render_chunked_tris``, cl.cl:4265-4734).

    Work drops from N*S*K*T toblerone solves to N*S*budget; a chunk whose
    overlap set exceeds ``budget`` keeps the earliest object segments (the
    reference's bins simply overflow, cl.cl:4544-4556).  Exact whenever the
    per-chunk overlap count fits the budget.

    ``with_stats`` additionally returns ``{"dropped": total candidates cut
    by the budget, "max_overlap": worst chunk's overlap count}`` so budget
    overflow is detected rather than silent (a dropped candidate can be a
    missed intersection).
    """
    periods = metric.periods(params)
    swept = build_swept_triangles(scene, geos, pad=pad)
    M = swept.lo.shape[0]
    B = min(budget, M)

    S = path.shape[0] - 1
    n = path.shape[1]
    nb = -(-n // block)
    n_pad = nb * block

    def pad_rays(x):  # (N, 4) -> (NB, RB, 4); clone the last ray as filler
        fill = jnp.broadcast_to(x[-1:], (n_pad - n, 4))
        return jnp.concatenate([x, fill]).reshape(nb, block, 4)

    best_key = jnp.full((n_pad,), jnp.inf)
    colour = jnp.zeros((n_pad, 3))
    dropped = jnp.zeros((), jnp.int32)
    max_overlap = jnp.zeros((), jnp.int32)

    for s in range(S):
        ga = pad_rays(path[s])
        gb = pad_rays(path[s + 1])

        # Chunk AABBs over the block's segment endpoints
        # (generate_clip_regions cl.cl:4265: workgroup reduction -> jnp.min).
        seg = jnp.concatenate([ga, gb], axis=1)  # (NB, 2*RB, 4)
        lo_c = jnp.min(seg, axis=1)  # (NB, 4)
        hi_c = jnp.max(seg, axis=1)

        ov = _periodic_aabb_overlap(
            lo_c[:, None, :], hi_c[:, None, :],
            swept.lo[None], swept.hi[None], periods,
        )  # (NB, M)

        # Fixed-budget bins: top_k of the overlap mask keeps the first B
        # overlapping entries per chunk (top_k is stable: ties resolve to
        # the lowest index — the earliest object segment).
        vals, idx = jax.lax.top_k(ov.astype(jnp.float32), B)  # (NB, B)
        valid = vals > 0.0
        if with_stats:
            n_ov = ov.sum(axis=1, dtype=jnp.int32)  # (NB,)
            dropped = dropped + jnp.maximum(n_ov - B, 0).sum()
            max_overlap = jnp.maximum(max_overlap, n_ov.max())

        cand = jax.tree.map(lambda x: x[idx], swept)  # (NB, B, ...)

        def for_block(a_blk, b_blk, c, vld):
            def for_ray(a, b):
                def for_cand(t0, t1, t2, p1, p2, ier, ien):
                    return _toblerone_hit(a, b, t0, t1, t2, p1, p2,
                                          ier, ien, periods)

                return jax.vmap(for_cand)(c.v0, c.v1, c.v2, c.p1, c.p2,
                                          c.ier, c.ien)  # (B,)

            hits, ts = jax.vmap(for_ray)(a_blk, b_blk)  # (RB, B)
            hits = hits & vld[None, :]
            ts = jnp.where(hits, ts, jnp.inf)
            arg = jnp.argmin(ts, axis=1)  # (RB,)
            t_best = jnp.take_along_axis(ts, arg[:, None], axis=1)[:, 0]
            return t_best, c.normal[arg]

        t_best, nrm = jax.vmap(for_block)(ga, gb, cand, valid)
        t_best = t_best.reshape(n_pad)
        col = jnp.abs(nrm.reshape(n_pad, 3))

        key = s + jnp.clip(t_best, 0.0, 1.0)
        better = jnp.isfinite(t_best) & (key < best_key)
        best_key = jnp.where(better, key, best_key)
        colour = jnp.where(better[:, None], col, colour)

    if with_stats:
        return jnp.isfinite(best_key[:n]), colour[:n], {
            "dropped": dropped, "max_overlap": max_overlap}
    return jnp.isfinite(best_key[:n]), colour[:n]


class Patches(NamedTuple):
    """Static local-frame triangle patches, one set per object
    (:func:`build_patches`).  Objects are rigid in their own tetrad frame,
    so this acceleration structure is built ONCE per scene on the host —
    pruning power the reference's object-blind chunk lists cannot have
    (its per-triangle swept AABBs are all sweep-sized, cl.cl:4490-4571)."""

    v0: Array      # (O, P, ps, 3) local-frame vertices, padded
    v1: Array
    v2: Array
    normal: Array  # (O, P, ps, 3) unit normals
    valid: Array   # (O, P, ps) real-triangle mask
    lo: Array      # (O, P, 3) patch AABB min (local frame)
    hi: Array      # (O, P, 3)


def build_patches(scene: TriangleScene, n_objects: int,
                  patch_size: int = 32) -> Patches:
    """Group each object's triangles into spatially-coherent fixed-size
    patches (recursive median split along the widest centroid axis), with
    local-frame AABBs.  Host-side numpy; runs once per scene."""
    v0s, v1s, v2s = (np.asarray(scene.v0), np.asarray(scene.v1),
                     np.asarray(scene.v2))
    parent = np.asarray(scene.parent)

    def kd_order(cent):
        """Return an ordering grouping nearby centroids into contiguous
        runs of patch_size."""
        idx = np.arange(cent.shape[0])

        def split(ids):
            if ids.size <= patch_size:
                return [ids]
            c = cent[ids]
            axis = int(np.argmax(c.max(0) - c.min(0)))
            order = ids[np.argsort(c[:, axis], kind="stable")]
            half = (ids.size // 2 // patch_size) * patch_size
            half = max(half, patch_size)
            return split(order[:half]) + split(order[half:])

        return np.concatenate(split(idx))

    per_obj = []
    for oi in range(n_objects):
        m = parent == oi
        a, b, c = v0s[m], v1s[m], v2s[m]
        T = a.shape[0]
        if T == 0:
            a = b = c = np.zeros((1, 3), np.float32)
            T = 1
        order = kd_order((a + b + c) / 3.0)
        a, b, c = a[order], b[order], c[order]
        pad = -T % patch_size
        va = np.ones(T + pad, bool)
        va[T:] = False
        if pad:
            filler = np.repeat(a[-1:], pad, axis=0)
            a = np.concatenate([a, filler])
            b = np.concatenate([b, filler])
            c = np.concatenate([c, filler])
        P = a.shape[0] // patch_size
        a = a.reshape(P, patch_size, 3)
        b = b.reshape(P, patch_size, 3)
        c = c.reshape(P, patch_size, 3)
        va = va.reshape(P, patch_size)
        n = np.cross(b - a, c - a)
        n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        allv = np.stack([a, b, c], axis=2)  # (P, ps, 3, 3)
        lo = np.where(va[..., None], allv.min(2), np.inf).min(1)
        hi = np.where(va[..., None], allv.max(2), -np.inf).max(1)
        lo = np.where(np.isfinite(lo), lo, 0.0)
        hi = np.where(np.isfinite(hi), hi, 0.0)
        per_obj.append((a, b, c, n, va, lo, hi))

    Pmax = max(p[0].shape[0] for p in per_obj)

    def padP(x, fill=0.0):
        pad = Pmax - x.shape[0]
        if pad == 0:
            return x
        return np.concatenate(
            [x, np.full((pad,) + x.shape[1:], fill, x.dtype)])

    return Patches(
        v0=jnp.asarray(np.stack([padP(p[0]) for p in per_obj])),
        v1=jnp.asarray(np.stack([padP(p[1]) for p in per_obj])),
        v2=jnp.asarray(np.stack([padP(p[2]) for p in per_obj])),
        normal=jnp.asarray(np.stack([padP(p[3]) for p in per_obj])),
        valid=jnp.asarray(np.stack([padP(p[4], False) for p in per_obj])),
        lo=jnp.asarray(np.stack([padP(p[5]) for p in per_obj])),
        hi=jnp.asarray(np.stack([padP(p[6]) for p in per_obj])),
    )


class SweptObjects(NamedTuple):
    """One entry per (object x geodesic segment): the object's WHOLE swept
    4D AABB plus the frame data of its bounding nodes.  ~objects x segments
    entries (vs triangles x segments for :class:`SweptTriangles`)."""

    lo: Array   # (Mo, 4)
    hi: Array   # (Mo, 4)
    p1: Array   # (Mo, 4)
    p2: Array   # (Mo, 4)
    ier: Array  # (Mo, 4, 4)
    ien: Array  # (Mo, 4, 4)
    obj: Array  # (Mo,) int32 object index
    radius: Array  # (Mo,) local bounding radius


def build_swept_objects(scene: TriangleScene, geos: list["ObjectGeodesic"],
                        pad: float = 0.0) -> SweptObjects:
    """Sweep each object's local bounding box (8 corners) along its
    geodesic segments — the object-level analogue of
    :func:`build_swept_triangles`."""
    parts = []
    parent = np.asarray(scene.parent)
    for oi, geo in enumerate(geos):
        m = parent == oi
        if not m.any():
            continue
        verts = np.concatenate([np.asarray(scene.v0[m]),
                                np.asarray(scene.v1[m]),
                                np.asarray(scene.v2[m])])
        blo, bhi = verts.min(0), verts.max(0)
        radius = float(np.linalg.norm(np.maximum(np.abs(blo), np.abs(bhi))))
        corners = np.array([[blo[0], blo[1], blo[2]],
                            [blo[0], blo[1], bhi[2]],
                            [blo[0], bhi[1], blo[2]],
                            [blo[0], bhi[1], bhi[2]],
                            [bhi[0], blo[1], blo[2]],
                            [bhi[0], blo[1], bhi[2]],
                            [bhi[0], bhi[1], blo[2]],
                            [bhi[0], bhi[1], bhi[2]]], np.float32)
        local4 = jnp.concatenate(
            [jnp.zeros((8, 1), jnp.float32), jnp.asarray(corners)], axis=-1)
        p = geo.positions   # (K, 4)
        es = geo.tetrads    # (K, 4, 4)
        offs = jnp.einsum("ca,kam->kcm", local4, es)  # (K, 8, 4)
        world = p[:, None, :] + offs
        both = jnp.concatenate([world[:-1], world[1:]], axis=1)  # (K-1,16,4)
        lo = jnp.min(both, axis=1) - pad
        hi = jnp.max(both, axis=1) + pad
        K = p.shape[0]
        parts.append(SweptObjects(
            lo=lo, hi=hi, p1=p[:-1], p2=p[1:],
            ier=geo.inv_tetrads[:-1], ien=geo.inv_tetrads[1:],
            obj=jnp.full((K - 1,), oi, jnp.int32),
            radius=jnp.full((K - 1,), radius, jnp.float32),
        ))
    return jax.tree.map(lambda *xs: jnp.concatenate(xs), *parts)


def _object_local_ray(ga, gb, p1, p2, ie_r, ie_n, periods):
    """Object-LEVEL toblerone fixed point: like :func:`_toblerone_hit`'s
    iteration but converging on the ray's closest approach to the object's
    local origin instead of a particular triangle's plane — solved ONCE per
    (ray segment x object segment), after which the ray is STRAIGHT in the
    local frame and any number of triangles test with plain
    Moller-Trumbore.  Returns (pos, dirv, o_start, o_end)."""
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
        d2 = jnp.sum(dirv[1:] * dirv[1:])
        t_ca = -jnp.sum(pos[1:] * dirv[1:]) / jnp.maximum(d2, 1e-12)
        t_ca = jnp.clip(t_ca, 0.0, 1.0)
        ipt0 = pos[0] + dirv[0] * t_ca
        o_start = (ie @ (p1 - obj_pos))[0]
        o_end = (ie @ (p2 - obj_pos))[0]
        denom = jnp.where(jnp.abs(o_end - o_start) < 1e-12, 1.0,
                          o_end - o_start)
        nf = (ipt0 - o_start) / denom
        return (nf, pos, dirv, o_start, o_end), None

    init = (jnp.asarray(0.0, ga.dtype), jnp.zeros(4, ga.dtype),
            jnp.zeros(4, ga.dtype), jnp.asarray(0.0, ga.dtype),
            jnp.asarray(0.0, ga.dtype))
    (_, pos, dirv, o_start, o_end), _ = jax.lax.scan(body, init, None,
                                                     length=8)
    return pos, dirv, o_start, o_end


def _ray_aabb(o, d, lo, hi):
    """Slab test of the [0, 1] ray segment o + t d against AABBs.
    ``lo/hi``: (..., 3) broadcastable against o/d.  Returns (hit, tmin)."""
    safe = jnp.where(jnp.abs(d) < 1e-12, jnp.where(d < 0, -1e-12, 1e-12), d)
    inv = 1.0 / safe
    t1 = (lo - o) * inv
    t2 = (hi - o) * inv
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    # d ~ 0 on an axis: inside-the-slab check via the shared interval is
    # approximated by the huge +-t1/t2 values of the clamped inverse.
    hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin <= 1.0)
    return hit, tmin


def intersect_scene_grouped(metric: Metric, path: Array,
                            scene: TriangleScene,
                            geos: list["ObjectGeodesic"], params,
                            block: int = 256, obj_budget: int = 8,
                            chunk_budget: int | None = None,
                            patch_budget: int = 8, patch_size: int = 32,
                            pad: float = 0.0, with_stats: bool = False,
                            stage: int = 3):
    """Two-level intersector for DENSE scenes (VERDICT r3 item 4).

    The flat binned intersector drops most real hits on orbital scenes:
    every triangle of an object sweeps nearly the same spatial tube, so a
    chunk near the orbit overlaps ~all of the object's per-triangle swept
    AABBs (round-3 bench: worst chunk 57,900 entries vs budgets of 64-128)
    and the per-chunk budget is object-blind.  Here the budgeted global
    binning happens at OBJECT-segment granularity (~objects x segments
    entries — a chunk can afford them ALL), and per-triangle pruning moves
    into the object's LOCAL frame where the ray is straight and the
    triangles are static: one object-level toblerone fixed point per
    (ray x object segment), then patch-AABB slab tests over the
    :func:`build_patches` structure, then Moller-Trumbore on the
    ``patch_budget x patch_size`` surviving triangles.  The reference
    cannot prune this way — its chunk lists are object-blind
    (cl.cl:4490-4571) and sized through the problem with 800 MB buffers
    (render_state.hpp:64-91).

    ``chunk_budget``: ray blocks processed per segment (top-k by candidate
    count; None = all).  ``with_stats`` reports dropped object-segment
    candidates / dropped chunks so budget overflow is observable, plus the
    per-stage survivor counts (``sphere_pass``: (ray x candidate) pairs
    whose local ray enters the object's bounding sphere; ``patch_pass``:
    patch-AABB hits among those) that size any compaction budget.

    ``stage``: cost-decomposition knob for scripts/triangle_bench.py
    (VERDICT r4 weak #3) — 0 = binning only, 1 = + object-local solve and
    bounding-sphere test, 2 = + patch culling, 3 = full (Moller-Trumbore).
    Stages < 3 return no real hits; they exist to difference the budget.
    """
    periods = metric.periods(params)
    n_obj = len(geos)
    patches = build_patches(scene, n_obj, patch_size=patch_size)
    swept = build_swept_objects(scene, geos, pad=pad)
    Mo = swept.lo.shape[0]
    OB = min(obj_budget, Mo)
    PB = min(patch_budget, patches.lo.shape[1])

    S = path.shape[0] - 1
    n = path.shape[1]
    nb = -(-n // block)
    n_pad = nb * block
    CB = nb if chunk_budget is None else min(chunk_budget, nb)

    def pad_rays(x):
        fill = jnp.broadcast_to(x[-1:], (n_pad - n, 4))
        return jnp.concatenate([x, fill]).reshape(nb, block, 4)

    best_key = jnp.full((n_pad,), jnp.inf)
    colour = jnp.zeros((n_pad, 3))
    dropped_cand = jnp.zeros((), jnp.int32)
    dropped_chunks = jnp.zeros((), jnp.int32)
    max_overlap = jnp.zeros((), jnp.int32)
    # f32 counters: pair counts reach N*S*OB (>> int32 on large scenes).
    sphere_pass = jnp.zeros((), jnp.float32)
    patch_pass = jnp.zeros((), jnp.float32)

    for s in range(S):
        ga = pad_rays(path[s])
        gb = pad_rays(path[s + 1])
        seg = jnp.concatenate([ga, gb], axis=1)
        lo_c = jnp.min(seg, axis=1)
        hi_c = jnp.max(seg, axis=1)

        ov = _periodic_aabb_overlap(
            lo_c[:, None, :], hi_c[:, None, :],
            swept.lo[None], swept.hi[None], periods,
        )  # (NB, Mo)
        cnt = ov.sum(axis=1, dtype=jnp.int32)
        if with_stats:
            dropped_cand = dropped_cand + jnp.maximum(cnt - OB, 0).sum()
            max_overlap = jnp.maximum(max_overlap, cnt.max())

        # Chunk compaction: only blocks overlapping anything run the solve.
        _, chunk_sel = jax.lax.top_k(cnt, CB)  # (CB,)
        chunk_live = cnt[chunk_sel] > 0
        if with_stats and CB < nb:
            nz = (cnt > 0).sum()
            dropped_chunks = dropped_chunks + jnp.maximum(nz - CB, 0)

        vals, cand = jax.lax.top_k(
            ov[chunk_sel].astype(jnp.float32), OB)  # (CB, OB)
        cand_valid = (vals > 0.0) & chunk_live[:, None]

        ga_s, gb_s = ga[chunk_sel], gb[chunk_sel]  # (CB, block, 4)
        co = jax.tree.map(lambda x: x[cand], swept)  # (CB, OB, ...)

        # Per candidate j (python loop: keeps intermediates at
        # (CB*block, P/patch) scale instead of one OB-times-larger vmap).
        t_all = []
        n_all = []
        for j in range(OB if stage >= 1 else 0):
            p1j, p2j = co.p1[:, j], co.p2[:, j]          # (CB, 4)
            ierj, ienj = co.ier[:, j], co.ien[:, j]      # (CB, 4, 4)
            objj = co.obj[:, j]                          # (CB,)
            radj = co.radius[:, j]                       # (CB,)

            def per_ray(a, b, p1k, p2k, ierk, ienk, obj_id, rad):
                pos, dirv, o_start, o_end = _object_local_ray(
                    a, b, p1k, p2k, ierk, ienk, periods)
                o3, d3 = pos[1:], dirv[1:]
                # Bounding-sphere reject: closest approach of the straight
                # local ray to the object origin (the candidate survival
                # signal any pair-compaction budget is sized from).
                t_ca = -jnp.sum(o3 * d3) / jnp.maximum(
                    jnp.sum(d3 * d3), 1e-12)
                cp = o3 + jnp.clip(t_ca, 0.0, 1.0) * d3
                near = jnp.sum(cp * cp) <= rad * rad
                zero3 = jnp.zeros(3, pos.dtype)
                if stage < 2:
                    return jnp.inf, zero3, near, jnp.float32(0.0)
                # Patch culling in the static local frame.
                phit, ptmin = _ray_aabb(o3[None, :], d3[None, :],
                                        patches.lo[obj_id],
                                        patches.hi[obj_id])  # (P,)
                n_phit = jnp.sum(phit & near, dtype=jnp.float32)
                if stage < 3:
                    return jnp.inf, zero3, near, n_phit
                score = jnp.where(phit, -ptmin, -jnp.inf)
                _, pidx = jax.lax.top_k(score, PB)
                pvalid = jnp.take_along_axis(
                    phit, pidx, axis=0)  # (PB,)
                tv0 = patches.v0[obj_id][pidx].reshape(-1, 3)
                tv1 = patches.v1[obj_id][pidx].reshape(-1, 3)
                tv2 = patches.v2[obj_id][pidx].reshape(-1, 3)
                tnm = patches.normal[obj_id][pidx].reshape(-1, 3)
                tva = (patches.valid[obj_id][pidx]
                       & pvalid[:, None]).reshape(-1)
                hit, t = _moller_trumbore(o3[None, :], d3[None, :],
                                          tv0, tv1, tv2)  # (PB*ps,)
                end_t = pos[0] + dirv[0] * t
                hit = (hit & tva
                       & (end_t >= jnp.minimum(o_start, o_end))
                       & (end_t <= jnp.maximum(o_start, o_end))
                       & (t >= 0) & (t <= 1))
                t = jnp.where(hit, t, jnp.inf)
                arg = jnp.argmin(t)
                return t[arg], tnm[arg], near, n_phit

            def per_block(a_blk, b_blk, p1k, p2k, ierk, ienk, obj_id, rad,
                          ok):
                t, nm, near, nph = jax.vmap(
                    lambda a, b: per_ray(a, b, p1k, p2k, ierk, ienk,
                                         obj_id, rad))(a_blk, b_blk)
                near = near & ok
                return (jnp.where(ok, t, jnp.inf), nm,
                        jnp.sum(near, dtype=jnp.float32),
                        jnp.sum(jnp.where(near, nph, 0.0)))

            tj, nj, nearj, nphj = jax.vmap(per_block)(
                ga_s, gb_s, p1j, p2j, ierj, ienj, objj, radj,
                cand_valid[:, j])
            if with_stats:
                sphere_pass = sphere_pass + nearj.sum()
                patch_pass = patch_pass + nphj.sum()
            t_all.append(tj)     # (CB, block)
            n_all.append(nj)     # (CB, block, 3)

        if stage >= 3:
            t_stack = jnp.stack(t_all)            # (OB, CB, block)
            n_stack = jnp.stack(n_all)            # (OB, CB, block, 3)
            jbest = jnp.argmin(t_stack, axis=0)   # (CB, block)
            t_best = jnp.min(t_stack, axis=0)
            nrm = jnp.take_along_axis(
                n_stack, jbest[None, ..., None], axis=0)[0]  # (CB, blk, 3)

            flat_idx = (chunk_sel[:, None] * block
                        + jnp.arange(block)[None, :]).reshape(-1)
            t_flat = t_best.reshape(-1)
            col = jnp.abs(nrm.reshape(-1, 3))
            key = s + jnp.clip(t_flat, 0.0, 1.0)
            cur = best_key[flat_idx]
            better = jnp.isfinite(t_flat) & (key < cur)
            best_key = best_key.at[flat_idx].set(jnp.where(better, key, cur))
            curc = colour[flat_idx]
            colour = colour.at[flat_idx].set(
                jnp.where(better[:, None], col, curc))
        # Profiling stages (< 3) keep their work alive through the
        # sphere_pass/patch_pass counters — run them with_stats=True.

    if with_stats:
        return jnp.isfinite(best_key[:n]), colour[:n], {
            "dropped": dropped_cand, "dropped_chunks": dropped_chunks,
            "max_overlap": max_overlap, "sphere_pass": sphere_pass,
            "patch_pass": patch_pass}
    return jnp.isfinite(best_key[:n]), colour[:n]


def intersect_scene_compact(metric: Metric, path: Array,
                            scene: TriangleScene,
                            geos: list["ObjectGeodesic"], params,
                            block: int = 256, obj_budget: int = 8,
                            pair_budget: int = 1 << 17,
                            tri_budget: int = 1 << 18,
                            patch_size: int = 128,
                            patch_slots: int = 8,
                            pad: float = 0.0, with_stats: bool = False,
                            stage: int = 4):
    """Worklist-compacted two-level intersector (VERDICT r4 weak #3 /
    next #5): the grouped intersector's cost is exact but DENSE — every
    (ray x object-segment candidate) pair pays the patch cull and the
    ``patch_budget x patch_size`` Moller-Trumbore gathers whether or not
    the ray comes anywhere near the object (measured: ~2.5 sphere-passing
    pairs per real hit, i.e. >99% of the dense work is provably dead
    after a ~1k-flop test).  TPU shape: three fixed-budget phases with
    ``jnp.nonzero(size=...)`` compaction between them — the static-shape
    equivalent of the reference's atomic worklists (cl.cl:4481,4544).

    A. dense binning + object-local fixed point + bounding-sphere test
       for every pair -> bitmask (pure VPU elementwise, no gathers);
    B. surviving pairs (<= ``pair_budget``) re-solve and run the patch
       slab tests -> (pair x patch) bitmask;
    C. surviving (pair, patch) items (<= ``tri_budget``) gather ONE
       patch's triangles each and run Moller-Trumbore; hits resolve to
       per-ray nearest via a deterministic two-pass scatter-min
       (key, then item index on key ties).

    Exact whenever the budgets cover the survivor counts — ``with_stats``
    reports ``sphere_pass``/``patch_pass`` and the dropped counts so an
    overflow is observable, exactly like the binned path's budget.

    ``patch_size`` sweep on the 12-cube chip bench (full frame, zero
    drops, identical hits): 16 -> 0.083, 32 -> 0.131, 64 -> 0.171,
    **128 -> 0.204 Mrays/s** (wider contiguous triangle gathers amortise
    the per-item worklist cost; 256 OOMs the 1M-item phase-C buffers);
    the two-level pair nonzero (phase B comment) lifts it to **0.341**,
    the per-pair ``patch_slots`` extraction (phase C comment) to
    **0.457**, and the component-first MT to **0.467** (1.11 s/frame,
    ~150x over the dense grouped path) — all same-session chip A/Bs at
    identical hits.
    """
    periods = metric.periods(params)
    n_obj = len(geos)
    patches = build_patches(scene, n_obj, patch_size=patch_size)
    swept = build_swept_objects(scene, geos, pad=pad)
    Mo = swept.lo.shape[0]
    OB = min(obj_budget, Mo)
    P = patches.lo.shape[1]

    S = path.shape[0] - 1
    n = path.shape[1]
    nb = -(-n // block)
    n_pad = nb * block
    path_p = jnp.concatenate(
        [path, jnp.broadcast_to(path[:, -1:], (S + 1, n_pad - n, 4))],
        axis=1)

    # --- Phase A: dense bin + solve + sphere test ----------------------
    near_s = []
    cand_s = []
    for s in range(S):
        ga = path_p[s].reshape(nb, block, 4)
        gb = path_p[s + 1].reshape(nb, block, 4)
        seg = jnp.concatenate([ga, gb], axis=1)
        lo_c = jnp.min(seg, axis=1)
        hi_c = jnp.max(seg, axis=1)
        ov = _periodic_aabb_overlap(
            lo_c[:, None, :], hi_c[:, None, :],
            swept.lo[None], swept.hi[None], periods)  # (nb, Mo)
        vals, cand = jax.lax.top_k(ov.astype(jnp.float32), OB)  # (nb, OB)
        cvalid = vals > 0.0
        co = jax.tree.map(lambda x: x[cand], swept)  # (nb, OB, ...)

        def sphere(a, b, p1k, p2k, ierk, ienk, rad):
            pos, dirv, o_start, o_end = _object_local_ray(
                a, b, p1k, p2k, ierk, ienk, periods)
            o3, d3 = pos[1:], dirv[1:]
            t_ca = -jnp.sum(o3 * d3) / jnp.maximum(jnp.sum(d3 * d3), 1e-12)
            cp = o3 + jnp.clip(t_ca, 0.0, 1.0) * d3
            return jnp.sum(cp * cp) <= rad * rad

        near = jax.vmap(  # over chunks
            jax.vmap(      # over candidates
                jax.vmap(sphere, in_axes=(0, 0, None, None, None, None,
                                          None)),  # over rays
                in_axes=(None, None, 0, 0, 0, 0, 0)),
            in_axes=(0, 0, 0, 0, 0, 0, 0),
        )(ga, gb, co.p1, co.p2, co.ier, co.ien, co.radius)  # (nb, OB, blk)
        near = near & cvalid[:, :, None]
        near_s.append(near)
        cand_s.append(cand.astype(jnp.int32))
    near_all = jnp.stack(near_s)          # (S, nb, OB, block) bool
    cand_all = jnp.stack(cand_s)          # (S, nb, OB) int32

    sphere_pass = jnp.sum(near_all, dtype=jnp.float32)

    # ``stage`` (bench-only cost decomposition, default full): 0 = dense
    # phase A, 1 = + pair compaction/gathers/re-solve, 2 = + patch slab
    # tests, 3 = + slot extraction/item nonzero/triangle gathers, 4 = full
    # (Moller-Trumbore + scatter-min).  Early outs return empty hits with
    # whatever counters exist so the bench harness shape-checks.
    def _cut(*counters):
        z = jnp.zeros((), jnp.float32)
        names = ["sphere_pass", "patch_pass", "pairs_dropped",
                 "items_dropped", "dropped"]
        stats = {k: v for k, v in zip(names, list(counters))}
        for k in names:
            stats.setdefault(k, z)
        stats["max_overlap"] = jnp.zeros((), jnp.int32)
        out = (jnp.zeros((n,), bool), jnp.zeros((n, 3), jnp.float32))
        return out + (stats,) if with_stats else out

    if stage <= 0:
        return _cut(sphere_pass)

    # --- Phase B: pair compaction + patch culling ----------------------
    # Two-level nonzero: a flat nonzero over all S*nb*OB*block pair bits
    # (132 M on the flagship scene) costs ~1 s of cumsum/scan traffic —
    # 4x the dense solve it postprocesses.  Sphere survivors cluster by
    # (segment, chunk, candidate) block, so compact non-empty BLOCKS
    # first (S*nb*OB bits), gather only their ray rows, and run the pair
    # nonzero over block_budget*block bits (~8x smaller).
    Wp = pair_budget
    n_blocks = S * nb * OB
    blk_any = near_all.reshape(n_blocks, block).any(axis=1)
    WB = min(max(Wp // 8, 1024), n_blocks)
    n_nonempty = jnp.sum(blk_any, dtype=jnp.int32)
    (bidx,) = jnp.nonzero(blk_any, size=WB, fill_value=0)
    rows_b = near_all.reshape(n_blocks, block)[bidx]       # (WB, block)
    # Slots past the true non-empty count are fill duplicates of block 0
    # — zero their bits so they cannot inject duplicate pairs.
    rows_b = rows_b & (jnp.arange(WB) < n_nonempty)[:, None]
    kept_pairs = jnp.sum(rows_b, dtype=jnp.float32)
    (p2,) = jnp.nonzero(rows_b.reshape(-1), size=Wp, fill_value=0)
    pidx = bidx[(p2 // block).astype(jnp.int32)] * block \
        + (p2 % block).astype(jnp.int32)
    pvalid = rows_b.reshape(-1)[p2]
    # Decode (s, chunk, j, ray-in-block) from the flat index.
    per_s = nb * OB * block
    s_of = (pidx // per_s).astype(jnp.int32)
    rem = pidx % per_s
    cb_of = (rem // (OB * block)).astype(jnp.int32)
    rem = rem % (OB * block)
    j_of = (rem // block).astype(jnp.int32)
    ray_of = cb_of * block + (rem % block).astype(jnp.int32)  # global ray

    path_flat = path_p.reshape((S + 1) * n_pad, 4)
    ga_p = path_flat[s_of * n_pad + ray_of]
    gb_p = path_flat[(s_of + 1) * n_pad + ray_of]
    entry = cand_all[s_of, cb_of, j_of]                # (Wp,)
    ep = jax.tree.map(lambda x: x[entry], swept)

    def solve_pair(a, b, p1k, p2k, ierk, ienk):
        pos, dirv, o_start, o_end = _object_local_ray(
            a, b, p1k, p2k, ierk, ienk, periods)
        return pos, dirv, o_start, o_end

    pos_p, dir_p, ostart_p, oend_p = jax.vmap(solve_pair)(
        ga_p, gb_p, ep.p1, ep.p2, ep.ier, ep.ien)      # (Wp, 4) ...
    obj_p = ep.obj                                      # (Wp,)
    if stage <= 1:
        return _cut(sphere_pass, jnp.zeros((), jnp.float32),
                    sphere_pass - jnp.minimum(kept_pairs, float(Wp))
                    + 0.0 * pos_p.sum())
    # (An object-unrolled variant testing every object's patch constants
    # and selecting by obj_p — zero (Wp, P, 3) gathers — measured
    # NEUTRAL on the chip (0.344 vs 0.341 Mrays/s): repeated gathers
    # from the tiny per-object tables are not this phase's cost.)
    phit, _ = _ray_aabb(pos_p[:, None, 1:], dir_p[:, None, 1:],
                        patches.lo[obj_p], patches.hi[obj_p])  # (Wp, P)
    phit = phit & pvalid[:, None]
    patch_pass = jnp.sum(phit, dtype=jnp.float32)
    if stage <= 2:
        return _cut(sphere_pass, patch_pass)

    # --- Phase C: (pair, patch) compaction + Moller-Trumbore -----------
    Wt = tri_budget
    if patch_slots:
        # Per-pair slot extraction (round 5): the flat nonzero over the
        # (Wp x P) bitmask (49 M bits on the flagship scene) costs ~0.37 s
        # of cumsum/scatter traffic while survivors average ~2 patches per
        # pair.  Extract the first ``patch_slots`` set bits per pair with
        # along-patch rank compares + argmax (pure VPU reductions over the
        # bitmask it already holds), then run the item nonzero over the
        # 12x smaller (Wp x K) slot-validity bits.  Valid items keep the
        # pair-major / patch-ascending enumeration order of the flat
        # nonzero, so hits (and scatter-min tie resolution) stay
        # bit-identical whenever no pair overflows its K slots — the
        # overflow is counted into ``items_dropped`` like every other
        # budget.
        K = min(patch_slots, P)
        rank = jnp.cumsum(phit.astype(jnp.int32), axis=1) - 1   # (Wp, P)
        slot_pa_l, slot_v_l = [], []
        for k in range(K):
            mk = phit & (rank == k)
            slot_pa_l.append(jnp.argmax(mk, axis=1).astype(jnp.int32))
            slot_v_l.append(mk.any(axis=1))
        slot_pa = jnp.stack(slot_pa_l, axis=1)                  # (Wp, K)
        slot_v = jnp.stack(slot_v_l, axis=1)                    # (Wp, K)
        kept_items = jnp.sum(slot_v, dtype=jnp.float32)
        (tidx,) = jnp.nonzero(slot_v.reshape(-1), size=Wt, fill_value=0)
        tvalid = slot_v.reshape(-1)[tidx]
        pr_of = (tidx // K).astype(jnp.int32)
        pa_of = slot_pa[pr_of, (tidx % K).astype(jnp.int32)]
    else:
        pp_flat = phit.reshape(-1)
        (tidx,) = jnp.nonzero(pp_flat, size=Wt, fill_value=0)
        tvalid = pp_flat[tidx]
        pr_of = (tidx // P).astype(jnp.int32)
        pa_of = (tidx % P).astype(jnp.int32)
        kept_items = patch_pass

    o3 = pos_p[pr_of, 1:]
    d3 = dir_p[pr_of, 1:]
    t0_ = pos_p[pr_of, 0]
    td_ = dir_p[pr_of, 0]
    osrt = ostart_p[pr_of]
    oend = oend_p[pr_of]
    objt = obj_p[pr_of]
    # Transpose the (tiny, per-scene) patch tables to (O, P, 3, ps) BEFORE
    # the item gather, so the Wt-stream arrays keep the triangle axis
    # minor — the (Wt, ps, 3) form ran MT at 3/128 lane occupancy.
    v0t = jnp.swapaxes(patches.v0, -1, -2)
    v1t = jnp.swapaxes(patches.v1, -1, -2)
    v2t = jnp.swapaxes(patches.v2, -1, -2)
    nmt = jnp.swapaxes(patches.normal, -1, -2)
    tv0 = v0t[objt, pa_of]               # (Wt, 3, ps)
    tv1 = v1t[objt, pa_of]
    tv2 = v2t[objt, pa_of]
    tnm = nmt[objt, pa_of]
    tva = patches.valid[objt, pa_of]     # (Wt, ps)
    if stage <= 3:
        return _cut(sphere_pass, patch_pass, jnp.zeros((), jnp.float32),
                    0.0 * (tv0.sum() + tv1.sum() + tv2.sum() + tnm.sum()
                           + tva.sum() + tvalid.sum()))

    hit, t = _moller_trumbore_cf(
        tuple(o3[:, i:i + 1] for i in range(3)),
        tuple(d3[:, i:i + 1] for i in range(3)),
        tuple(tv0[:, i] for i in range(3)),
        tuple(tv1[:, i] for i in range(3)),
        tuple(tv2[:, i] for i in range(3)))            # (Wt, ps)
    end_t = t0_[:, None] + td_[:, None] * t
    lo_w = jnp.minimum(osrt, oend)[:, None]
    hi_w = jnp.maximum(osrt, oend)[:, None]
    hit = (hit & tva & tvalid[:, None]
           & (end_t >= lo_w) & (end_t <= hi_w)
           & (t >= 0) & (t <= 1))
    t = jnp.where(hit, t, jnp.inf)
    arg = jnp.argmin(t, axis=1)                        # (Wt,)
    iota_w = jnp.arange(Wt)
    t_item = t[iota_w, arg]
    nrm_item = tnm[iota_w, :, arg]                     # (Wt, 3)

    key_item = jnp.where(jnp.isfinite(t_item),
                         s_of[pr_of].astype(jnp.float32)
                         + jnp.clip(t_item, 0.0, 1.0), jnp.inf)
    ray_item = ray_of[pr_of]

    best_key = jnp.full((n_pad,), jnp.inf).at[ray_item].min(key_item)
    BIG = jnp.int32(np.iinfo(np.int32).max)
    tie = jnp.where(jnp.isfinite(key_item)
                    & (key_item <= best_key[ray_item]),
                    jnp.arange(Wt, dtype=jnp.int32), BIG)
    winner = jnp.full((n_pad,), BIG, jnp.int32).at[ray_item].min(tie)
    has = winner < BIG
    colour = jnp.where(has[:, None],
                       jnp.abs(nrm_item[jnp.clip(winner, 0, Wt - 1)]), 0.0)

    if with_stats:
        # Budget overflow counts (fill indices may duplicate entry 0, so
        # count against the budgets, not the valid mask).  kept_pairs
        # accounts for the block-level budget WB too: pairs in dropped
        # blocks never reach the pair nonzero.
        pairs_dropped = sphere_pass - jnp.minimum(kept_pairs, float(Wp))
        # Item drops: pair-slot overflow (patch_slots) plus tri_budget
        # overflow — both phases that can lose a surviving (pair, patch).
        tris_dropped = patch_pass - jnp.minimum(kept_items, float(Wt))
        return jnp.isfinite(best_key[:n]), colour[:n], {
            "sphere_pass": sphere_pass, "patch_pass": patch_pass,
            "pairs_dropped": pairs_dropped, "items_dropped": tris_dropped,
            "dropped": pairs_dropped + tris_dropped,
            "max_overlap": jnp.zeros((), jnp.int32)}
    return jnp.isfinite(best_key[:n]), colour[:n]


def render_triangles(metric: Metric, state: RayState, params,
                     scene: TriangleScene, geos: list[ObjectGeodesic],
                     features: Features | None = None,
                     opts: TraceOptions = TraceOptions(),
                     n_slots: int = 64, steps_per_slot: int = 8,
                     binned: bool = False, block: int = 256,
                     budget: int = 64, grouped: bool = False,
                     compact: bool = False):
    """Trace rays with path recording, then intersect the scene.

    ``binned`` switches to the AABB-binned intersector (the reference's
    chunked path); ``grouped`` to the two-level object/patch intersector
    (dense orbital scenes — see :func:`intersect_scene_grouped`).  Returns
    ``(final RayState, hit (N,), colour (N, 3))``.

    Slot granularity matters: the toblerone solve interpolates the ray
    linearly within a recorded segment, so a segment must not span a
    large swing of the metric.  With the adaptive step controller, 64
    steps cross the entire camera->horizon approach in ONE slot at the
    old (16, 64) defaults — every near-field object was missed (zero
    hits).  (64, 8) keeps segments short where the field is strong while
    still recording 512 integration steps (the reference records every
    few steps and subsamples by proper distance, cl.cl:4181-4232,
    3762-3834).
    """
    if features is None:
        features = Features.for_metric(metric)
    final, path = integrate.trace_rays_recorded(
        metric, state, params, features=features, opts=opts,
        n_slots=n_slots, steps_per_slot=steps_per_slot,
    )
    if compact:
        hit, colour = intersect_scene_compact(metric, path, scene, geos,
                                              params, block=block,
                                              obj_budget=budget)
    elif grouped:
        hit, colour = intersect_scene_grouped(metric, path, scene, geos,
                                              params, block=block,
                                              obj_budget=budget)
    elif binned:
        hit, colour = intersect_scene_binned(metric, path, scene, geos,
                                             params, block=block,
                                             budget=budget)
    else:
        hit, colour = intersect_scene(metric, path, scene, geos, params)
    return final, hit, colour
