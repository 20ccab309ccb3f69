"""End-to-end render pipeline: camera -> rays -> geodesics -> image.

Mirrors the reference frame loop's kernel dispatch sequence
(main.cpp:2240-2525): ``cart_to_generic`` -> ``init_basis_vectors`` ->
``init_rays_generic`` -> ``do_generic_rays`` -> ``calculate_render_data`` ->
``render``, re-expressed as jitted stages over whole-image ray batches.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import camera as cam
from ..coordinates import transforms as tr
from ..metrics.base import Metric
from ..ops import geometry, integrate, tetrad
from ..ops.integrate import Features, RayState, TraceOptions
from . import background as bg
from . import colour

Array = jax.Array


class RenderData(NamedTuple):
    """Per-pixel shading inputs (reference ``struct render_data``
    cl.cl:5066-5074)."""

    tex_coord: Array  # (N, 2) in [0,1]^2
    z_shift: Array  # (N,)
    side: Array  # (N,) int32: 1 = r>=0 universe, 0 = far side
    terminated: Array  # (N,) int32 status


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Static render settings (graphics_settings.hpp:8-47 subset)."""

    width: int = 1920
    height: int = 1080
    fov_degrees: float = 90.0
    anisotropy: int = 16
    redshift: bool = False
    flip_geodesic_direction: bool = False
    trace: TraceOptions = TraceOptions()


# ---------------------------------------------------------------------------
# Ray initialisation
# ---------------------------------------------------------------------------

def camera_to_generic(metric: Metric, camera: cam.Camera, params) -> Array:
    """Polar camera position -> metric generic coordinates
    (``cart_to_generic_kernel`` cl.cl:6018 via from_polar)."""
    return metric.from_polar(camera.polar_position, params)


def init_camera_rays(metric: Metric, camera: cam.Camera, params,
                     settings: RenderSettings,
                     features: Features = Features()):
    """Build the per-pixel null ray batch (``init_rays_generic``
    cl.cl:3143-3251 + ``geodesic_to_render_ray`` cl.cl:3000-3065).

    Returns ``(state, ku_uobsu)`` with arrays flattened to N = W*H.
    """
    W, H = settings.width, settings.height
    position = camera_to_generic(metric, camera, params)
    es = cam.observer_tetrad(
        metric, position, params, basis_speed3=camera.basis_speed, orient=True
    )

    dirs = cam.pixel_directions(W, H, camera.quat, settings.fov_degrees)
    dirs = dirs.reshape(-1, 3)

    sign = -1.0  # backwards-in-affine-time tracing (cl.cl:3196-3206)
    if metric.config.follow_geodesics_forward:
        sign = 1.0
    if settings.flip_geodesic_direction:
        sign = -sign

    velocity = (
        dirs[:, 0:1] * es[1][None, :]
        + dirs[:, 1:2] * es[2][None, :]
        + dirs[:, 2:3] * es[3][None, :]
        + sign * es[0][None, :]
    )
    n = velocity.shape[0]
    positions = jnp.broadcast_to(position, (n, 4))

    state = integrate.init_ray_state(
        metric, positions, velocity, params, features, fix_null_velocity=True
    )

    # ku_uobsu: observer-frame energy at emission (cl.cl:3047-3060).
    gab = metric.fn(position, params)
    uobs_low = gab @ es[0]
    ku_uobsu = state.velocity @ uobs_low
    return state, ku_uobsu


# ---------------------------------------------------------------------------
# Render data (texture coords + redshift factor)
# ---------------------------------------------------------------------------

def angle_to_tex(angles: Array) -> Array:
    """(theta, phi) -> equirect uv (cl.cl:5081-5101)."""
    theta = jnp.mod(angles[..., 0], 2 * jnp.pi)
    phi = angles[..., 1]
    over = theta >= jnp.pi
    phi = jnp.where(over, phi + jnp.pi, phi)
    theta = jnp.where(over, theta - jnp.pi, theta)
    phi = jnp.mod(phi, 2 * jnp.pi)
    sx = phi / (2 * jnp.pi) + 0.5
    sy = theta / jnp.pi
    return jnp.stack([sx, sy], axis=-1)


def _fix_ray_position(polar_pos3, polar_vel3, sphere_radius):
    """Snap a terminated ray onto the termination sphere along its straight
    cartesian velocity (``fix_ray_position`` cl.cl:239-263)."""
    position_sign = jnp.sign(polar_pos3[0])
    position_sign = jnp.where(position_sign == 0, 1.0, position_sign)
    cpolar = polar_pos3.at[0].set(jnp.abs(polar_pos3[0]))
    cvel = polar_vel3.at[0].multiply(position_sign)

    cart_vel = tr.spherical_velocity_to_cartesian_velocity(cpolar, cvel)
    cart_pos = tr.polar_to_cartesian3(cpolar)

    # line-sphere intersection, nearest |t| root (cl.cl:211-237)
    v = cart_vel / jnp.linalg.norm(cart_vel)
    b = 2.0 * (v @ cart_pos)
    c = cart_pos @ cart_pos - sphere_radius * sphere_radius
    disc = b * b - 4.0 * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-b - sq) / 2.0
    t1 = (-b + sq) / 2.0
    t = jnp.where(jnp.abs(t0) < jnp.abs(t1), t0, t1)
    new_cart = jnp.where(disc < 0, cart_pos, cart_pos + t * v)

    new_polar = tr.cartesian_to_polar3(new_cart)
    return new_polar.at[0].multiply(position_sign)


def compute_render_data(metric: Metric, state: RayState, ku_uobsu: Array,
                        params, features: Features = Features()) -> RenderData:
    """``calculate_render_data`` (cl.cl:5135-5220): terminated rays are
    snapped to the universe sphere, textured by final (theta, phi), with the
    observed/emitted energy ratio z_shift."""
    cfg = metric.config

    def one(pos, vel, rdl, ku, status):
        polar = metric.to_polar(pos, params)
        polar_vel = metric.to_polar_velocity(pos, vel, params)

        # Snap: escaped rays to the universe sphere; singular-terminated rays
        # to the terminator sphere (get_intersection_position cl.cl:5024-5050).
        snapped_far = _fix_ray_position(polar[1:], polar_vel[1:],
                                        features.universe_size)
        if cfg.singular:
            snapped_near = _fix_ray_position(polar[1:], polar_vel[1:],
                                             cfg.singular_terminator)
            is_far = jnp.abs(polar[1]) >= 0.5 * (
                features.universe_size + cfg.singular_terminator
            )
            snapped = jnp.where(is_far, snapped_far, snapped_near)
        else:
            snapped = snapped_far

        side = jnp.where(polar[1] < 0, 0, 1).astype(jnp.int32)

        # Fresh (unoriented, unboosted) tetrad at the endpoint for the
        # observed frequency (cl.cl:5185-5208).
        gab = metric.fn(pos, params)
        es, _ = tetrad.frame_basis(gab)
        obs_low = gab @ es[0]
        gen_vel = vel / rdl
        z_shift = (gen_vel @ obs_low) / ku - 1.0
        z_shift = jnp.maximum(z_shift, -0.999)

        tex = angle_to_tex(snapped[1:])

        status_out = status
        if not cfg.traversable_event_horizon:
            # Non-traversable metrics: endpoints inside |r| <= 1 shade black
            # (cl.cl:5177-5183).
            status_out = jnp.where(
                (status == integrate.ESCAPED) & (jnp.abs(snapped[0]) <= 1.0),
                integrate.DEAD,
                status,
            )
        return tex, z_shift, side, status_out

    tex, z, side, status = jax.vmap(one)(
        state.position, state.velocity, state.running_dlambda_dnew,
        ku_uobsu, state.status,
    )
    return RenderData(tex_coord=tex, z_shift=z, side=side, terminated=status)


# ---------------------------------------------------------------------------
# Shading
# ---------------------------------------------------------------------------

def shade(rdata: RenderData, backgrounds: bg.Background,
          settings: RenderSettings) -> Array:
    """``render`` kernel (cl.cl:5453-5846): anisotropic background sampling +
    relativistic redshift.  Returns (H, W, 3) linear-light RGB in [0, 1]."""
    W, H = settings.width, settings.height
    tex = rdata.tex_coord.reshape(H, W, 2)
    side = rdata.side.reshape(H, W)
    z_shift = rdata.z_shift.reshape(H, W)
    terminated = rdata.terminated.reshape(H, W)

    rgb = bg.sample_anisotropic(
        backgrounds, tex, side, max_probes=settings.anisotropy
    )

    if settings.redshift:
        rgb = colour.apply_redshift(rgb, z_shift)

    # terminated != 1 paints black (cl.cl:5470-5474).
    mask = (terminated == integrate.ESCAPED)[..., None]
    return jnp.where(mask, rgb, 0.0)


# ---------------------------------------------------------------------------
# Whole-frame entry point
# ---------------------------------------------------------------------------

def render_frame(metric: Metric, camera: cam.Camera, params,
                 backgrounds: bg.Background, settings: RenderSettings,
                 features: Features | None = None) -> Array:
    """Trace and shade a full frame.  Returns (H, W, 3) linear RGB."""
    if features is None:
        features = Features.for_metric(metric)
    return _render_frame_jit(metric, camera, params, backgrounds, settings,
                             features)


@functools.partial(
    jax.jit, static_argnames=("metric", "settings")
)
def _render_frame_jit(metric: Metric, camera: cam.Camera, params,
                      backgrounds: bg.Background, settings: RenderSettings,
                      features: Features) -> Array:
    state, ku = init_camera_rays(metric, camera, params, settings, features)
    final = integrate.trace_rays(
        metric, state, params, features=features, opts=settings.trace
    )
    rdata = compute_render_data(metric, final, ku, params, features)
    return shade(rdata, backgrounds, settings)


def trace_frame(metric: Metric, camera: cam.Camera, params,
                settings: RenderSettings,
                features: Features | None = None):
    """Trace only (no shading) — returns (final RayState, ku_uobsu)."""
    if features is None:
        features = Features.for_metric(metric)
    return _trace_frame_jit(metric, camera, params, settings, features)


@functools.partial(jax.jit, static_argnames=("metric", "settings"))
def _trace_frame_jit(metric: Metric, camera: cam.Camera, params,
                     settings: RenderSettings, features: Features):
    state, ku = init_camera_rays(metric, camera, params, settings, features)
    final = integrate.trace_rays(
        metric, state, params, features=features, opts=settings.trace
    )
    return final, ku
