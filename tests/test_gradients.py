"""Differentiability: pixel/endpoint gradients w.r.t. metric parameters
through the integrator, validated against finite differences
(BASELINE.json north star; SURVEY §7.7)."""

import jax
import jax.numpy as jnp
import numpy as np

from geodesic_raytracing_tpu import metrics
from geodesic_raytracing_tpu.ops.integrate import (
    ESCAPED,
    Features,
    TraceOptions,
    init_ray_state,
    trace_rays,
)

OPTS = TraceOptions(max_steps=256, method="scan", remat_every=32)


def endpoint_loss(metric, params, pos, vel, feats):
    st = init_ray_state(metric, pos, vel, params, feats)
    fin = trace_rays(metric, st, params, features=feats, opts=OPTS)
    # Smooth observable: mean final phi weighted by escape mask (the mask
    # itself is non-differentiable, but fixed at the evaluation point).
    esc = (fin.status == ESCAPED).astype(jnp.float32)
    return jnp.sum(fin.position[:, 3] * esc) / jnp.maximum(jnp.sum(esc), 1.0)


def test_grad_wrt_mass_matches_fd():
    m = metrics.get_metric("schwarzschild")
    feats = Features.for_metric(m)
    n = 8
    ang = np.linspace(0.5, 0.9, n)
    pos = jnp.asarray(
        np.tile([0.0, 7.0, np.pi / 2, 0.0], (n, 1)).astype(np.float32)
    )
    vel = jnp.asarray(
        np.stack(
            [np.ones(n), -np.cos(ang), np.zeros(n), np.sin(ang) / 7.0], -1
        ).astype(np.float32)
    )

    def loss(rs):
        return endpoint_loss(m, {"rs": rs}, pos, vel, feats)

    g = jax.grad(loss)(jnp.float32(1.0))
    eps = 1e-3
    fd = (loss(jnp.float32(1.0 + eps)) - loss(jnp.float32(1.0 - eps))) / (
        2 * eps
    )
    assert np.isfinite(float(g))
    # Deflection increases with mass; gradient must be significant and match
    # the finite difference within fp32 integration noise.
    np.testing.assert_allclose(float(g), float(fd), rtol=0.15)
    assert abs(float(g)) > 1e-3


def test_grad_wrt_kerr_spin_finite():
    m = metrics.get_metric("kerr_boyer")
    feats = Features.for_metric(m)
    n = 4
    ang = np.linspace(0.55, 0.8, n)
    pos = jnp.asarray(
        np.tile([0.0, 7.0, np.pi / 2, 0.0], (n, 1)).astype(np.float32)
    )
    vel = jnp.asarray(
        np.stack(
            [np.ones(n), -np.cos(ang), np.zeros(n), np.sin(ang) / 7.0], -1
        ).astype(np.float32)
    )

    def loss(a):
        return endpoint_loss(m, {"rs": jnp.float32(1.0), "a": a}, pos, vel,
                             feats)

    g = jax.grad(loss)(jnp.float32(-0.5))
    eps = 2e-3
    fd = (loss(jnp.float32(-0.5 + eps)) - loss(jnp.float32(-0.5 - eps))) / (
        2 * eps
    )
    assert np.isfinite(float(g))
    np.testing.assert_allclose(float(g), float(fd), rtol=0.2, atol=5e-3)


def test_grad_wrt_camera_pose():
    """North-star: pixel observables differentiate w.r.t. camera pose too.
    Gradient of the mean escape angle w.r.t. the camera radius vs FD."""
    import dataclasses

    from geodesic_raytracing_tpu.camera import Camera
    from geodesic_raytracing_tpu.render import pipeline as pl

    m = metrics.get_metric("schwarzschild")
    feats = Features.for_metric(m)
    settings = pl.RenderSettings(
        width=8, height=8, planar=False,
        trace=TraceOptions(max_steps=192, method="scan", remat_every=32),
    )
    params = m.params()

    def loss(cam_r):
        cam = Camera.default().rotate(pitch=-np.pi / 2)
        cam = cam._replace(
            polar_position=cam.polar_position.at[1].set(cam_r)
        )
        st, ku, _ = pl.init_camera_rays(m, cam, params, settings, feats)
        fin = trace_rays(m, st, params, features=feats, opts=settings.trace)
        esc = (fin.status == ESCAPED).astype(jnp.float32)
        return jnp.sum(fin.position[:, 3] * esc) / jnp.maximum(
            jnp.sum(esc), 1.0
        )

    g = jax.grad(loss)(jnp.float32(7.0))
    eps = 1e-2
    fd = (loss(jnp.float32(7.0 + eps)) - loss(jnp.float32(7.0 - eps))) / (
        2 * eps
    )
    assert np.isfinite(float(g))
    np.testing.assert_allclose(float(g), float(fd), rtol=0.15, atol=1e-4)
