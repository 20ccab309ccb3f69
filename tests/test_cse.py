"""ops.cse: trace-level CSE of the Pallas kernel step (the $pin analogue).

The transform must be BIT-EXACT (it only reuses values that identical
equations would have recomputed) and must actually shrink the step jaxpr
— the Mosaic kernel consumes the jaxpr directly, so duplicate equations
from the JVP partial sweeps are duplicate VPU work in-kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geodesic_raytracing_tpu import metrics
from geodesic_raytracing_tpu.ops import integrate
from geodesic_raytracing_tpu.ops.cse import cse


def _count_ops(fn, *args):
    closed = jax.make_jaxpr(fn)(*args)
    total = 0

    def walk(jx):
        nonlocal total
        for eq in jx.eqns:
            total += 1
            for v in eq.params.values():
                if hasattr(v, "jaxpr"):
                    walk(v.jaxpr)
    walk(closed.jaxpr)
    return total


def _batch(seed=0, n=64):
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(np.array([0.0, 6.0, 1.2, 0.3])[:, None]
                      + 0.1 * rng.standard_normal((4, n)), jnp.float32)
    vel = jnp.asarray(np.array([1.0, -0.5, 0.01, 0.02])[:, None]
                      + 0.01 * rng.standard_normal((4, n)), jnp.float32)
    return pos, vel


@pytest.mark.parametrize("name", ["kerr_boyer", "double_kerr",
                                  "kerr_schild", "alcubierre"])
def test_cse_acceleration_bit_exact_and_smaller(name):
    m = metrics.get_metric(name)
    params = m.params()
    pos, vel = _batch()

    def f(p, v):
        return integrate.metric_acceleration(m, p, v, params)

    a0 = np.asarray(f(pos, vel))
    a1 = np.asarray(cse(f)(pos, vel))
    np.testing.assert_array_equal(a0, a1)
    n0, n1 = _count_ops(f, pos, vel), _count_ops(cse(f), pos, vel)
    assert n1 < n0, (n0, n1)


def test_cse_full_step_bit_exact():
    """The exact function the Pallas kernel wraps: a full integrator step
    (schedule + termination + verlet + error controller)."""
    m = metrics.get_metric("kerr_boyer")
    params = m.params()
    feats = integrate.Features.for_metric(m)
    opts = integrate.TraceOptions(max_steps=64)
    pos, vel = _batch(1)
    n = pos.shape[1]
    st = integrate.init_ray_state(m, pos.T, vel.T, params, feats)
    stT = integrate._transpose_in(st)
    f_in_x = jnp.abs(vel[0])
    step = integrate.make_step_fn(m, feats, opts, f_in_x)

    out0 = step(stT, params)
    out1 = cse(step)(stT, params)
    for a, b, fname in zip(out0, out1, out0._fields):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=fname)


def test_pallas_step_cse_bit_equal():
    """The Pallas kernel (interpret mode) with step_cse on vs off must be
    BIT-identical — CSE only reuses values identical equations recompute.
    (test_integrator's interpret-vs-XLA tests cover cse-on vs the while
    driver; this pins the flag itself against default flips.)"""
    import dataclasses

    from geodesic_raytracing_tpu.ops.integrate import (
        Features, TraceOptions, init_ray_state)
    from geodesic_raytracing_tpu.ops.pallas.raymarch import trace_rays_pallas

    m = metrics.get_metric("kerr_boyer")
    params = m.params()
    n = 32
    rng = np.random.default_rng(3)
    ang = np.linspace(0.05, 0.8, n)
    pos = jnp.asarray(np.tile([0.0, 7.0, np.pi / 2, 0.0],
                              (n, 1)).astype(np.float32))
    vel = jnp.asarray(np.stack(
        [np.ones(n), -np.cos(ang), np.zeros(n), np.sin(ang) / 7.0],
        -1).astype(np.float32))
    feats = Features.for_metric(m)
    st = init_ray_state(m, pos, vel, params, feats)
    opts = TraceOptions(max_steps=1024, step_cse=True)
    a = trace_rays_pallas(m, st, params, features=feats, opts=opts,
                          tile=16, interpret=True)
    b = trace_rays_pallas(m, st, params, features=feats,
                          opts=dataclasses.replace(opts, step_cse=False),
                          tile=16, interpret=True)
    for fa, fb, fname in zip(a, b, a._fields):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb),
                                      err_msg=fname)


def test_cse_under_jit_and_loop():
    """cse must trace cleanly inside jit + fori_loop (the kernel shape)."""
    m = metrics.get_metric("schwarzschild")
    params = m.params()
    pos, vel = _batch(2, n=16)

    def f(p, v):
        return integrate.metric_acceleration(m, p, v, params)

    fc = cse(f)

    @jax.jit
    def loop(p, v):
        def body(_, c):
            return c + fc(p, v)
        return jax.lax.fori_loop(0, 3, body, jnp.zeros_like(p))

    @jax.jit
    def loop0(p, v):
        def body(_, c):
            return c + f(p, v)
        return jax.lax.fori_loop(0, 3, body, jnp.zeros_like(p))

    np.testing.assert_array_equal(np.asarray(loop(pos, vel)),
                                  np.asarray(loop0(pos, vel)))
