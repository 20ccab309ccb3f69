"""Exotic spacetimes: warp drives, tubes, time machines, spinning strings.

jnp re-statements of the reference scripts cited per metric.
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import Metric, diag_metric, make_config, register, sym_metric


def alcubierre_fn(x, params):
    """scripts/alcubierre.js — the Alcubierre warp drive."""
    v_s, sigma, R = params["velocity"], params["sigma"], params["R"]
    t, xx, y, z = x[0], x[1], x[2], x[3]
    xs_t = v_s * t
    rs_t = jnp.sqrt((xx - xs_t) ** 2 + y * y + z * z)
    f_rs = (jnp.tanh(sigma * (rs_t + R)) - jnp.tanh(sigma * (rs_t - R))) / (
        2.0 * jnp.tanh(sigma * R)
    )
    dt = v_s * v_s * f_rs * f_rs - 1.0
    dxdt = -2.0 * v_s * f_rs
    return sym_metric(
        {
            (0, 0): dt,
            (0, 1): 0.5 * dxdt,
            (1, 1): 1.0,
            (2, 2): 1.0,
            (3, 3): 1.0,
        }
    )


alcubierre = register(
    Metric(
        name="alcubierre",
        # Trace-time structure (sym_metric keys); prunes the
        # in-kernel inverse/contraction like the Kerr family.
        structure=frozenset({(0, 0), (0, 1), (1, 1), (2, 2), (3, 3)}),
        fn=alcubierre_fn,
        config=make_config(
            "cartesian_base",
            name="alcubierre",
            adaptive_precision=True,
            detect_singularities=False,
            max_acceleration_change=1e-5,
            origin_distance="alcubierre_origin",
            unconditionally_nonsingular=True,
            description="The alcubierre warp drive",
        ),
        defaults={"velocity": 2.0, "sigma": 1.0, "R": 2.0},
        depends_on=(0, 1, 2, 3),
    )
)


def _krasnikov_thetae(v, e):
    """theta_e step function shared by both Krasnikov scripts."""
    return 0.5 * (jnp.tanh(2.0 * (2.0 * v / e - 1.0)) + 1.0)


def krasnikov_cartesian_fn(x, params):
    """scripts/krasnikov_cartesian.js — Krasnikov tube, cartesian."""
    e, D, pmax, little_d = (
        params["e"],
        params["D"],
        params["pmax"],
        params["littled"],
    )
    t, xx, y, z = x[0], x[1], x[2], x[3]
    p = jnp.sqrt(y * y + z * z)
    k = 1.0 - (2.0 - little_d) * _krasnikov_thetae(pmax - p, e) * _krasnikov_thetae(
        t - xx - p, e
    ) * (_krasnikov_thetae(xx, e) - _krasnikov_thetae(xx + e - D, e))
    dxdt = 1.0 - k
    return sym_metric(
        {
            (0, 0): -1.0,
            (0, 1): 0.5 * dxdt,
            (1, 1): k,
            (2, 2): 1.0,
            (3, 3): 1.0,
        }
    )


krasnikov_tube = register(
    Metric(
        name="krasnikov_tube",
        # Trace-time structure (sym_metric keys); prunes the
        # in-kernel inverse/contraction like the Kerr family.
        structure=frozenset({(0, 0), (0, 1), (1, 1), (2, 2), (3, 3)}),
        fn=krasnikov_cartesian_fn,
        config=make_config(
            "cartesian_base",
            name="krasnikov_tube",
            adaptive_precision=True,
            detect_singularities=False,
            max_acceleration_change=1e-5,
            description="An FTL space tunnel",
        ),
        defaults={"e": 0.75, "D": 5.0, "pmax": 2.0, "littled": 0.01},
        depends_on=(0, 1, 2, 3),
    )
)


def krasnikov_cylindrical_fn(x, params):
    """scripts/krasnikov_cylindrical.js — original cylindrical form.

    Note the reference script declares $cfg tunables but then uses hard-coded
    literals (e=0.1, D=2, pmax=1, littled=0.01); behaviour reproduced.
    """
    e, D, pmax, little_d = 0.1, 2.0, 1.0, 0.01
    t, p, phi, xx = x[0], x[1], x[2], x[3]
    k = 1.0 - (2.0 - little_d) * _krasnikov_thetae(pmax - p, e) * _krasnikov_thetae(
        t - xx - p, e
    ) * (_krasnikov_thetae(xx, e) - _krasnikov_thetae(xx + e - D, e))
    dxdt = 1.0 - k
    return sym_metric(
        {
            (0, 0): -1.0,
            (1, 1): 1.0,
            (2, 2): p * p,
            (3, 3): k,
            (0, 3): 0.5 * dxdt,
        }
    )


krasnikov_cylindrical = register(
    Metric(
        name="krasnikov_cylindrical",
        # Trace-time structure (sym_metric keys); prunes the
        # in-kernel inverse/contraction like the Kerr family.
        structure=frozenset({(0, 0), (0, 3), (1, 1), (2, 2), (3, 3)}),
        fn=krasnikov_cylindrical_fn,
        config=make_config(
            None,
            name="krasnikov_cylindrical",
            coordinate_system="OTHER",
            adaptive_precision=True,
            detect_singularities=False,
            max_acceleration_change=1e-6,
            to_polar="cylindrical_to_polar",
            from_polar="polar_to_cylindrical",
            origin_distance="at_origin",
        ),
        defaults={"e": 0.1, "D": 2.0, "pmax": 1.0},
        depends_on=(0, 1, 3),
    )
)


def misner_4d_fn(x, params):
    """scripts/misner_4d.js — Misner spacetime extended to 4d
    (arXiv:1102.0907 eq. 25); coordinates (T, phi, y, z)."""
    T = x[0]
    return sym_metric(
        {
            (0, 1): -1.0,
            (1, 1): -T,
            (2, 2): 1.0,
            (3, 3): 1.0,
        }
    )


misner_4d = register(
    Metric(
        name="misner_4d",
        # Trace-time structure (sym_metric keys); prunes the
        # in-kernel inverse/contraction like the Kerr family.
        structure=frozenset({(0, 1), (1, 1), (2, 2), (3, 3)}),
        fn=misner_4d_fn,
        config=make_config(
            None,
            name="misner_4d",
            coordinate_system="OTHER",
            adaptive_precision=True,
            detect_singularities=True,
            max_acceleration_change=1e-4,
            to_polar="misner_4d_to_polar",
            from_polar="polar_to_misner_4d",
            origin_distance="at_origin",
            coordinate_periodicity="misner_periodicity",
            description="Misner spacetime; good for time travel",
        ),
        defaults={"phi0": 1.0},
        depends_on=(0,),
    )
)


def godel_cylinder_fn(x, params):
    """scripts/godel_cylinder.js — Godel's rotating universe, cylindrical
    (t, r, phi, z)."""
    a = params["a"]
    r = x[1]
    dt = -1.0
    dr = 1.0 / (1.0 + (r / (2.0 * a)) ** 2)
    dphi = r * r * (1.0 - (r / (2.0 * a)) ** 2)
    dz = 1.0
    dt_dphi = -2.0 * r * r / (jnp.sqrt(2.0) * a)
    return sym_metric(
        {
            (0, 0): dt,
            (1, 1): dr,
            (2, 2): dphi,
            (3, 3): dz,
            (0, 2): 0.5 * dt_dphi,
        }
    )


godel_cylindrical = register(
    Metric(
        name="godel_cylindrical",
        # Trace-time structure (sym_metric keys); prunes the
        # in-kernel inverse/contraction like the Kerr family.
        structure=frozenset({(0, 0), (0, 2), (1, 1), (2, 2), (3, 3)}),
        fn=godel_cylinder_fn,
        config=make_config(
            "cylindrical_base",
            name="godel_cylindrical",
            adaptive_precision=True,
            max_acceleration_change=1e-6,
            has_cylindrical_singularity=True,
            description="Godel's metric, a spinning spacetime",
        ),
        defaults={"a": 1000.0},
        depends_on=(1,),
    )
)


def cosmic_string_spinning_fn(x, params):
    """scripts/cosmic_string_spinning.js — spinning cosmic string,
    cylindrical (t, p, phi, z)."""
    a, k = params["a"], params["k"]
    p = x[1]
    return sym_metric(
        {
            (0, 0): -1.0,
            (1, 1): 1.0,
            (2, 2): a * a + k * k * p * p,
            (3, 3): 1.0,
            (0, 1): a,  # 0.5 * dtdphi with dtdphi = 2a (reference indexes (0,1))
        }
    )


cosmic_string_spinning = register(
    Metric(
        name="cosmic_string_spinning",
        # Trace-time structure (sym_metric keys); prunes the
        # in-kernel inverse/contraction like the Kerr family.
        structure=frozenset({(0, 0), (0, 1), (1, 1), (2, 2), (3, 3)}),
        fn=cosmic_string_spinning_fn,
        config=make_config(
            "cylindrical_base",
            name="cosmic_string_spinning",
            adaptive_precision=True,
            detect_singularities=False,
            max_acceleration_change=1e-6,
        ),
        defaults={"a": 0.01, "k": 0.98},
        depends_on=(1,),
    )
)
