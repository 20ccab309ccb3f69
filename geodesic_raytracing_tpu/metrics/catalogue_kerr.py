"""Kerr family: spinning (and charged) black holes in four coordinate systems.

jnp re-statements of the reference scripts cited per metric.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.geometry import recip
from .base import Metric, diag_metric, make_config, minkowski_plus, register, sym_metric


def kerr_boyer_fn(x, params):
    """scripts/kerr_boyer.js — Kerr in Boyer-Lindquist (t, r, theta, phi).

    Shared denominators go through ``geometry.recip`` once and multiply:
    fp divides are the integrator step's costliest op class, and the
    custom-JVP reciprocal keeps the partial-derivative sweeps div-free."""
    rs, a = params["rs"], params["a"]
    r, theta = x[1], x[2]
    ct, st = jnp.cos(theta), jnp.sin(theta)
    st2 = st * st
    E = r * r + a * a * ct * ct
    D = r * r - rs * r + a * a
    invE = recip(E)
    rsr_invE = rs * r * invE
    return sym_metric(
        {
            (0, 0): -(1.0 - rsr_invE),
            (1, 1): E * recip(D),
            (2, 2): E,
            (3, 3): (r * r + a * a + rsr_invE * a * a * st2) * st2,
            (0, 3): -rsr_invE * a * st2,
        }
    )


kerr_boyer = register(
    Metric(
        name="kerr_boyer",
        fn=kerr_boyer_fn,
        config=make_config(
            "polar_base",
            name="kerr_boyer",
            adaptive_precision=True,
            detect_singularities=True,
            use_prepass=True,
            max_acceleration_change=1e-6,
            description="An uncharged, spinning black hole",
        ),
        defaults={"rs": 1.0, "a": -0.5},
        depends_on=(1, 2),
        structure=frozenset({(0, 0), (1, 1), (2, 2), (3, 3), (0, 3)}),
    )
)


def kerr_schild_fl(x, params):
    """Kerr-Schild decomposition (f, l) of scripts/kerr_schild.js: the
    shared (r, l, f) chain behind :func:`kerr_schild_fn`, exposed for the
    rank-1 acceleration fast path.  Divisions go through ``recip`` once
    so the JVP/transpose sweeps stay div-free."""
    a, rs = params["a"], params["rs"]
    xx, y, z = x[1], x[2], x[3]
    R2 = xx * xx + y * y + z * z
    Rm2 = xx * xx + y * y - z * z
    r2 = (-a * a + jnp.sqrt(a ** 4 - 2.0 * a * a * Rm2 + R2 * R2) + R2) / 2.0
    r = jnp.sqrt(r2)
    inv_ra = recip(r2 + a * a)
    inv_r = recip(r)
    lv = jnp.stack(
        [
            jnp.ones_like(r),
            (r * xx + a * y) * inv_ra,
            (r * y - a * xx) * inv_ra,
            z * inv_r,
        ]
    )
    f = rs * r2 * r * recip(r2 * r2 + a * a * z * z)
    return f, lv


def kerr_schild_fn(x, params):
    """scripts/kerr_schild.js — Kerr in Kerr-Schild cartesian coordinates
    (arXiv:0706.0622): g = eta + f l l."""
    return minkowski_plus(*kerr_schild_fl(x, params))


kerr_schild = register(
    Metric(
        name="kerr_schild",
        fn=kerr_schild_fn,
        config=make_config(
            "cartesian_base",
            name="kerr_schild",
            adaptive_precision=True,
            detect_singularities=True,
            use_prepass=True,
            max_acceleration_change=1e-6,
            description="Kerr in Kerr-Schild cartesian coordinates",
        ),
        defaults={"a": -0.5, "rs": 1.0},
        depends_on=(1, 2, 3),
        rank1=kerr_schild_fl,
    )
)


def kerr_ingoing_ef_fn(x, params):
    """scripts/kerr_ingoing_ef.js — Kerr in ingoing EF-like coordinates
    (scholarpedia Kerr-Newman eq. 47, signs flipped for signature)."""
    rs, a = params["rs"], params["a"]
    r, theta = x[1], x[2]
    ct, st = jnp.cos(theta), jnp.sin(theta)
    R2 = r * r + a * a * ct * ct
    D = r * r + a * a - rs * r
    dv = 1.0 - rs * r / R2
    dv_dr = -2.0
    dv_dphi = (2.0 * a * st * st / R2) * (rs * r)
    dr_dphi = 2.0 * a * st * st
    dtheta = -R2
    dphi = (st * st / R2) * (D * a * a * st * st - (a * a + r * r) ** 2)
    return sym_metric(
        {
            (0, 0): -dv,
            (0, 1): -0.5 * dv_dr,
            (0, 3): -0.5 * dv_dphi,
            (1, 3): -0.5 * dr_dphi,
            (2, 2): -dtheta,
            (3, 3): -dphi,
        }
    )


kerr_ingoing_ef = register(
    Metric(
        name="kerr_ingoing_ef",
        fn=kerr_ingoing_ef_fn,
        config=make_config(
            "ingoing_ef_base",
            name="kerr_ingoing_ef",
            use_prepass=True,
            description="Kerr with a traversable horizon (ingoing EF)",
        ),
        defaults={"rs": 1.0, "a": -0.5},
        depends_on=(1, 2),
        structure=frozenset(
            {(0, 0), (0, 1), (0, 3), (1, 3), (2, 2), (3, 3)}
        ),
    )
)


def kerr_newman_boyer_fn(x, params):
    """scripts/kerr_newman_boyer.js — charged spinning black hole in BL."""
    rs, r2q, a = params["rs"], params["r2q"], params["a"]
    r, theta = x[1], x[2]
    ct, st = jnp.cos(theta), jnp.sin(theta)
    p2 = r * r + a * a * ct * ct
    D = r * r - rs * r + a * a + r2q * r2q
    dr = -p2 / D
    dtheta = -p2
    dt_1 = D / p2
    dtdphi_1 = -2.0 * a * st * st * D / p2
    dphi_1 = (a * st * st) ** 2 * D / p2
    dphi_2 = -((r * r + a * a) ** 2) * st * st / p2
    dtdphi_2 = 2.0 * a * (r * r + a * a) * st * st / p2
    dt_2 = -a * a * st * st / p2
    dtdphi = dtdphi_1 + dtdphi_2
    return sym_metric(
        {
            (0, 0): -(dt_1 + dt_2),
            (1, 1): -dr,
            (2, 2): -dtheta,
            (3, 3): -(dphi_1 + dphi_2),
            (0, 3): -dtdphi * 0.5,
        }
    )


kerr_newman_boyer = register(
    Metric(
        name="kerr_newman_boyer",
        fn=kerr_newman_boyer_fn,
        config=make_config(
            "polar_base",
            name="kerr_newman_boyer",
            adaptive_precision=True,
            detect_singularities=True,
            max_acceleration_change=1e-6,
            description="A charged, spinning black hole",
        ),
        defaults={"rs": 1.0, "r2q": 0.51, "a": -0.51},
        depends_on=(1, 2),
        structure=frozenset({(0, 0), (1, 1), (2, 2), (3, 3), (0, 3)}),
    )
)


def kerr_newman_schild_fl(x, params):
    """Kerr-Schild decomposition (f, l) of scripts/kerr_newman_schild.js
    (f gains the -Q^2 charge term); see :func:`kerr_schild_fl`."""
    a, rs, Q = params["a"], params["rs"], params["Q"]
    xx, y, z = x[1], x[2], x[3]
    R2 = xx * xx + y * y + z * z
    Rm2 = xx * xx + y * y - z * z
    r2 = (-a * a + jnp.sqrt(a ** 4 - 2.0 * a * a * Rm2 + R2 * R2) + R2) / 2.0
    r = jnp.sqrt(r2)
    inv_ra = recip(r2 + a * a)
    inv_r = recip(r)
    lv = jnp.stack(
        [
            jnp.ones_like(r),
            (r * xx + a * y) * inv_ra,
            (r * y - a * xx) * inv_ra,
            z * inv_r,
        ]
    )
    f = (rs * r - Q * Q) * r * r * recip(r2 * r2 + a * a * z * z)
    return f, lv


def kerr_newman_schild_fn(x, params):
    """scripts/kerr_newman_schild.js — Kerr-Newman in Kerr-Schild cartesian
    coordinates (f gains the -Q^2 charge term)."""
    return minkowski_plus(*kerr_newman_schild_fl(x, params))


kerr_newman_schild = register(
    Metric(
        name="kerr_newman_schild",
        fn=kerr_newman_schild_fn,
        config=make_config(
            "cartesian_base",
            name="kerr_newman_schild",
            adaptive_precision=True,
            detect_singularities=True,
            use_prepass=True,
            max_acceleration_change=1e-6,
        ),
        defaults={"a": -0.51, "rs": 1.0, "Q": 0.51},
        depends_on=(1, 2, 3),
        rank1=kerr_newman_schild_fl,
    )
)


def kerr_rational_polynomial_fn(x, params):
    """scripts/kerr_rational_polynomial.js — Kerr with X = cos(theta)."""
    m, a = params["m"], params["a"]
    r, X = x[1], x[2]
    S = r * r + a * a * X * X
    dt = -(1.0 - 2.0 * m * r / S)
    dphidt = -(4.0 * a * m * r * (1.0 - X * X)) / S
    dr = S / (r * r - 2.0 * m * r + a * a)
    dX = S / (1.0 - X * X)
    dphi = (1.0 - X * X) * (
        r * r + a * a + (2.0 * m * a * a * r * (1.0 - X * X)) / S
    )
    return sym_metric(
        {
            (0, 0): dt,
            (1, 1): dr,
            (2, 2): dX,
            (3, 3): dphi,
            (0, 3): dphidt * 0.5,
        }
    )


kerr_rational_polynomial = register(
    Metric(
        name="kerr_rational_polynomial",
        fn=kerr_rational_polynomial_fn,
        config=make_config(
            None,
            name="kerr_rational_polynomial",
            coordinate_system="X_Y_THETA_PHI",
            adaptive_precision=True,
            detect_singularities=True,
            max_acceleration_change=1e-6,
            to_polar="rational_to_polar",
            from_polar="polar_to_rational",
            origin_distance="at_origin",
            description="Kerr in rational polynomial form",
        ),
        defaults={"m": 0.5, "a": -0.25},
        depends_on=(1, 2),
        structure=frozenset({(0, 0), (1, 1), (2, 2), (3, 3), (0, 3)}),
    )
)
