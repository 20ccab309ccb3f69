"""Multi-body exact solutions: double black holes on Weyl/cylindrical strips.

The reference evaluates these with complex dual numbers (``dual_complex`` in
deps/vec; CMath.i, conjugate, Real/Imaginary, self_conjugate_multiply —
js_interop.cpp:129-149).  Here plain jnp ``complex64`` arithmetic does the same
job and ``jacfwd`` differentiates straight through it.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.complexify import realify

from .base import Metric, make_config, register, sym_metric


def _scm(z):
    """CMath.self_conjugate_multiply: z * conj(z), returned real."""
    return (z * jnp.conj(z)).real


def double_schwarzschild_fn(x, params):
    """scripts/double_schwarzschild.js — two Schwarzschild black holes held
    apart by a strut (cylindrical (t, p, phi, z))."""
    M1, M2, z0 = params["M1"], params["M2"], params["z"]
    p, z = x[1], x[3]

    e = M2 - M1
    M = M1 + M2
    a1 = -0.5 * (M - e) - z0
    a2 = 0.5 * (M - e) - z0
    a3 = -0.5 * (M + e) + z0
    a4 = 0.5 * (M + e) + z0
    aks = (a1, a2, a3, a4)

    def Rk(i):
        ak = aks[i - 1]
        return jnp.sqrt(p * p + (z - ak) * (z - ak))

    def Yk(i):
        return Rk(i) + aks[i - 1] - z

    def Yij(i, j):
        return Rk(i) * Rk(j) + (z - aks[i - 1]) * (z - aks[j - 1]) + p * p

    e2k = (Yij(4, 3) * Yij(2, 1) * Yij(4, 1) * Yij(3, 2)) / (
        4.0 * Yij(4, 2) * Yij(3, 1) * Rk(1) * Rk(2) * Rk(3) * Rk(4)
    )
    e_2U = (Yk(1) * Yk(3)) / (Yk(2) * Yk(4))
    e_m2U = 1.0 / e_2U

    return sym_metric(
        {
            (0, 0): -e_2U,
            (1, 1): e_m2U * e2k,
            (2, 2): e_m2U * p * p,
            (3, 3): e_m2U * e2k,
        }
    )


double_schwarzschild = register(
    Metric(
        name="double_schwarzschild",
        # Trace-time structure (sym_metric keys); prunes the
        # in-kernel inverse/contraction like the Kerr family.
        structure=frozenset({(0, 0), (1, 1), (2, 2), (3, 3)}),
        fn=double_schwarzschild_fn,
        config=make_config(
            "cylindrical_base",
            name="double_schwarzschild",
            adaptive_precision=True,
            detect_singularities=True,
            max_acceleration_change=1e-5,
            has_cylindrical_singularity=True,
            cylindrical_terminator=0.005,
            description="Two schwarzschild black holes separated by a string",
        ),
        defaults={"M1": 1.0, "M2": 0.1, "z": 2.0},
        depends_on=(1, 3),
    )
)


def double_kerr_fn(x, params):
    """scripts/double_kerr.js — two equal Kerr black holes on a strut
    (Kramer-Neugebauer-type exact solution, cylindrical (t, p, phi, z))."""
    R, M, a = params["R"], params["M"], params["a"]
    p, z = x[1], x[3]
    i = jnp.complex64(1j)

    d = 2.0 * M * a * (R * R - 4.0 * M * M + 4.0 * a * a) / (
        R * R + 2.0 * M * R + 4.0 * a * a
    )
    sigma_sq = M * M - a * a + (
        4.0 * M * M * a * a * (R * R - 4.0 * M * M + 4.0 * a * a)
    ) / (R * R + 2.0 * M * R + 4.0 * a * a) ** 2
    sigmap = jnp.sqrt(jnp.asarray(sigma_sq, dtype=jnp.complex64))
    sigman = -sigmap

    ia = i * a
    id_ = i * d

    def Rpm(sig):
        return (
            (-M * (2.0 * sig + R) + id_)
            / (2.0 * M * M + (R + 2.0 * ia) * (sig + ia))
        ) * jnp.sqrt((p * p + (z + 0.5 * R + sig) ** 2).astype(jnp.complex64))

    def rpm(sig):
        return (
            (-M * (2.0 * sig - R) + id_)
            / (2.0 * M * M - (R - 2.0 * ia) * (sig + ia))
        ) * jnp.sqrt((p * p + (z - 0.5 * R + sig) ** 2).astype(jnp.complex64))

    Rp, Rn = Rpm(sigmap), Rpm(sigman)
    rp, rn = rpm(sigmap), rpm(sigman)

    K0 = (
        4.0
        * sigma_sq
        * ((R * R + 2.0 * M * R + 4.0 * a * a) ** 2 - 16.0 * M * M * a * a)
        / (M * M * ((R + 2.0 * M) ** 2 + 4.0 * a * a))
    )

    A = R * R * (Rp - Rn) * (rp - rn) - 4.0 * sigma_sq * (Rp - rp) * (Rn - rn)
    B = 2.0 * R * sigmap * (
        (R + 2.0 * sigmap) * (Rn - rp) - (R - 2.0 * sigmap) * (Rp - rn)
    )

    G = -z * B + R * sigmap * (
        2.0 * R * (Rn * rn - Rp * rp)
        + 4.0 * sigmap * (Rp * Rn - rp * rn)
        - (R * R - 4.0 * sigma_sq) * (Rp - Rn - rp + rn)
    )

    denom = _scm(A) - _scm(B)
    w = 4.0 * a - 2.0 * (G * (jnp.conj(A) + jnp.conj(B))).imag / denom

    re_ab = ((A + B) * (jnp.conj(A) + jnp.conj(B))).real
    f = denom / re_ab
    i_f = re_ab / denom
    i_f_e2g = re_ab / (K0 * K0 * Rp * Rn * rp * rn).real

    dphi1 = i_f * p * p
    dphi2 = -f * w * w
    dt_dphi = 2.0 * f * w

    return sym_metric(
        {
            (0, 0): -f,
            (2, 2): dphi1 + dphi2,
            (0, 2): 0.5 * dt_dphi,
            (1, 1): i_f_e2g,
            (3, 3): i_f_e2g,
        }
    )


double_kerr = register(
    Metric(
        name="double_kerr",
        # Trace-time structure (sym_metric keys); prunes the
        # in-kernel inverse/contraction like the Kerr family.
        structure=frozenset({(0, 0), (0, 2), (1, 1), (2, 2), (3, 3)}),
        fn=realify(double_kerr_fn),
        config=make_config(
            "cylindrical_base",
            name="double_kerr",
            adaptive_precision=True,
            detect_singularities=True,
            max_acceleration_change=1e-6,
            description="Two Kerr black holes suspended by a cosmic string",
        ),
        defaults={"R": 3.0, "M": 0.3, "a": 0.27},
        depends_on=(1, 3),
    )
)


def double_kerr_alt_fn(x, params):
    """scripts/double_kerr_alt.js — co/counter-rotating double Kerr
    (arXiv:1702.02209)."""
    R, M, q = params["R"], params["M"], params["q"]
    p, z = x[1], x[3]
    i = jnp.complex64(1j)

    sigma = jnp.sqrt(
        jnp.asarray(
            M * M
            - q
            * q
            * (
                1.0
                - (4.0 * M * M * (R * R - 4.0 * M * M + 4.0 * q * q))
                / (R * (R + 2.0 * M) + 4.0 * q * q) ** 2
            ),
            dtype=jnp.complex64,
        )
    )

    def rad(offs):
        return jnp.sqrt((p * p + (z + offs) ** 2).astype(jnp.complex64))

    r1 = rad(-R / 2 - sigma)
    r2 = rad(-R / 2 + sigma)
    r3 = rad(R / 2 - sigma)
    r4 = rad(R / 2 + sigma)

    littled = 2.0 * M * q * (R * R - 4.0 * M * M + 4.0 * q * q) / (
        R * (R + 2.0 * M) + 4.0 * q * q
    )

    pp = (
        2.0 * (M * M - q * q)
        - (R + 2.0 * M) * sigma
        + M * R
        + i * (q * (R - 2.0 * sigma) + littled)
    )
    pn = (
        2.0 * (M * M - q * q)
        - (R - 2.0 * M) * sigma
        - M * R
        + i * (q * (R - 2.0 * sigma) - littled)
    )
    sp = (
        2.0 * (M * M - q * q)
        + (R - 2.0 * M) * sigma
        - M * R
        + i * (q * (R + 2.0 * sigma) - littled)
    )
    sn = (
        2.0 * (M * M - q * q)
        + (R + 2.0 * M) * sigma
        + M * R
        + i * (q * (R + 2.0 * sigma) + littled)
    )

    k0 = (R * R - 4.0 * sigma * sigma) * (
        (R * R - 4.0 * M * M) * (M * M - sigma * sigma)
        + 4.0 * q ** 4
        + 4.0 * M * q * littled
    )
    kp = R + 2.0 * (sigma + 2.0 * i * q)
    kn = R - 2.0 * (sigma + 2.0 * i * q)

    c = jnp.conj
    delta = (
        4.0 * sigma * sigma * (pp * pn * sp * sn * r1 * r2
                               + c(pp) * c(pn) * c(sp) * c(sn) * r3 * r4)
        - R * R * (c(pp) * c(pn) * sp * sn * r1 * r3
                   + pp * pn * c(sp) * c(sn) * r2 * r4)
        + (R * R - 4.0 * sigma * sigma)
        * (c(pp) * pn * c(sp) * sn * r1 * r4 + pp * c(pn) * sp * c(sn) * r2 * r3)
    )

    gamma = -2.0 * i * sigma * R * (
        (R - 2.0 * sigma)
        * (pp * c(pn)).imag
        * (sp * sn * r1 - c(sp) * c(sn) * r4)
        + (R + 2.0 * sigma)
        * (sp * c(sn)).imag
        * (pp * pn * r2 - c(pp) * c(pn) * r3)
    )

    G = (
        4.0 * sigma * sigma * (
            (R - 2.0 * i * q) * pp * pn * sp * sn * r1 * r2
            - (R + 2.0 * i * q) * c(pp) * c(pn) * c(sp) * c(sn) * r3 * r4
        )
        - 2.0 * R * R * (
            (sigma - i * q) * c(pp) * c(pn) * sp * sn * r1 * r3
            - (sigma + i * q) * pp * pn * c(sp) * c(sn) * r2 * r4
        )
        - 2.0 * i * q * (R * R - 4.0 * sigma * sigma)
        * (pp * c(pn) * sp * c(sn)).real
        * (r1 * r4 + r2 * r3)
        - i * sigma * R * (
            (R - 2.0 * sigma)
            * (pp * c(pn)).imag
            * (c(kp) * sp * sn * r1 + kp * c(sp) * c(sn) * r4)
            + (R + 2.0 * sigma)
            * (sp * c(sn)).imag
            * (kn * pp * pn * r2 + c(kn) * c(pp) * c(pn) * r3)
        )
    )

    denom = _scm(delta) - _scm(gamma)
    w = 2.0 * ((delta - gamma) * (z * c(gamma) + c(G))).imag / denom
    e2y = denom / (
        256.0 * (sigma ** 4).real * R ** 4 * (k0 * k0).real * (r1 * r2 * r3 * r4).real
    )
    f = denom / ((delta - gamma) * (c(delta) - c(gamma))).real

    dp = e2y / f
    dphi_1 = p * p / f
    dt = -f
    dphi_2 = -f * w * w
    dt_dphi = 2.0 * f * w

    return sym_metric(
        {
            (0, 0): dt,
            (1, 1): dp,
            (2, 2): dphi_1 + dphi_2,
            (3, 3): dp,
            (0, 2): 0.5 * dt_dphi,
        }
    )


double_kerr_alt = register(
    Metric(
        name="double_kerr_alt",
        # Trace-time structure (sym_metric keys); prunes the
        # in-kernel inverse/contraction like the Kerr family.
        structure=frozenset({(0, 0), (0, 2), (1, 1), (2, 2), (3, 3)}),
        fn=realify(double_kerr_alt_fn),
        config=make_config(
            "cylindrical_base",
            name="double_kerr_alt",
            adaptive_precision=True,
            detect_singularities=True,
            max_acceleration_change=1e-5,
            description="Two Kerr black holes suspended by a cosmic string",
        ),
        defaults={"R": 4.0, "M": 0.3, "q": 0.2},
        depends_on=(1, 3),
    )
)


def double_unequal_kerr_fn(x, params):
    """scripts/double_unequal_kerr.js — two unequal-mass Kerr black holes
    (ScienceDirect S0370269319303375)."""
    m1, m2 = params["m1"], params["m2"]
    fa1, fa2 = params["fa1"], params["fa2"]
    R = params["R"]
    p, z = x[1], x[3]
    i = jnp.complex64(1j)
    c = jnp.conj

    a1 = fa1 * m1
    a2 = fa2 * m2
    J = m1 * a1 + m2 * a2
    M = m1 + m2

    # Cubic root for the NUT-free constant `a` (wolframalpha closed form in
    # the reference script).
    k = a1 + a2
    B_ = R * R - M * M
    C_ = 2.0 * (R + M)
    inner = 18.0 * B_ * k + 27.0 * C_ * J - 9.0 * C_ * k * M + 2.0 * k ** 3
    inner_val = (
        jnp.sqrt(
            (inner ** 2 + 4.0 * (3.0 * B_ + 3.0 * C_ * M - k * k) ** 3).astype(
                jnp.complex64
            )
        )
        + inner
    ) ** (1.0 / 3.0)
    third_root_2 = 2.0 ** (1.0 / 3.0)
    a = (
        (1.0 / (3.0 * third_root_2)) * inner_val
        - (third_root_2 * (3.0 * B_ + 3.0 * C_ * M - k * k)) / (3.0 * inner_val)
        + k / 3.0
    ).real

    RM2a2 = (R + M) ** 2 + a * a
    d1 = ((m1 * (a1 - a2 + a) + R * a) * RM2a2 + m2 * a1 * a * a) / RM2a2 ** 2
    d2 = ((m2 * (a2 - a1 + a) + R * a) * RM2a2 + m1 * a2 * a * a) / RM2a2 ** 2

    s1 = jnp.sqrt(
        (m1 * m1 - a1 * a1 + 4.0 * m2 * a1 * d1).astype(jnp.complex64)
    )
    s2 = jnp.sqrt(
        (m2 * m2 - a2 * a2 + 4.0 * m1 * a2 * d2).astype(jnp.complex64)
    )

    def rad(offs):
        return jnp.sqrt((p * p).astype(jnp.complex64) + (z + offs) ** 2)

    Rsp = rad(0.5 * R + s2)
    Rsn = rad(0.5 * R - s2)
    rsp = rad(-0.5 * R + s1)
    rsn = rad(-0.5 * R - s1)

    mu0 = (R + M - i * a) / (R + M + i * a)

    rp = (
        (1.0 / mu0)
        * (
            ((s1 - m1 - i * a1) * RM2a2 + 2.0 * a1 * (m1 * a + i * M * (R + M)))
            / ((s1 - m1 + i * a1) * RM2a2 + 2.0 * a1 * (m1 * a - i * M * (R + M)))
        )
        * rsp
    )
    rn = (
        (1.0 / mu0)
        * (
            ((-s1 - m1 - i * a1) * RM2a2 + 2.0 * a1 * (m1 * a + i * M * (R + M)))
            / ((-s1 - m1 + i * a1) * RM2a2 + 2.0 * a1 * (m1 * a - i * M * (R + M)))
        )
        * rsn
    )
    Rp = (
        -mu0
        * (
            ((s2 + m2 - i * a2) * RM2a2 - 2.0 * a2 * (m2 * a - i * M * (R + M)))
            / ((s2 + m2 + i * a2) * RM2a2 - 2.0 * a2 * (m2 * a + i * M * (R + M)))
        )
        * Rsp
    )
    Rn = (
        -mu0
        * (
            ((-s2 + m2 - i * a2) * RM2a2 - 2.0 * a2 * (m2 * a - i * M * (R + M)))
            / ((-s2 + m2 + i * a2) * RM2a2 - 2.0 * a2 * (m2 * a + i * M * (R + M)))
        )
        * Rsn
    )

    A = (R * R - (s1 + s2) ** 2) * (Rp - Rn) * (rp - rn) - 4.0 * s1 * s2 * (
        Rp - rn
    ) * (Rn - rp)
    B = (
        2.0 * s1 * (R * R - s1 * s1 + s2 * s2) * (Rn - Rp)
        + 2.0 * s2 * (R * R + s1 * s1 - s2 * s2) * (rn - rp)
        + 4.0 * R * s1 * s2 * (Rp + Rn - rp - rn)
    )

    G = (
        -z * B
        + s1 * (R * R - s1 * s1 + s2 * s2) * (Rn - Rp) * (rp + rn + R)
        + s2 * (R * R + s1 * s1 - s2 * s2) * (rn - rp) * (Rp + Rn - R)
        - 2.0
        * s1
        * s2
        * (
            2.0 * R * (rp * rn - Rp * Rn - s1 * (rn - rp) + s2 * (Rn - Rp))
            + (s1 * s1 - s2 * s2) * (rp + rn - Rp - Rn)
        )
    )

    K0 = (
        RM2a2 * (R * R - (m1 - m2) ** 2 + a * a) - 4.0 * m1 * m1 * m2 * m2 * a * a
    ) / (m1 * m2 * RM2a2)

    denom = _scm(A) - _scm(B)
    w = 2.0 * a - 2.0 * (G * (c(A) + c(B))).imag / denom
    f = denom / ((A + B) * (c(A) + c(B))).real
    e2g = denom / (
        16.0 * jnp.abs(s1) ** 2 * jnp.abs(s2) ** 2 * K0 * K0
        * (Rsp * Rsn * rsp * rsn)
    ).real

    dphi2 = -f * w * w
    dphi1 = (1.0 / f) * p * p
    dt_dphi = 2.0 * f * w
    dp = (1.0 / f) * e2g

    return sym_metric(
        {
            (0, 0): -f,
            (2, 2): dphi1 + dphi2,
            (0, 2): 0.5 * dt_dphi,
            (1, 1): dp,
            (3, 3): dp,
        }
    )


double_unequal_kerr = register(
    Metric(
        name="double_unequal_kerr",
        # Trace-time structure (sym_metric keys); prunes the
        # in-kernel inverse/contraction like the Kerr family.
        structure=frozenset({(0, 0), (0, 2), (1, 1), (2, 2), (3, 3)}),
        fn=realify(double_unequal_kerr_fn),
        config=make_config(
            "cylindrical_base",
            name="double_unequal_kerr",
            adaptive_precision=True,
            detect_singularities=True,
            max_acceleration_change=1e-5,
            description="Two unequal mass kerr black holes",
        ),
        defaults={"m1": 0.15, "m2": 0.3, "fa1": 1.0, "fa2": -0.3, "R": 4.0},
        depends_on=(1, 3),
    )
)
