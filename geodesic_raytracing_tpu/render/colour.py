"""Colour handling: sRGB transfer and the relativistic redshift model.

Behavioural twin of the reference's ``redshift()`` (cl.cl:5371-5413) and the
Lorentz-invariant ``I / nu^3`` intensity scaling (cl.cl:5794-5831).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def srgb_to_lin(c: Array) -> Array:
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def lin_to_srgb(c: Array) -> Array:
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(
        c <= 0.0031308, c * 12.92, 1.055 * c ** (1.0 / 2.4) - 0.055
    )


def energy_of(v: Array) -> Array:
    """Relative luminance (cl.cl:5366-5369)."""
    return (
        v[..., 0] * 0.2125 + v[..., 1] * 0.7154 + v[..., 2] * 0.0721
    )


def redshift_colour(v: Array, z: Array, old: bool = False) -> Array:
    """Map the shift z in [-1, +inf] onto a red/blue hue mix while conserving
    estimated radiant energy (``redshift()`` cl.cl:5371-5413).  ``old``
    selects the reference's ``use_old_redshift`` feature (main.cpp:1139):
    skip the blueshift energy-overflow redistribution (cl.cl:5397-5406)."""
    radiant_energy = energy_of(v)[..., None]
    red = jnp.array([1.0 / 0.2125, 0.0, 0.0])
    green = jnp.array([0.0, 1.0 / 0.7154, 0.0])
    blue = jnp.array([0.0, 0.0, 1.0 / 0.0721])

    z_pos = jnp.maximum(z, 0.0)[..., None]
    result_red = v + (radiant_energy * red - v) * jnp.tanh(z_pos)

    iv1pz = 1.0 / (1.0 + jnp.minimum(z, 0.0)) - 1.0
    frac = jnp.tanh(iv1pz)[..., None]
    col = v + (radiant_energy * blue - v) * frac
    if not old:
        # Energy overflow from clamping is shared back into red+green
        # (cl.cl:5398-5406).
        final_energy = energy_of(jnp.clip(col, 0.0, 1.0))
        real_energy = energy_of(col)
        remaining = (real_energy - final_energy)[..., None]
        col = col.at[..., 0:2].add(remaining * (red + green)[0:2])

    result = jnp.where(z[..., None] > 0, result_red, col)
    return jnp.clip(result, 0.0, 1.0)


def linear_rgb_to_xyz(c: Array) -> Array:
    """cl.cl:5770-5778."""
    r, g, b = c[..., 0], c[..., 1], c[..., 2]
    return jnp.stack(
        [
            0.4124564 * r + 0.3575761 * g + 0.1804375 * b,
            0.2126729 * r + 0.7151522 * g + 0.0721750 * b,
            0.0193339 * r + 0.1191920 * g + 0.9503041 * b,
        ],
        axis=-1,
    )


# DOMINANT_COLOUR anchors (cl.cl:5736-5744): wavelengths and chromaticity
# angles of the sRGB primaries around the white point.  Note: the reference
# (an unused debug variant) pairs r_wavelength with the *blue* primary's
# angle and vice versa — sRGB red sits at angle -0.0108, blue at -2.1616
# (atan2 of xy - 1/3).  The physically consistent pairing is used here.
_R_WL, _G_WL, _B_WL = 612.0, 549.0, 464.0
_R_ANG, _G_ANG, _B_ANG = -0.010759, 1.695013, -2.161580


def dominant_wavelength(lin_rgb: Array) -> Array:
    """Estimate each pixel's dominant wavelength from its chromaticity angle
    around the white point, interpolating between the sRGB primary anchors —
    the reference's ``DOMINANT_COLOUR`` redshift variant (cl.cl:5724-5792),
    with the sector walk cleaned up (the reference's debug-only version has
    crossed red/blue labels).  The purple line (blue..red) lerps through the
    anchors like the reference's fallback branch."""
    xyz = linear_rgb_to_xyz(lin_rgb)
    s = jnp.maximum(xyz.sum(-1), 1e-5)
    xy = xyz[..., :2] / s[..., None]
    v = xy - (1.0 / 3.0)
    a = jnp.arctan2(v[..., 1], v[..., 0])

    two_pi = 2.0 * jnp.pi
    # Normalise so red sits at 0; green and blue follow counterclockwise.
    an = jnp.mod(a - _R_ANG, two_pi)
    g_at = jnp.mod(_G_ANG - _R_ANG, two_pi)   # ~1.706
    b_at = jnp.mod(_B_ANG - _R_ANG, two_pi)   # ~4.132

    wl_rg = _R_WL + (_G_WL - _R_WL) * an / g_at
    wl_gb = _G_WL + (_B_WL - _G_WL) * (an - g_at) / (b_at - g_at)
    wl_br = _B_WL + (_R_WL - _B_WL) * (an - b_at) / (two_pi - b_at)
    return jnp.where(
        an < g_at, wl_rg, jnp.where(an < b_at, wl_gb, wl_br)
    )


def xyz_to_linear_rgb(c: Array) -> Array:
    """Inverse of linear_rgb_to_xyz (sRGB D65)."""
    x, y, z = c[..., 0], c[..., 1], c[..., 2]
    return jnp.stack(
        [
            3.2404542 * x - 1.5371385 * y - 0.4985314 * z,
            -0.9692660 * x + 1.8760108 * y + 0.0415560 * z,
            0.0556434 * x - 0.2040259 * y + 1.0572252 * z,
        ],
        axis=-1,
    )


_WHITE = 1.0 / 3.0  # equal-energy white point, chromaticity.hpp:500-501


def _horseshoe_tables():
    """(unwrapped locus angles about the white point, wavelengths, xy) —
    precomputed once from the CIE 1931 table.  The locus angle decreases
    monotonically with wavelength once unwrapped (the spectral locus winds
    clockwise around the white point from 360 to 830 nm); the arrays are
    stored negated so jnp.interp sees an increasing x-axis."""
    import numpy as np

    from . import cie1931_data as cie

    xy = np.asarray(cie.XY_1NM, dtype=np.float64)
    ang = np.unwrap(np.arctan2(xy[:, 1] - _WHITE, xy[:, 0] - _WHITE))
    assert (np.diff(ang) <= 1e-12).all(), "locus angle not monotone"
    wl = np.arange(cie.WL_START, cie.WL_END + 0.5)
    return (jnp.asarray(-ang, jnp.float32), jnp.asarray(wl, jnp.float32),
            jnp.asarray(xy, jnp.float32))


_TABLES = None


def _tables():
    global _TABLES
    if _TABLES is None:
        _TABLES = _horseshoe_tables()
    return _TABLES


def dominant_wavelength_cie(lin_rgb: Array) -> Array:
    """Dominant wavelength from the full CIE 1931 horseshoe
    (``srgb_to_wavelength``, chromaticity.hpp:536-572): chromaticity angle
    about the equal-energy white point, matched against the spectral-locus
    angles.  Interpolates between 1 nm entries (the reference returns the
    first bracketing entry; its ``as_coordinates`` also double-strides the
    table — ``i += 4`` then ``raw_horseshoe[i * 4]`` — reading every 4th
    row, fixed here).  Non-spectral (purple-line) chromaticities clamp to
    the nearer locus end, where the reference returns -1."""
    neg_ang, wl, _ = _tables()
    xyz = linear_rgb_to_xyz(lin_rgb)
    s = jnp.maximum(xyz.sum(-1), 1e-6)
    xy = xyz[..., :2] / s[..., None]
    a = jnp.arctan2(xy[..., 1] - _WHITE, xy[..., 0] - _WHITE)
    # Shift the query onto the unwrapped locus branch [a_min, a_max]
    # (a_max at 360 nm, a_min = angle at 830 nm, one winding below).
    a_max = -neg_ang[0]
    a_min = -neg_ang[-1]
    q = jnp.where(a <= a_max, a, a - 2.0 * jnp.pi)
    # Purple gap (a_max .. a_min + 2pi): circular-nearest locus end.
    in_gap = (a > a_max) & (a < a_min + 2.0 * jnp.pi)
    gap_mid = 0.5 * (a_max + a_min + 2.0 * jnp.pi)
    q = jnp.where(in_gap, jnp.where(a < gap_mid, a_max, a_min), q)
    return jnp.interp(-q, neg_ang, wl)


def srgb_to_wavelength(srgb: Array) -> Array:
    """chromaticity.hpp:536 behavioural twin (vectorised, bug-fixed)."""
    return dominant_wavelength_cie(srgb_to_lin(srgb))


def wavelength_to_xy(wavelength: Array) -> Array:
    """Spectral-locus chromaticity at ``wavelength`` nm (interpolated)."""
    neg_ang, wl, xy = _tables()
    w = jnp.clip(wavelength, wl[0], wl[-1])
    return jnp.stack([jnp.interp(w, wl, xy[:, 0]),
                      jnp.interp(w, wl, xy[:, 1])], axis=-1)


def spectral_redshift(lin_rgb: Array, z_shift: Array) -> Array:
    """Spectral-shift experiment behind ``--spectral-redshift``: estimate
    each pixel's dominant wavelength and excitation purity from the CIE
    horseshoe, shift the wavelength by 1 + z, and rebuild the colour at the
    shifted locus point with the same purity and the I/nu^3 luminance
    scale.  This is the experiment the reference's unused
    ``srgb_to_wavelength`` (chromaticity.hpp:536) was built toward (the
    shipping model instead hue-mixes toward the red/blue primaries —
    cl.cl:5371-5413); unphysical for broadband sources, as the reference's
    own comment warns (cl.cl:5713)."""
    neg_ang, wl_tab, _ = _tables()
    xyz = linear_rgb_to_xyz(lin_rgb)
    s = jnp.maximum(xyz.sum(-1), 1e-6)
    xy = xyz[..., :2] / s[..., None]
    wl = dominant_wavelength_cie(lin_rgb)
    locus = wavelength_to_xy(wl)
    d_pix = jnp.linalg.norm(xy - _WHITE, axis=-1)
    d_loc = jnp.maximum(jnp.linalg.norm(locus - _WHITE, axis=-1), 1e-6)
    purity = jnp.clip(d_pix / d_loc, 0.0, 1.0)

    wl_obs = jnp.clip(wl * (1.0 + z_shift), wl_tab[0], wl_tab[-1])
    xy_new = _WHITE + purity[..., None] * (wavelength_to_xy(wl_obs) - _WHITE)

    rel_lum = xyz[..., 1]
    # Physical z > -1, but a numerically-overshooting blueshift pixel can
    # dip 1+z to/past zero, where **-3 yields inf/NaN that jnp.clip
    # propagates — floor the base like apply_redshift's clamp.
    new_lum = jnp.clip(
        rel_lum * jnp.maximum(1.0 + z_shift, 1e-3) ** -3, 0.0, 1.0)
    y = jnp.maximum(xy_new[..., 1], 1e-6)
    xyz_new = jnp.stack(
        [xy_new[..., 0] / y * new_lum,
         new_lum,
         (1.0 - xy_new[..., 0] - xy_new[..., 1]) / y * new_lum],
        axis=-1,
    )
    out = jnp.maximum(xyz_to_linear_rgb(xyz_new), 0.0)
    # Out-of-gamut spectral colours: scale into [0, 1] preserving hue.
    peak = jnp.maximum(out.max(-1), 1.0)
    out = out / peak[..., None]
    # Near-black/achromatic pixels keep their colour (wavelength undefined;
    # purity-based because sRGB grey sits at D65, ~0.02 off the equal-energy
    # white the horseshoe angles are measured from).
    keep = (rel_lum < 1e-4) | (purity < 0.1)
    return jnp.where(keep[..., None], jnp.clip(lin_rgb, 0.0, 1.0), out)


def apply_redshift(lin_rgb: Array, z_shift: Array,
                   dominant_colour: bool = False,
                   old: bool = False, spectral: bool = False) -> Array:
    """Full redshift pipeline on linear RGB (cl.cl:5689-5846):
    I/nu^3 Lorentz-invariant luminance rescale at the test wavelength, then
    the hue-shift model.  ``dominant_colour`` estimates a per-pixel test
    wavelength from chromaticity instead of the 555 nm human-vision peak."""
    if spectral:
        return spectral_redshift(lin_rgb, z_shift)
    rel_lum = (
        0.2126 * lin_rgb[..., 0]
        + 0.7152 * lin_rgb[..., 1]
        + 0.0722 * lin_rgb[..., 2]
    )
    if dominant_colour:
        test_wl = dominant_wavelength(lin_rgb)
    else:
        test_wl = 555.0
    # local_wavelength = test / (z+1)  =>  I scales by (z+1)^-3 regardless of
    # the absolute wavelength (cl.cl:5794-5812); the wavelength only matters
    # through future spectral models, kept for parity.
    local_wl = test_wl / (z_shift + 1.0)
    new_rel = jnp.clip(
        rel_lum * (local_wl / test_wl) ** 3, 0.0, 1.0
    )
    scale = jnp.where(rel_lum > 1e-5, new_rel / jnp.maximum(rel_lum, 1e-20), 1.0)
    out = jnp.clip(lin_rgb * scale[..., None], 0.0, 1.0)
    return redshift_colour(out, z_shift, old=old)
