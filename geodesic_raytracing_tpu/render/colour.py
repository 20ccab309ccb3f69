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


def redshift_colour(v: Array, z: Array) -> Array:
    """Map the shift z in [-1, +inf] onto a red/blue hue mix while conserving
    estimated radiant energy (``redshift()`` cl.cl:5371-5413, the
    ``use_old_redshift = false`` path)."""
    radiant_energy = energy_of(v)[..., None]
    red = jnp.array([1.0 / 0.2125, 0.0, 0.0])
    green = jnp.array([0.0, 1.0 / 0.7154, 0.0])
    blue = jnp.array([0.0, 0.0, 1.0 / 0.0721])

    z_pos = jnp.maximum(z, 0.0)[..., None]
    result_red = v + (radiant_energy * red - v) * jnp.tanh(z_pos)

    iv1pz = 1.0 / (1.0 + jnp.minimum(z, 0.0)) - 1.0
    frac = jnp.tanh(iv1pz)[..., None]
    col = v + (radiant_energy * blue - v) * frac
    # Energy overflow from clamping is shared back into red+green
    # (cl.cl:5398-5406).
    final_energy = energy_of(jnp.clip(col, 0.0, 1.0))
    real_energy = energy_of(col)
    remaining = (real_energy - final_energy)[..., None]
    col = col.at[..., 0:2].add(remaining * (red + green)[0:2])

    result = jnp.where(z[..., None] > 0, result_red, col)
    return jnp.clip(result, 0.0, 1.0)


def apply_redshift(lin_rgb: Array, z_shift: Array) -> Array:
    """Full redshift pipeline on linear RGB (cl.cl:5689-5846):
    I/nu^3 Lorentz-invariant luminance rescale at the reference wavelength
    (555 nm, the peak of human vision), then the hue-shift model."""
    rel_lum = (
        0.2126 * lin_rgb[..., 0]
        + 0.7152 * lin_rgb[..., 1]
        + 0.0722 * lin_rgb[..., 2]
    )
    # local_wavelength / test_wavelength = 1 / (z + 1)  =>  factor (z+1)^-3.
    new_rel = jnp.clip(rel_lum / (z_shift + 1.0) ** 3, 0.0, 1.0)
    scale = jnp.where(rel_lum > 1e-5, new_rel / jnp.maximum(rel_lum, 1e-20), 1.0)
    out = jnp.clip(lin_rgb * scale[..., None], 0.0, 1.0)
    return redshift_colour(out, z_shift)
