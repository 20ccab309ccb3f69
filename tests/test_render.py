"""Render-stage units: equirect mapping, mip sampling, EWA, redshift."""

import jax
import jax.numpy as jnp
import numpy as np

from geodesic_raytracing_tpu.render import background as bg
from geodesic_raytracing_tpu.render import colour
from geodesic_raytracing_tpu.render.pipeline import angle_to_tex


def test_angle_to_tex_ranges():
    th = jnp.linspace(0.01, np.pi - 0.01, 7)
    ph = jnp.linspace(-3 * np.pi, 3 * np.pi, 7)
    a = jnp.stack(jnp.meshgrid(th, ph, indexing="ij"), -1).reshape(-1, 2)
    uv = np.asarray(angle_to_tex(a))
    assert (uv >= 0).all() and (uv <= 1).all()
    # theta over the pole folds phi by pi (cl.cl:5087-5092)
    folded = np.asarray(angle_to_tex(jnp.array([[np.pi + 0.3, 0.0]])))
    direct = np.asarray(angle_to_tex(jnp.array([[np.pi - (np.pi - 0.3),
                                                 np.pi]])))
    np.testing.assert_allclose(folded, direct, atol=1e-5)


def test_mip_level0_matches_image():
    img = np.zeros((64, 128, 3), np.float32)
    img[10, 20] = [1.0, 0.5, 0.25]
    b = bg.build_background(img)
    # sample the texel centre of (20, 10) at level 0
    uv = jnp.array([[(20 + 0.5) / 128, (10 + 0.5) / 64]])
    side = jnp.array([0])
    out = np.asarray(bg.read_mipmap(b, side, uv, jnp.array([0.0])))
    np.testing.assert_allclose(out[0], [1.0, 0.5, 0.25], atol=1e-5)


def test_two_sided_background():
    img = np.zeros((32, 64, 3), np.float32)
    img[..., 0] = 1.0  # side 0 red... (build flips: side index selects)
    img2 = np.zeros((32, 64, 3), np.float32)
    img2[..., 2] = 1.0
    b = bg.build_background(img, img2)
    uv = jnp.array([[0.5, 0.5]])
    # side >= 1 samples the PRIMARY background (cl.cl:5450); side 0 = the
    # far-side universe.
    primary = np.asarray(bg.read_mipmap(b, jnp.array([1]), uv,
                                        jnp.array([0.0])))
    far = np.asarray(bg.read_mipmap(b, jnp.array([0]), uv, jnp.array([0.0])))
    np.testing.assert_allclose(primary[0], [1, 0, 0], atol=1e-5)
    np.testing.assert_allclose(far[0], [0, 0, 1], atol=1e-5)


def test_ewa_uniform_field_invariant():
    """EWA over a constant-colour sky must return that colour regardless of
    the anisotropy of the mapping."""
    img = np.full((64, 128, 3), 0.4, np.float32)
    b = bg.build_background(img)
    H, W = 16, 16
    rng = np.random.default_rng(0)
    tex = jnp.asarray(rng.random((H, W, 2)), dtype=jnp.float32)
    side = jnp.ones((H, W), jnp.int32)
    out = np.asarray(bg.sample_anisotropic(b, tex, side, max_probes=8))
    np.testing.assert_allclose(out, 0.4, atol=1e-4)


def test_redshift_extremes():
    rgb = jnp.array([[0.5, 0.5, 0.5]])
    # Large blueshift (z -> -1) brightens towards blue; large redshift dims.
    red = np.asarray(colour.apply_redshift(rgb, jnp.array([5.0])))
    blue = np.asarray(colour.apply_redshift(rgb, jnp.array([-0.9])))
    none = np.asarray(colour.apply_redshift(rgb, jnp.array([0.0])))
    np.testing.assert_allclose(none, np.asarray(rgb), atol=1e-3)
    # redshifted: dimmer overall, red-dominant
    assert red.sum() < none.sum()
    assert red[0, 0] >= red[0, 2]
    # blueshifted: blue-dominant
    assert blue[0, 2] >= blue[0, 0]


def test_dominant_wavelength_orders_primaries():
    wl_r = float(colour.dominant_wavelength(jnp.array([[0.9, 0.05, 0.05]]))[0])
    wl_g = float(colour.dominant_wavelength(jnp.array([[0.05, 0.9, 0.05]]))[0])
    wl_b = float(colour.dominant_wavelength(jnp.array([[0.05, 0.05, 0.9]]))[0])
    assert wl_r > wl_g > wl_b
    assert 600 < wl_r < 625
    assert 540 < wl_g < 560
    assert 455 < wl_b < 475


def test_srgb_roundtrip():
    x = jnp.linspace(0.0, 1.0, 64)
    y = colour.srgb_to_lin(colour.lin_to_srgb(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)
