"""Adaptive-sampling pipeline (the production bench path): quarter trace +
prepass kill + budgeted refinement + assembly must reproduce the dense
render (handle_adaptive_sampling cl.cl:5223-5344 semantics: refined blocks
exact, interpolated blocks only below the angular-error threshold)."""

import dataclasses

import numpy as np

from geodesic_raytracing_tpu import metrics
from geodesic_raytracing_tpu.camera import Camera
from geodesic_raytracing_tpu.ops.integrate import TraceOptions
from geodesic_raytracing_tpu.render import background as bg
from geodesic_raytracing_tpu.render import pipeline as pl


def _frames(name, **adaptive_kw):
    m = metrics.get_metric(name)
    cam = Camera.default().rotate(pitch=-np.pi / 2)
    b = bg.checker_background(128, 256)
    base = pl.RenderSettings(width=64, height=64, anisotropy=2,
                             trace=TraceOptions(max_steps=4096))
    dense = pl.render_frame(m, cam, m.params(), b, base)
    adap = pl.render_frame(
        m, cam, m.params(), b,
        dataclasses.replace(base, adaptive_sampling=True, **adaptive_kw))
    return np.asarray(dense), np.asarray(adap)


def test_adaptive_matches_dense_kerr():
    dense, adap = _frames("kerr_boyer")
    assert np.isfinite(adap).all()
    # Refined/traced pixels are exact; interpolated ones sit below the
    # angular threshold, so the images must agree except on a small
    # fraction of edge pixels.
    d = np.abs(dense - adap).max(axis=-1)
    assert (d > 0.1).mean() < 0.06, (d > 0.1).mean()
    assert np.median(d) < 1e-3


def test_adaptive_full_budget_schwarzschild():
    dense, adap = _frames("schwarzschild", refine_budget=1.0)
    d = np.abs(dense - adap).max(axis=-1)
    # Full budget: every block refines -> odd/even-offset pixels traced
    # exactly; only interpolated-but-below-threshold cells may differ.
    assert (d > 0.1).mean() < 0.05, (d > 0.1).mean()


def test_prepass_kill_upsample_semantics():
    """The shift+repeat upsample must match the per-ray probe definition
    (round-indexed 5-neighbour AND) it replaced."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    W, H = 64, 48
    pw, ph = W // 16, H // 16
    dead = rng.random((ph, pw)) < 0.5
    got = np.asarray(
        pl._prepass_kill(jnp.asarray(dead), W, H, W // 2, H // 2)
    ).reshape(H // 2, W // 2)

    qx = 2.0 * np.arange(W // 2)
    qy = 2.0 * np.arange(H // 2)
    lx = np.clip(np.round(qx / W * pw).astype(int), 0, pw - 1)
    ly = np.clip(np.round(qy / H * ph).astype(int), 0, ph - 1)

    def probe(dx, dy):
        xx = np.clip(lx[None, :] + dx, 0, pw - 1)
        yy = np.clip(ly[:, None] + dy, 0, ph - 1)
        inb = ((lx[None, :] + dx >= 0) & (lx[None, :] + dx <= pw - 1)
               & (ly[:, None] + dy >= 0) & (ly[:, None] + dy <= ph - 1))
        return np.where(inb, dead[yy, xx], False)

    want = (probe(-1, 0) & probe(0, 0) & probe(1, 0) & probe(0, -1)
            & probe(0, 1))
    # Interior must match exactly; the border row/column may differ (the
    # upsample clamps instead of declaring out-of-bounds un-killable).
    assert (got[1:-1, 1:-1] == want[1:-1, 1:-1]).all()
