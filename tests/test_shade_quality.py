"""Production shade-quality gate (VERDICT r3 item 6).

The shipping shade path compounds three economies over the reference's
full-quality behaviour (cl.cl:5453-5687 shades EVERY pixel from
interpolated render data with up-to-anisotropy bilinear probes and
trilinear mips):

  * traced-only shading — RGB-bilinear interpolation on smooth blocks,
  * demand-matched probe tiers (sorted prefix, nearest-texel probes),
  * nearest-mip base taps (``trilinear=False``).

Each was validated in isolation on synthetic harnesses
(scripts/shade_quality.py); this test pins their COMPOUND effect
end-to-end at render scale against the full-quality shade of the very
same traced rays, so a future economy cannot silently stack on top of
the existing ones.  Thresholds carry the measured round-4 margins
(recorded in BENCH_NOTES.md); they are quality numbers, not fp
tolerances — a legitimate new economy that moves them must re-record
its own margin.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest

from conftest import tier

from geodesic_raytracing_tpu import metrics
from geodesic_raytracing_tpu.bench_config import (
    PRODUCTION_PROBE_SEGMENTS,
    PRODUCTION_REFINE_SEGMENTS,
)
from geodesic_raytracing_tpu.camera import Camera
from geodesic_raytracing_tpu.ops.integrate import TraceOptions
from geodesic_raytracing_tpu.render import background as bg
from geodesic_raytracing_tpu.render import pipeline as pl

# (metric, RMSE limit 0-255, bad-pixel-fraction limit at |diff| > 16).
# Round-4 measured values at 256^2 (SUITE_FULL tier): see BENCH_NOTES
# "shade-quality gate"; limits are ~1.5x the measured margin.
CASES = [
    ("kerr_boyer", 6.0, 0.02),
    ("schwarzschild", 6.0, 0.02),
    ("ellis_drainhole", 6.0, 0.02),
]


def _renders(name: str):
    size = tier(96, 256)
    m = metrics.get_metric(name)
    cam = Camera.default().rotate(pitch=-np.pi / 2)
    backgrounds = bg.checker_background()
    production = pl.RenderSettings(
        width=size, height=size,
        anisotropy=8,
        probe_segments=PRODUCTION_PROBE_SEGMENTS,
        refine_probe_segments=PRODUCTION_REFINE_SEGMENTS,
        trilinear=False,
        shade_traced_only=True,
        adaptive_sampling=True,
        trace=TraceOptions(max_steps=tier(2048, 8192), method="while"),
    )
    # Reference-behaviour quality ceiling on the SAME adaptive trace:
    # full-res shade from interpolated render data, flat 7-probe budget
    # for every pixel, bilinear probes, trilinear mips.
    full = dataclasses.replace(
        production,
        probe_segments=((1.0, 7),),
        refine_probe_segments=(),
        trilinear=True,
        probe_bilinear=True,
        shade_traced_only=False,
    )
    img_p = np.asarray(pl.render_frame(m, cam, m.params(), backgrounds,
                                       production))
    img_f = np.asarray(pl.render_frame(m, cam, m.params(), backgrounds,
                                       full))
    return img_p, img_f


@pytest.mark.parametrize("name,rmse_lim,bad_lim", CASES)
def test_production_shade_quality(name, rmse_lim, bad_lim):
    img_p, img_f = _renders(name)
    assert np.isfinite(img_p).all() and np.isfinite(img_f).all()
    d = np.abs(img_p.astype(np.float64) - img_f.astype(np.float64)) * 255.0
    rmse = float(np.sqrt((d ** 2).mean()))
    bad = float((d.max(axis=-1) > 16.0).mean())
    assert rmse < rmse_lim and bad < bad_lim, (
        f"{name}: production shade vs full-quality shade RMSE {rmse:.2f} "
        f"(limit {rmse_lim}), bad-frac {bad:.4f} (limit {bad_lim}) — a "
        "shade economy has compounded past the recorded margin"
    )
