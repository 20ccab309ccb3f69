"""The flagship benchmark configuration (1080p Kerr Boyer-Lindquist) and
its adaptive-pipeline prefix, shared by ``bench.py`` and the measurement
scripts in ``scripts/`` — production tuning lives HERE only (a stale copy
in one script silently benches the wrong config).

Reference bench analogue: ``RelativityWorkshop.exe -bench kerr_boyer``
(main.cpp:970-986) with the defaults of graphics_settings.hpp:8-47.
"""

from __future__ import annotations

import dataclasses

import numpy as np


# Production trace tuning (shared with cli.py's TPU default).  See
# BENCH_NOTES.md for the measurements behind every value.
# GRT_QUEUE_DEPTH overrides the lane-queue compaction depth for A/B runs.
def production_trace(max_steps: int = 16384):
    import os

    from .ops.integrate import TraceOptions

    qd_env = os.environ.get("GRT_QUEUE_DEPTH")
    qd = int(qd_env) if qd_env is not None else 4
    if qd_env is not None and qd != 4:
        # A leftover export from an A/B session silently changing the
        # production kernel config would poison bench numbers — say so.
        print(f"[bench_config] GRT_QUEUE_DEPTH={qd} overrides the "
              "production queue depth (default 4)")
    fuse_env = os.environ.get("GRT_FUSE_SETUP")
    fuse = bool(int(fuse_env)) if fuse_env is not None else True
    if fuse_env is not None and not fuse:
        print("[bench_config] GRT_FUSE_SETUP=0: setup stages dispatched as "
              "separate programs (A/B mode)")
    cse_env = os.environ.get("GRT_STEP_CSE")
    scse = bool(int(cse_env)) if cse_env is not None else True
    if cse_env is not None and not scse:
        print("[bench_config] GRT_STEP_CSE=0: kernel step CSE off (A/B)")
    return TraceOptions(max_steps=max_steps, method="pallas", tile=2048,
                        check_every=16, queue_depth=qd, fuse_setup=fuse,
                        step_cse=scse)


# Demand-matched EWA probe schedules — see the comment in flagship_config.
# Round 3 (VERDICT r2 item 7): the 3-probe mid tier was measured
# inefficient — widening the 7-probe tier to the top 11% and dropping the
# mid tier entirely is BOTH cheaper and better on the synthetic-warp
# quality harness (rows/px 1.93 -> 1.87, RMSE_hot 0.0363 -> 0.0325-0.0346;
# sweep in scripts/shade_quality.py's harness: ((.09,7)) loses quality,
# ((.13,7))/((.11,9)) cost more with no gain, 2-tier variants cost 2.08).
PRODUCTION_PROBE_SEGMENTS = ((0.11, 7),)
# The refine shade set (traced-only shading) concentrates at terminator
# edges: measured want-probe demand on the flagship frame is 38% >= 8
# probes, 49% >= 2 (scripts/stage_bench.py r-set line), vs 7.2%/35% for the
# image-wide distribution the quarter tiers serve.
PRODUCTION_REFINE_SEGMENTS = ((0.38, 7), (0.11, 3))


def flagship_config(width: int = 1920, height: int = 1080):
    """Returns ``(metric, params, camera, settings, features)`` for the
    production 1080p Kerr bench frame."""
    from . import metrics
    from .camera import Camera
    from .ops.integrate import Features
    from .render.pipeline import RenderSettings

    metric = metrics.get_metric("kerr_boyer")
    params = metric.params()
    camera = Camera.default().rotate(pitch=-np.pi / 2)
    settings = RenderSettings(
        width=width,
        height=height,
        # Reference default anisotropy (graphics_settings.hpp:34), served by
        # a demand-matched probe schedule: measured Kerr-frame probe demand
        # is 7.2% of pixels >= 8 probes, 18% >= 3, 35% >= 2, so the sorted
        # prefix tiers cost fewer gathers than a flat 4-probe budget while
        # resolving the full anisotropy where it matters.  Counts are ODD
        # (the reference's probe walk — cl.cl:5646-5657, mirrored here —
        # starts even counts at -ip-1, sampling only the negative half of
        # the major axis, so an even tier wastes its gathers), and the
        # marginal 2-probe tier is dropped: scripts/shade_quality.py
        # measures 2-point probing WORSE than the isotropic major-axis
        # fallback (RMSE_hot 0.0437 -> 0.0363 while 2.46 -> 1.93 gather
        # rows/px vs the old (.072,8)(.11,4)(.17,2) schedule).
        anisotropy=8,
        probe_segments=PRODUCTION_PROBE_SEGMENTS,
        refine_probe_segments=PRODUCTION_REFINE_SEGMENTS,
        trilinear=False,
        adaptive_sampling=True,  # reference default (main.cpp:1152)
        trace=production_trace(),
    )
    return metric, params, camera, settings, Features.for_metric(metric)


def prepass_and_quarter(metric, camera, params, settings, features):
    """The adaptive pipeline's prefix: prepass maps + quarter-ray setup.

    Returns ``(dead, psteps, qstate0, ku, iquat, f_in_x, qcost)`` — the
    operands of the quarter trace, as produced in production
    (render.pipeline.render_data_adaptive).
    """
    from .render import pipeline as pl

    W, H = settings.width, settings.height
    dead = psteps = None
    if metric.config.use_prepass:
        pw = max(W // settings.prepass_scale, 4)
        ph = max(H // settings.prepass_scale, 4)
        psettings = dataclasses.replace(settings, width=pw, height=ph,
                                        adaptive_sampling=False)
        dead, psteps = pl._prepass_dead_map(metric, camera, params,
                                            psettings, features)
    qstate0, ku, iquat, f_in_x, qcost = pl._quarter_setup_jit(
        metric, camera, params, settings, features, dead, psteps)
    return dead, psteps, qstate0, ku, iquat, f_in_x, qcost
