"""Measure how well mid-trace state predicts remaining ray cost.

Runs the production quarter launch for 256 steps, snapshots the surviving
rays' state, finishes the trace, then models phase-2 tile packing under
different sort keys (offline).  The prize: oracle packing of the production
launches is worth ~25 ms/frame over the prepass-cost sort (BENCH_NOTES).

Usage: python scripts/phase_predictor_probe.py
"""

from __future__ import annotations

import dataclasses
import sys

import numpy as np


def main() -> int:
    from geodesic_raytracing_tpu.bench_config import (
        flagship_config,
        prepass_and_quarter,
    )
    from geodesic_raytracing_tpu.render import pipeline as pl

    metric, params, camera, settings, features = flagship_config()
    _, _, qstate0, ku, iquat, f_in_x, qcost = prepass_and_quarter(
        metric, camera, params, settings, features)

    s256 = dataclasses.replace(settings, trace=dataclasses.replace(
        settings.trace, max_steps=256))
    mid = pl._trace_phases(metric, qstate0, params, s256, features, qcost,
                           f_in_x)
    fin = pl._trace_phases(metric, qstate0, params, settings, features,
                           qcost, f_in_x)

    polar_mid = metric.to_polar(mid.position.T, params)

    np.savez("/tmp/phase_probe.npz",
             status0=np.asarray(qstate0.status),
             qcost=np.asarray(qcost),
             mid_status=np.asarray(mid.status),
             mid_steps=np.asarray(mid.steps),
             mid_ds=np.asarray(mid.next_ds),
             mid_r=np.asarray(polar_mid[1]),
             fin_steps=np.asarray(fin.steps))
    print("saved /tmp/phase_probe.npz")
    return 0


if __name__ == "__main__":
    sys.exit(main())
