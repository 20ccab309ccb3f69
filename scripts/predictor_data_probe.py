"""Fetch the raw signals available for quarter-pass cost prediction:
the prepass small maps, each quarter ray's launch state, and the true
committed step counts.  Offline experiments (BENCH_NOTES) rank candidate
predictors against the oracle.
"""

from __future__ import annotations

import dataclasses
import sys

import numpy as np


def main() -> int:
    from geodesic_raytracing_tpu import metrics
    from geodesic_raytracing_tpu.camera import Camera
    from geodesic_raytracing_tpu.ops.integrate import Features, TraceOptions
    from geodesic_raytracing_tpu.render import pipeline as pl

    W, H = 1920, 1080
    metric = metrics.get_metric("kerr_boyer")
    params = metric.params()
    camera = Camera.default().rotate(pitch=-np.pi / 2)
    settings = pl.RenderSettings(
        width=W, height=H, adaptive_sampling=True,
        trace=TraceOptions(max_steps=16384, method="pallas", tile=2048,
                           check_every=16),
    )
    features = Features.for_metric(metric)

    pw = max(W // settings.prepass_scale, 4)
    ph = max(H // settings.prepass_scale, 4)
    psettings = dataclasses.replace(settings, width=pw, height=ph,
                                    adaptive_sampling=False)
    dead, psteps = pl._prepass_dead_map(metric, camera, params, psettings,
                                        features)
    qstate0, ku, iquat, f_in_x, qcost = pl._quarter_setup_jit(
        metric, camera, params, settings, features, dead, psteps)
    fin = pl._trace_phases(metric, qstate0, params, settings, features,
                           qcost, f_in_x)

    np.savez("/tmp/predictor_data.npz",
             pre_dead=np.asarray(dead), pre_steps=np.asarray(psteps),
             q_ds0=np.asarray(qstate0.next_ds),
             q_status0=np.asarray(qstate0.status),
             q_pos0=np.asarray(qstate0.position),
             qcost=np.asarray(qcost),
             fin_steps=np.asarray(fin.steps))
    print("saved /tmp/predictor_data.npz")
    return 0


if __name__ == "__main__":
    sys.exit(main())
