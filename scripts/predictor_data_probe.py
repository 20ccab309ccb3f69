"""Fetch the raw signals available for quarter-pass cost prediction:
the prepass small maps, each quarter ray's launch state, and the true
committed step counts.  Offline experiments (BENCH_NOTES) rank candidate
predictors against the oracle.
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> int:
    from geodesic_raytracing_tpu.bench_config import (
        flagship_config,
        prepass_and_quarter,
    )
    from geodesic_raytracing_tpu.render import pipeline as pl

    metric, params, camera, settings, features = flagship_config()
    dead, psteps, qstate0, ku, iquat, f_in_x, qcost = prepass_and_quarter(
        metric, camera, params, settings, features)
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
