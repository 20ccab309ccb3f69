"""Sync-isolated qtrace/rtrace wall time across Pallas tile sizes.

The offline divergence model (stage_bench.py --save-npz + the analysis in
BENCH_NOTES) predicts executed tile-steps per (tile, packing); this measures
the real kernel, which adds per-grid-step overheads the model ignores.

Usage:
    python scripts/trace_tile_bench.py [--tiles 512,1024,2048] [--frames N]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time

import numpy as np


def sync(x):
    import jax

    leaf = jax.tree.leaves(x)[0]
    return np.asarray(leaf.reshape(-1)[:1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--tiles", default="512,1024,2048")
    ap.add_argument("--ce", default="8",
                    help="comma list of check_every values to sweep")
    ap.add_argument("--unroll", default="1",
                    help="comma list of inner-loop unroll factors")
    ap.add_argument("--block-tiles", default="1",
                    help="comma list of tiles-per-grid-step values")
    ap.add_argument("--oracle", action="store_true",
                    help="pack by true step counts (the steady state of the "
                         "cross-frame feedback key) instead of prepass/"
                         "quarter estimates")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from geodesic_raytracing_tpu.bench_config import (
        flagship_config,
        prepass_and_quarter,
    )
    from geodesic_raytracing_tpu.render import pipeline as pl

    W, H = 1920, 1080
    metric, params, camera, settings, features = flagship_config(W, H)
    nq = (W // 2) * (H // 2)

    _, _, qstate0, ku, iquat, f_in_x, qcost = prepass_and_quarter(
        metric, camera, params, settings, features)
    qstate = pl._trace_phases(metric, qstate0, params, settings, features,
                              qcost, f_in_x)
    k = max(min(nq, 1024), (int(nq * settings.refine_budget) // 8) * 8)
    (qr, should, _demand, sel, dest, rstate0, rku, riquat, rf_in_x,
     rcost) = pl._refine_setup_jit(metric, camera, params, settings,
                                   features, qstate, ku, iquat, k)

    if args.oracle:
        qcost = qstate.steps.astype(np.float32)
        rfin = pl._trace_phases(metric, rstate0, params, settings, features,
                                rcost, rf_in_x)
        rcost = rfin.steps.astype(np.float32)
        sync(rcost)

    import itertools

    combos = itertools.product(
        (int(t) for t in args.tiles.split(",")),
        (int(c) for c in args.ce.split(",")),
        (int(u) for u in args.unroll.split(",")),
        (int(b) for b in args.block_tiles.split(",")),
    )
    for tile, ce, unroll, bt in combos:
            tsettings = dataclasses.replace(
                settings, trace=dataclasses.replace(
                    settings.trace, tile=tile, check_every=ce,
                    unroll=unroll, block_tiles=bt))

            def qtrace():
                return pl._trace_phases(metric, qstate0, params, tsettings,
                                        features, qcost, f_in_x)

            def rtrace():
                return pl._trace_phases(metric, rstate0, params, tsettings,
                                        features, rcost, rf_in_x)

            for name, fn in (("qtrace", qtrace), ("rtrace", rtrace)):
                sync(fn())  # compile + settle
                ts = []
                for _ in range(args.frames):
                    sync(fn())
                    t0 = time.perf_counter()
                    sync(fn())
                    ts.append(time.perf_counter() - t0)
                print(f"tile {tile:5d} ce {ce:3d} unroll {unroll} "
                      f"bt {bt:2d} {name} "
                      f"{float(np.median(ts)):7.3f} s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
