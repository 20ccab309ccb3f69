"""TPU smoke + microbench for the queue_depth lane-queue kernel.

Traces the SAME production-shaped Kerr quarter-ray set with queue_depth
in {1, K...} and compares wall time and final-state agreement.  One
Pallas program per launch (chained from the host per CLAUDE.md).

Usage: python scripts/queue_smoke.py [--cpu] [--n 262144] [--depths 1,4,8]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def sync(x):
    import jax

    leaf = jax.tree.leaves(x)[0]
    return np.asarray(leaf.reshape(-1)[:1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--depths", default="1,4,8")
    ap.add_argument("--tile", type=int, default=2048)
    ap.add_argument("--ce", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax.numpy as jnp

    from geodesic_raytracing_tpu.bench_config import (flagship_config,
                                                      prepass_and_quarter)
    from geodesic_raytracing_tpu.ops import integrate
    from geodesic_raytracing_tpu.render import pipeline as pl

    metric, params, camera, settings, features = flagship_config(
        args.width, args.height)
    # quarter-ray set exactly as production builds it (prepass kill + cost)
    dead, psteps, qstate0, ku, iquat, f_in_x, qcost = prepass_and_quarter(
        metric, camera, params, settings, features)
    n = qstate0.position.shape[0]
    print(f"quarter rays: {n}", flush=True)

    finals = {}
    for d in [int(x) for x in args.depths.split(",")]:
        opts = dataclasses.replace(settings.trace, tile=args.tile,
                                   check_every=args.ce, queue_depth=d)

        @jax.jit
        def run(st, cost, fx):
            return integrate.trace_rays(metric, st, params,
                                        features=features, opts=opts,
                                        sort_key=cost, f_in_x=fx)

        t0 = time.perf_counter()
        fin = run(qstate0, qcost, f_in_x)
        sync(fin)
        print(f"K={d}: first call (incl. compile) "
              f"{time.perf_counter()-t0:.1f} s", flush=True)
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            sync(run(qstate0, qcost, f_in_x))
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts))
        com = int(np.asarray(fin.steps.astype(jnp.int64).sum()))
        print(f"K={d}: {t*1e3:8.1f} ms   committed {com/1e6:.1f} Msteps "
              f"({com/t/1e9:.2f} Gsteps/s committed)", flush=True)
        finals[d] = fin

    base = finals.get(1)
    if base is not None:
        bs = np.asarray(base.status)
        for d, fin in finals.items():
            if d == 1:
                continue
            s = np.asarray(fin.status)
            mism = (s != bs).mean()
            esc = bs == integrate.ESCAPED
            dp = np.abs(np.asarray(fin.position)[esc]
                        - np.asarray(base.position)[esc]).max() if esc.any() \
                else 0.0
            print(f"K={d}: status mismatch {mism:.5f}, "
                  f"max |dpos| escaped {dp:.2e}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
