"""A/B the bench protocol's timed frame count (pipeline-fill amortization).

The driver protocol (`python bench.py`) times n=4 pipelined frames after a
4-frame warmup.  The timed region's wall = pipeline fill (dispatch issue +
first-frame tunnel latency) + n * steady-state frame, so per-frame time
carries a fill/n term.  This script measures the same protocol at
interleaved frame counts within ONE process/session (shared compiles, same
tunnel conditions) to separate steady-state throughput from the fill term.

Usage: python scripts/bench_frames_ab.py [--counts 4,16,4,16]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--counts", default="4,16,4,16,4,16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from geodesic_raytracing_tpu.bench_config import flagship_config
    from geodesic_raytracing_tpu.render import background as bg
    from geodesic_raytracing_tpu.render.pipeline import (
        RefineBudgetController,
        render_frame,
    )

    W, H = 1920, 1080
    metric, params, camera, settings, features = flagship_config(W, H)
    backgrounds = bg.checker_background()
    controller = RefineBudgetController()
    sync_scalar = jax.jit(lambda im: jnp.sum(im[::256, ::256]))

    def frame():
        img = render_frame(metric, camera, params, backgrounds, settings,
                           features, controller=controller)
        return sync_scalar(img)

    img = render_frame(metric, camera, params, backgrounds, settings,
                       features, controller=controller)
    arr = np.asarray(img)
    assert np.isfinite(arr).all()
    for _ in range(4):
        float(frame())

    for n in [int(v) for v in args.counts.split(",")]:
        t0 = time.perf_counter()
        sums = [frame() for _ in range(n)]
        t_issue = time.perf_counter() - t0
        for s in sums:
            float(s)
        dt = (time.perf_counter() - t0) / n
        mrays = W * H / dt / 1e6
        print(f"n={n:3d}  {dt*1e3:7.1f} ms/frame  {mrays:6.2f} Mrays/s  "
              f"(issue {t_issue*1e3:.0f} ms)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
