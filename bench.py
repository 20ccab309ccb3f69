"""Driver benchmark: 1080p Kerr (Boyer-Lindquist) rays/s on one TPU chip.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "Mrays/s", "vs_baseline": N}

Baseline: the reference renders 1080p at >= 30 fps on an RX 6700 XT
(README.md:5) = 62.2 Mrays/s at 1 ray/pixel.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_MRAYS = 1920 * 1080 * 30 / 1e6  # 62.2


def main() -> int:
    import jax

    from geodesic_raytracing_tpu.bench_config import flagship_config
    from geodesic_raytracing_tpu.ops.integrate import TraceOptions
    from geodesic_raytracing_tpu.render import background as bg
    from geodesic_raytracing_tpu.render.pipeline import (
        RefineBudgetController,
        RenderSettings,
        render_frame,
    )

    W, H = 1920, 1080
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    metric, params, camera, settings, features = flagship_config(W, H)
    backgrounds = bg.checker_background()

    import jax.numpy as jnp

    # Demand-sized refinement (the reference dispatches exactly its atomic
    # refinement count; the controller re-specialises k across frames).
    controller = RefineBudgetController()

    # One cached program for the sync scalar: un-jitted, the slice + sum
    # dispatch as two tiny host-chained programs per frame over the
    # ~105 ms tunnel.
    sync_scalar = jax.jit(lambda im: jnp.sum(im[::256, ::256]))

    def frame(fetch: bool = False):
        img = render_frame(metric, camera, params, backgrounds, settings,
                           features, controller=controller)
        if fetch:
            return np.asarray(img)
        # Force the computation with a scalar readback (deferred: the caller
        # floats it).  The reference's frame loop never reads the image back
        # either (it stays a GL texture; no_gpu_reads graphics_settings.hpp:36)
        # — and the axon tunnel would otherwise bill ~1 s/frame of transfer.
        return sync_scalar(img)

    try:
        arr = frame(fetch=True)  # compile + first run + sanity fetch
    except Exception as e:  # pallas path unavailable -> XLA fallback
        print(f"pallas path failed ({type(e).__name__}: {e}); "
              "falling back to XLA while-loop", file=sys.stderr)
        settings = RenderSettings(
            width=W, height=H, anisotropy=4,
            trace=TraceOptions(max_steps=16384, method="while"),
        )
        arr = frame(fetch=True)

    assert np.isfinite(arr).all(), "non-finite pixels in bench frame"

    # Pipelined throughput: issue every frame's programs, then drain.  The
    # reference overlaps frames the same way (double-buffered render_state,
    # main.cpp:1463-1510); dispatch is async so a per-frame sync would only
    # measure tunnel latency on top of device time.
    # Warmup until the budget controller settles (its bucket change
    # recompiles the refine chain; that compile must not land in the timed
    # region — the reference likewise benches steady-state frames).
    for _ in range(4):
        float(frame())
    n = max(frames, 4)
    # Best of 3 short passes.  The timed-frame-count A/B
    # (scripts/bench_frames_ab.py, BENCH_NOTES round 5) showed deeper
    # pipelines are WORSE (n=16 runs ~4% slower than n=4: the tunnel's
    # dispatch path backpressures once the queue is deep), so the pass
    # stays at n=4; and axon-tunnel noise is one-sided (host/tunnel
    # contention only ever slows a pass), so the best pass is the least
    # biased estimate of steady-state device throughput.
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sums = [frame() for _ in range(n)]
        for s in sums:
            float(s)
        best_dt = min(best_dt, (time.perf_counter() - t0) / n)
    mrays = W * H / best_dt / 1e6
    print(json.dumps({
        "metric": "kerr_1080p_rays_per_s",
        "value": round(mrays, 4),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
