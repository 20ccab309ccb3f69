"""Sync-isolated per-stage timings + tile-divergence diagnostics for the
adaptive 1080p Kerr frame (the bench.py configuration).

Usage:
    python scripts/stage_bench.py [--cpu] [--frames N]

Prints one line per stage (median of N frames) and a divergence table:
executed tile-iterations vs committed steps for the quarter and refine
traces under the production bucket packing.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time

import numpy as np


def sync(x):
    """Force completion observable through the axon tunnel: fetch one
    element (block_until_ready is a no-op over the tunnel)."""
    import jax

    leaf = jax.tree.leaves(x)[0]
    return np.asarray(leaf.reshape(-1)[:1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from geodesic_raytracing_tpu import metrics
    from geodesic_raytracing_tpu.camera import Camera
    from geodesic_raytracing_tpu.ops import integrate
    from geodesic_raytracing_tpu.ops.integrate import Features, TraceOptions
    from geodesic_raytracing_tpu.render import background as bg
    from geodesic_raytracing_tpu.render import pipeline as pl

    W, H = args.width, args.height
    metric = metrics.get_metric("kerr_boyer")
    params = metric.params()
    camera = Camera.default().rotate(pitch=-np.pi / 2)
    backgrounds = bg.checker_background()
    settings = pl.RenderSettings(
        width=W, height=H, anisotropy=4, trilinear=False,
        adaptive_sampling=True,
        trace=TraceOptions(max_steps=16384, method="pallas", tile=2048),
    )
    features = Features.for_metric(metric)

    Wh, Hh = W // 2, H // 2
    qyy, qxx = np.meshgrid(
        2.0 * np.arange(Hh, dtype=np.float32),
        2.0 * np.arange(Wh, dtype=np.float32), indexing="ij",
    )
    qcx = jnp.asarray(qxx.reshape(-1))
    qcy = jnp.asarray(qyy.reshape(-1))

    def stage_prepass():
        pw = max(W // settings.prepass_scale, 4)
        ph = max(H // settings.prepass_scale, 4)
        ps = dataclasses.replace(settings, width=pw, height=ph,
                                 adaptive_sampling=False)
        return pl._prepass_dead_map(metric, camera, params, ps, features)

    dead, psteps = stage_prepass()
    kill = pl._prepass_kill(dead, qcx, qcy, W, H)
    qcost = pl._prepass_cost(psteps, qcx, qcy, W, H)

    def stage_quarter():
        return pl._traced_rdata_for_pixels(
            metric, camera, params, settings, features, qcx, qcy, kill, qcost)

    qr = stage_quarter()
    qg = pl.RenderData(*(f.reshape((Hh, Wh) + f.shape[1:]) for f in qr))
    should = pl._adaptive_should_sample(qg, settings)

    offsets = ((1, 0), (0, 1), (1, 1))
    rcx = jnp.concatenate([qcx + ox for ox, oy in offsets])
    rcy = jnp.concatenate([qcy + oy for ox, oy in offsets])
    rkill = ~jnp.concatenate([should.reshape(-1)] * 3)
    qsteps = qg.steps
    qce = jnp.maximum(
        jnp.maximum(qsteps, jnp.roll(qsteps, -1, axis=1)),
        jnp.maximum(jnp.roll(qsteps, -1, axis=0),
                    jnp.roll(qsteps, (-1, -1), axis=(0, 1))),
    ).astype(jnp.float32).reshape(-1)
    rcost = jnp.concatenate([qce] * 3)

    def stage_refine():
        return pl._traced_rdata_for_pixels(
            metric, camera, params, settings, features, rcx, rcy, rkill,
            rcost)

    rr = stage_refine()
    nq = Wh * Hh
    rparts = [
        pl.RenderData(*(f[i * nq:(i + 1) * nq].reshape((Hh, Wh) +
                                                       f.shape[1:])
                        for f in rr))
        for i in range(3)
    ]

    def stage_assemble():
        return pl._adaptive_assemble(qg, rparts[0], rparts[1], rparts[2],
                                     should, settings)

    rdata = stage_assemble()

    def stage_shade():
        return pl._shade_jit(rdata, backgrounds, settings)

    img = stage_shade()
    assert np.isfinite(np.asarray(img[::128, ::128])).all()

    stages = {
        "prepass": stage_prepass,
        "quarter": stage_quarter,
        "refine": stage_refine,
        "assemble": stage_assemble,
        "shade": stage_shade,
    }
    for name, fn in stages.items():
        ts = []
        for _ in range(args.frames):
            sync(fn())  # drain anything pending
            t0 = time.perf_counter()
            sync(fn())
            ts.append(time.perf_counter() - t0)
        print(f"{name:10s} {float(np.median(ts)):7.3f} s")

    # ----- divergence diagnostics ---------------------------------------
    # Reproduce the production packing for each trace stage and compare
    # executed tile-iterations (tile max, rounded up to CHECK_EVERY) with
    # committed steps.
    from geodesic_raytracing_tpu.ops.pallas import raymarch

    def divergence(tag, steps, dead, cost, tile):
        steps = np.asarray(steps)
        perm, _ = raymarch._bucket_partition(
            jnp.asarray(dead), None if cost is None
            else jnp.asarray(cost, jnp.float32))
        s = steps[np.asarray(perm)]
        n_pad = -(-s.size // tile) * tile
        s = np.pad(s, (0, n_pad - s.size))
        tiles = s.reshape(-1, tile)
        per_tile_max = tiles.max(axis=1)
        executed = (np.ceil(per_tile_max / 8) * 8 * tile).sum()
        committed = steps.sum()
        print(f"{tag:10s} committed {committed/1e6:8.1f} Msteps   "
              f"executed {executed/1e6:8.1f}   waste x"
              f"{executed/max(committed,1):.2f}")
        # Per-tile occupancy histogram of the 10 worst tiles
        occ = tiles.mean(axis=1) / np.maximum(per_tile_max, 1)
        worst = np.argsort(occ)[:10]
        print(f"           tile occupancy mean {occ.mean():.3f}  "
              f"p10 {np.percentile(occ, 10):.3f}  "
              f"worst tiles max={per_tile_max[worst][:5]}")

    qdead = np.asarray(kill) if kill is not None else np.zeros(nq, bool)
    divergence("quarter", qr.steps, qdead, np.asarray(qcost), 2048)
    divergence("refine", rr.steps, np.asarray(rkill), np.asarray(rcost),
               2048)
    return 0


if __name__ == "__main__":
    sys.exit(main())
