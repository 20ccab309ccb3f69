"""Isolated Pallas ray-march kernel throughput on the production quarter
state (1080p Kerr bench config): executed Gsteps/s of `raymarch.launch`
alone, across tile size / check_every variants, plus the pack/unpack glue
cost.

Usage: python scripts/kernel_bench.py [--frames N]
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import sys
import time

import numpy as np


def sync(x):
    import jax

    leaf = jax.tree.leaves(x)[0]
    return np.asarray(leaf.reshape(-1)[:1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from geodesic_raytracing_tpu import metrics
    from geodesic_raytracing_tpu.camera import Camera
    from geodesic_raytracing_tpu.ops.integrate import Features, TraceOptions
    from geodesic_raytracing_tpu.ops.pallas import raymarch
    from geodesic_raytracing_tpu.render import pipeline as pl

    W, H = 1920, 1080
    metric = metrics.get_metric("kerr_boyer")
    params = metric.params()
    camera = Camera.default().rotate(pitch=-np.pi / 2)
    base_trace = TraceOptions(max_steps=16384, method="pallas", tile=2048)
    settings = pl.RenderSettings(width=W, height=H, anisotropy=4,
                                 trilinear=False, adaptive_sampling=True,
                                 trace=base_trace)
    features = Features.for_metric(metric)

    # Production quarter-pass initial state + prepass kill/cost.
    pw, ph = W // settings.prepass_scale, H // settings.prepass_scale
    psettings = dataclasses.replace(settings, width=pw, height=ph,
                                    adaptive_sampling=False)
    dead, psteps = pl._prepass_dead_map(metric, camera, params, psettings,
                                        features)
    state, ku, iquat, f_in_x, qcost = pl._quarter_setup_jit(
        metric, camera, params, settings, features, dead, psteps)
    sync(state)

    def executed_msteps(steps, kill, cost, tile):
        s = np.asarray(steps)
        perm, _ = raymarch._bucket_partition(
            jnp.asarray(kill), jnp.asarray(cost, jnp.float32))
        s = s[np.asarray(perm)]
        n_pad = -(-s.size // tile) * tile
        s = np.pad(s, (0, n_pad - s.size))
        return s.reshape(-1, tile)

    # Reference committed/executed step counts from a full prod trace.
    fin = pl._trace_phases(metric, state, params, settings, features, qcost,
                           f_in_x)
    fsteps = np.asarray(fin.steps)

    variants = {
        "tile2048_ce8": dict(tile=2048, check_every=8),
        "tile2048_ce32": dict(tile=2048, check_every=32),
        "tile8192_ce8": dict(tile=8192, check_every=8),
    }

    pack_jit = functools.partial(jax.jit, static_argnames=("tile",))(
        lambda st, key, fx, tile: raymarch.pack_tiles(st, tile, key, fx)
    )

    @functools.partial(jax.jit, static_argnames=("opts",))
    def launch_jit(packed, params, features, opts):
        return raymarch.launch(metric, packed, params, features, opts)

    for name, kw in variants.items():
        tile = kw["tile"]
        opts = dataclasses.replace(base_trace, **kw)
        packed, inv_perm, n = pack_jit(state, qcost, f_in_x, tile)
        sync(packed)

        tiles = executed_msteps(fsteps, state.status != 0, qcost, tile)
        ce = kw["check_every"]
        exe = (np.ceil(tiles.max(axis=1) / ce) * ce * tile).sum()

        ts = []
        for _ in range(args.frames + 1):
            outs = launch_jit(packed, params, features, opts)
            t0 = time.perf_counter()
            sync(outs)
            ts.append(time.perf_counter() - t0)
            # drain fully before next timing (async dispatch)
        t = float(np.median(ts[1:]))
        print(f"{name:16s} {t:7.3f} s   executed {exe/1e6:7.1f} Msteps  "
              f"-> {exe/t/1e9:5.2f} Gsteps/s")

    # pack/unpack glue cost at tile 2048
    opts = base_trace
    t0 = time.perf_counter()
    for _ in range(args.frames):
        packed, inv_perm, n = pack_jit(state, qcost, f_in_x, 2048)
        sync(packed)
    print(f"pack             {(time.perf_counter()-t0)/args.frames:7.3f} s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
