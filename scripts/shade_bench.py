"""Microbench of EWA shade variants at 1080p (the dominant frame stage).

Variants:
  prod        production sample_anisotropic (bilinear base + bilinear probes)
  base        centre sample only (max_probes=1) — the floor
  point       bilinear base + nearest-texel probes (1 gather/probe instead of 4)
  flat        production addressing but planar 1-D channel gathers
  bf16        production with a bfloat16 atlas (half the gather bytes)

Usage: python scripts/shade_bench.py [--cpu] [--frames N]
"""

from __future__ import annotations

import argparse
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
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses
    import functools

    import jax.numpy as jnp

    from geodesic_raytracing_tpu.render import background as bg

    H, W = 1080, 1920
    backgrounds = bg.checker_background()

    # Synthetic but realistic render-data: tex from a lensing-like warp so
    # uv derivatives vary; a band of high anisotropy near the "ring".
    yy, xx = np.meshgrid(np.linspace(0, 1, H, dtype=np.float32),
                         np.linspace(0, 1, W, dtype=np.float32), indexing="ij")
    r = np.sqrt((xx - 0.5) ** 2 + (yy - 0.5) ** 2) + 1e-3
    warp = 1.0 + 0.2 / r  # strong stretching near centre
    tex = np.stack([np.mod(xx * warp, 1.0), np.mod(yy * warp, 1.0)], axis=-1)
    tex = jnp.asarray(tex)
    side = jnp.ones((H, W), jnp.int32)

    MAXP = 4

    @functools.partial(jax.jit, static_argnames=("mp", "tri"))
    def prod(tex, side, mp=MAXP, tri=False):
        return bg.sample_anisotropic(backgrounds, tex, side, max_probes=mp,
                                     trilinear=tri)

    variants = {
        "prod": lambda: prod(tex, side),
        "base": lambda: prod(tex, side, mp=1),
    }

    # point probes: monkeypatchable? cleaner to inline a copy with the knob.
    from geodesic_raytracing_tpu.render.background import (
        read_mipmap,
    )

    @jax.jit
    def point_probe_demo(tex, side):
        # cost model probe pass only: k pixels, nearest-texel gathers
        n_pix = H * W
        k = n_pix // 3
        texf = tex.reshape(-1, 2)[:k]
        sidef = side.reshape(-1)[:k]
        lodf = jnp.zeros((k,), jnp.float32)
        total = jnp.zeros((k, 3), jnp.float32)
        b = backgrounds
        wi = jnp.int32(b.level_w[0])
        hi = jnp.int32(b.level_h[0])
        for cnt in range(MAXP):
            cu = texf[:, 0] + 0.001 * cnt
            cv = texf[:, 1] + 0.001 * cnt
            x0 = (cu * wi.astype(jnp.float32)).astype(jnp.int32) & (wi - 1)
            y0 = (cv * hi.astype(jnp.float32)).astype(jnp.int32) & (hi - 1)
            aidx = jnp.where(sidef >= 1, 0, 1)
            val = b.atlas[aidx, y0, x0, :]
            total = total + val
        return total

    variants["pointk"] = lambda: point_probe_demo(tex, side)

    # flat planar gathers: one 1-D index, three channel gathers
    flat_r = backgrounds.atlas[..., 0].reshape(-1)
    flat_g = backgrounds.atlas[..., 1].reshape(-1)
    flat_b = backgrounds.atlas[..., 2].reshape(-1)
    AH, AW = backgrounds.atlas.shape[1], backgrounds.atlas.shape[2]

    @jax.jit
    def flat_probe_demo(tex, side):
        n_pix = H * W
        k = n_pix // 3
        texf = tex.reshape(-1, 2)[:k]
        sidef = side.reshape(-1)[:k]
        b = backgrounds
        wi = jnp.int32(b.level_w[0])
        hi = jnp.int32(b.level_h[0])
        total = jnp.zeros((k, 3), jnp.float32)
        for cnt in range(MAXP):
            cu = texf[:, 0] + 0.001 * cnt
            cv = texf[:, 1] + 0.001 * cnt
            x0 = (cu * wi.astype(jnp.float32)).astype(jnp.int32) & (wi - 1)
            y0 = (cv * hi.astype(jnp.float32)).astype(jnp.int32) & (hi - 1)
            aidx = jnp.where(sidef >= 1, 0, 1)
            idx = (aidx * AH + y0) * AW + x0
            val = jnp.stack([flat_r[idx], flat_g[idx], flat_b[idx]], axis=-1)
            total = total + val
        return total

    variants["flatk"] = lambda: flat_probe_demo(tex, side)

    # packed rgb in one uint32 (8:8:8), single gather + shifts
    a8 = np.clip(np.asarray(backgrounds.atlas) * 255.0 + 0.5, 0,
                 255).astype(np.uint32)
    packed = jnp.asarray(
        (a8[..., 0] << 16) | (a8[..., 1] << 8) | a8[..., 2]
    ).reshape(-1)

    @jax.jit
    def packed_probe_demo(tex, side):
        n_pix = H * W
        k = n_pix // 3
        texf = tex.reshape(-1, 2)[:k]
        sidef = side.reshape(-1)[:k]
        b = backgrounds
        wi = jnp.int32(b.level_w[0])
        hi = jnp.int32(b.level_h[0])
        total = jnp.zeros((k, 3), jnp.float32)
        for cnt in range(MAXP):
            cu = texf[:, 0] + 0.001 * cnt
            cv = texf[:, 1] + 0.001 * cnt
            x0 = (cu * wi.astype(jnp.float32)).astype(jnp.int32) & (wi - 1)
            y0 = (cv * hi.astype(jnp.float32)).astype(jnp.int32) & (hi - 1)
            aidx = jnp.where(sidef >= 1, 0, 1)
            idx = (aidx * AH + y0) * AW + x0
            w = packed[idx]
            val = jnp.stack([
                ((w >> 16) & 0xFF).astype(jnp.float32),
                ((w >> 8) & 0xFF).astype(jnp.float32),
                (w & 0xFF).astype(jnp.float32),
            ], axis=-1) * (1.0 / 255.0)
            total = total + val
        return total

    variants["packedk"] = lambda: packed_probe_demo(tex, side)

    for name, fn in variants.items():
        ts = []
        for _ in range(args.frames + 1):
            sync(fn())
            t0 = time.perf_counter()
            sync(fn())
            ts.append(time.perf_counter() - t0)
        print(f"{name:10s} {float(np.median(ts[1:])):7.3f} s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
