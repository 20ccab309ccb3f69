"""Content-pack discovery and loading.

Behavioural twin of the reference's content manager
(content_manager.cpp:9-379): scan content directories for metric definitions
paired with JSON configs, support config inheritance (``inherit_settings``),
pack-local coordinate systems and origin-distance functions, menu ordering via
``sorting.json``, and error tolerance — a broken definition surfaces as a
"(broken)" entry instead of a crash (content_manager.cpp:104-140).

The reference's definition language is JavaScript evaluated through QuickJS
with dual numbers (js_interop.cpp); here a pack is a directory of Python
modules defining plain jnp metric functions:

    my_pack/
      my_hole.py        # def metric(x, params): ... ; DEFAULTS = {...}
      my_hole.json      # same schema as the reference scripts/*.json
      coordinates/
        my_to_polar.py  # def transform(x, params): ...
      origins/
        my_origin.py    # def origin(polar, params): ...
      sorting.json
"""

from __future__ import annotations

import dataclasses
import importlib.util
import json
import sys
from pathlib import Path

from .coordinates import transforms as tr
from .metrics import base as mbase

# JSON keys that map 1:1 onto MetricConfig fields (metric.hpp:359-433).
_CONFIG_KEYS = {
    "name", "description", "use_prepass", "max_acceleration_change",
    "singular", "traversable_event_horizon", "singular_terminator",
    "adaptive_precision", "detect_singularities", "follow_geodesics_forward",
    "coordinate_system", "to_polar", "from_polar", "origin_distance",
    "coordinate_periodicity", "has_cylindrical_singularity",
    "cylindrical_terminator", "unconditionally_nonsingular",
}


@dataclasses.dataclass
class Pack:
    """A loaded content pack: metrics (some possibly broken) + menu order."""

    directory: Path
    metrics: dict[str, mbase.Metric] = dataclasses.field(default_factory=dict)
    broken: dict[str, str] = dataclasses.field(default_factory=dict)
    order: list[str] = dataclasses.field(default_factory=list)


def _import_module(path: Path):
    name = f"_grt_pack_{abs(hash(str(path)))}_{path.stem}"
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_config(directory: Path, stem: str, _depth: int = 0) -> dict:
    """JSON config with ``inherit_settings`` resolution
    (content_manager.cpp:70-112).  Bases resolve pack-locally first, then
    against the built-in base presets."""
    if _depth > 8:
        raise ValueError(f"inherit_settings loop at {stem}")
    cfg_path = directory / f"{stem}.json"
    data = json.loads(cfg_path.read_text()) if cfg_path.exists() else {}
    inherit = data.pop("inherit_settings", None)
    merged: dict = {}
    if inherit:
        if (directory / f"{inherit}.json").exists():
            merged.update(load_config(directory, inherit, _depth + 1))
        elif inherit in mbase.BASE_CONFIGS:
            merged.update(mbase.BASE_CONFIGS[inherit])
        else:
            raise FileNotFoundError(f"unknown inherit_settings {inherit!r}")
    merged.update(data)
    return merged


def _load_support(directory: Path, pack_tag: str):
    """Register pack-local coordinate transforms / periodicities / origins
    into the global registries under pack-prefixed names."""
    coords = directory / "coordinates"
    if coords.is_dir():
        for f in sorted(coords.glob("*.py")):
            mod = _import_module(f)
            fn = getattr(mod, "transform", None) or getattr(mod, "func", None)
            if fn is None:
                continue
            if "periodicity" in f.stem:
                tr.PERIODICITY[f.stem] = fn
            else:
                tr.TRANSFORMS[f.stem] = fn
    origins = directory / "origins"
    if origins.is_dir():
        for f in sorted(origins.glob("*.py")):
            mod = _import_module(f)
            fn = getattr(mod, "origin", None) or getattr(mod, "func", None)
            if fn is not None:
                mbase.ORIGINS[f.stem] = fn


def load_metric_from_module(directory: Path, stem: str) -> mbase.Metric:
    """One metric = module + config pair (``load_metric_from_script``
    content_manager.cpp:9-53)."""
    mod = _import_module(directory / f"{stem}.py")
    fn = getattr(mod, "metric", None)
    if fn is None:
        raise AttributeError(f"{stem}.py defines no `metric(x, params)`")

    raw = load_config(directory, stem)
    unknown = set(raw) - _CONFIG_KEYS
    for key in unknown:  # reference warns on unknown keys (metric.hpp:431)
        print(f"Warning, unknown key name {key}", file=sys.stderr)
        raw.pop(key)
    raw.setdefault("name", stem)
    config = mbase.MetricConfig(**raw)

    return mbase.Metric(
        name=config.name,
        fn=fn,
        config=config,
        defaults=dict(getattr(mod, "DEFAULTS", {})),
        diagonal=bool(getattr(mod, "DIAGONAL", False)),
        spherically_symmetric=bool(
            getattr(mod, "SPHERICALLY_SYMMETRIC", False)
        ),
        depends_on=tuple(getattr(mod, "DEPENDS_ON", (0, 1, 2, 3))),
        rank1=getattr(mod, "RANK1", None),
    )


def load_pack(directory: str | Path, register: bool = True) -> Pack:
    """Scan a content directory (``content::load``
    content_manager.cpp:181-261)."""
    directory = Path(directory)
    pack = Pack(directory=directory)

    _load_support(directory, directory.name)

    for py in sorted(directory.glob("*.py")):
        stem = py.stem
        try:
            metric = load_metric_from_module(directory, stem)
        except Exception as e:  # broken packs must not crash the app
            pack.broken[stem] = f"{type(e).__name__}: {e}"
            continue
        pack.metrics[metric.name] = metric
        if register:
            mbase.register(metric)

    sorting = directory / "sorting.json"
    if sorting.exists():
        try:
            order = json.loads(sorting.read_text())
            stems = [Path(o).stem for o in order]
            pack.order = [s for s in stems if s in pack.metrics
                          or any(m.config.name == s
                                 for m in pack.metrics.values())]
        except Exception:
            pack.order = sorted(pack.metrics)
    else:
        pack.order = sorted(pack.metrics)
    return pack
