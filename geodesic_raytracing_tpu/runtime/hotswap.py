"""Metric hot-swap and static parameter baking.

Behavioural twin of the reference's two-program scheme (metric_manager.hpp):
on metric switch it immediately registers a *dynamic* program (tunable params
read from a buffer) and kicks off an async build of a *static* program with
the current slider values baked in as literals, swapping it in when ready
(check_substitution, metric_manager.hpp:172-219).

The XLA equivalents:
* dynamic program  = jit with params as traced arguments (default paths),
* static program   = jit of a closure with params folded in as Python
  constants -> XLA constant-folds them through the whole kernel,
* hot swap         = compile the static specialisation on a worker thread and
  atomically switch the dispatch pointer once it is ready.
"""

from __future__ import annotations

import dataclasses
import threading
from typing import Any, Callable

import jax

from ..metrics.base import Metric


def bake(metric: Metric, params: dict) -> Metric:
    """A Metric whose tunables are compile-time constants
    (the reference's ``build_concrete`` substitution, metric.hpp:495).

    Tracing through the returned metric lets XLA fold every parameter —
    the analogue of the `-D`-literal static kernel."""
    const = {k: float(v) for k, v in params.items()}

    def fn(x, _params, _const=const):
        return metric.fn(x, _const)

    return dataclasses.replace(metric, fn=fn)


class HotSwapProgram:
    """Dynamic-now / static-later program pair.

    ``build(params)`` must return a *compiled-and-ready* callable (e.g. a
    jitted function after a warm-up call).  ``__call__`` dispatches to the
    static build if one matching the current params is ready, else to the
    dynamic program — never blocking on compilation
    (metric_manager.hpp:83-167 semantics).
    """

    def __init__(self, dynamic: Callable, build_static: Callable[[dict], Callable]):
        self._dynamic = dynamic
        self._build_static = build_static
        self._lock = threading.Lock()
        self._static: Callable | None = None
        self._static_key: tuple | None = None
        self._pending_key: tuple | None = None
        self._thread: threading.Thread | None = None

    @staticmethod
    def _key(params: dict) -> tuple:
        return tuple(sorted((k, float(v)) for k, v in params.items()))

    def request_static(self, params: dict) -> None:
        """Kick off a background build of the static specialisation for
        these parameter values (idempotent per value-set)."""
        key = self._key(params)
        with self._lock:
            if key in (self._static_key, self._pending_key):
                return
            self._pending_key = key

        def worker():
            try:
                fn = self._build_static(dict(params))
            except Exception:
                with self._lock:
                    if self._pending_key == key:
                        self._pending_key = None
                return
            with self._lock:
                if self._pending_key == key:
                    self._static = fn
                    self._static_key = key
                    self._pending_key = None

        t = threading.Thread(target=worker, daemon=True)
        with self._lock:
            self._thread = t
        t.start()

    def __call__(self, params: dict, *args, **kwargs):
        key = self._key(params)
        with self._lock:
            static = self._static if self._static_key == key else None
        if static is not None:
            return static(*args, **kwargs)
        return self._dynamic(params, *args, **kwargs)

    @property
    def static_ready(self) -> bool:
        with self._lock:
            return self._static is not None

    def wait(self, timeout: float | None = None) -> None:
        t = self._thread
        if t is not None:
            t.join(timeout)
