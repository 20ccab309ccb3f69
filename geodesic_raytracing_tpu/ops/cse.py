"""Trace-level common-subexpression elimination — the ``$pin`` analogue.

The reference pins shared subexpressions into named temporaries
(``equation_context::pin`` equation_context.hpp:16-43, driven from metric
scripts via ``$pin()`` js_interop.cpp:352-380) because its string codegen
would otherwise splice the same expression text into the kernel many
times.  Here the metric function is traced once, so Python-level sharing
is already shared — but the JVP partial-derivative sweeps
(:func:`ops.geometry.metric_and_partials_batched`) re-trace the primal
chain per seed, and the four metric-component chains of the realified
Ernst metrics share large subtrees that appear once PER SWEEP in the
jaxpr.  XLA's HLO CSE handles this for the XLA path, but the Pallas
kernel consumes the jaxpr directly, and measured on double_kerr the
acceleration jaxpr carries ~14% duplicate equations (88 duplicate muls
of 802 — scripts/dk_opcount.py).

:func:`cse` re-evaluates a traced function with value numbering: an
equation whose (primitive, params, operand value-numbers) already
occurred reuses the first occurrence's output instead of re-binding.
Commutative primitives match under operand swap.  The transform is
BIT-EXACT by construction — every surviving equation computes exactly
what it did before; duplicates are replaced by the value they would
have equalled.
"""

from __future__ import annotations

import jax
from jax.extend.core import Literal

# Primitives whose two operands commute (matching under operand swap).
_COMMUTATIVE = {"add", "mul", "add_any", "max", "min", "and", "or", "xor",
                "eq", "ne"}

# Call-like primitives interpreted by recursing into their sub-jaxpr so
# inner duplicates dedup too.  custom_jvp/vjp calls are inlined as their
# primal body — which DROPS the custom derivative rules (recip's
# div-free JVP, _csqrt2's smoothness fix), so :func:`cse` must only wrap
# computations that are never differentiated (the Pallas kernel path;
# the scan/while differentiable paths keep the raw functions).
_INLINE = {"pjit", "jit", "closed_call", "core_call"}
_INLINE_BODY = {"custom_jvp_call", "custom_vjp_call"}


def _key_params(params) -> tuple:
    return tuple(sorted((k, repr(v)) for k, v in params.items()))


def _eval_cse(jaxpr, consts, args, seen: dict, vn: dict, keep: list,
              nextvn: list):
    env: dict = {}

    def vid_of(val):
        """Value number for a concrete value (tracer), by identity.
        ``keep`` pins every numbered value alive so ids are never
        recycled mid-trace."""
        key = id(val)
        if key not in vn:
            vn[key] = nextvn[0]
            nextvn[0] += 1
            keep.append(val)
        return vn[key]

    def read(v):
        if isinstance(v, Literal):
            return v.val
        return env[v]

    def in_key(v):
        if isinstance(v, Literal):
            return ("lit", repr(v.val), str(getattr(v, "aval", "")))
        return vid_of(env[v])

    for v, c in zip(jaxpr.constvars, consts):
        env[v] = c
    for v, a in zip(jaxpr.invars, args):
        env[v] = a

    for eq in jaxpr.eqns:
        name = eq.primitive.name
        if name in _INLINE or name in _INLINE_BODY:
            sub = eq.params["jaxpr" if name in _INLINE else "call_jaxpr"]
            outs = _eval_cse(sub.jaxpr, sub.consts,
                             [read(v) for v in eq.invars], seen, vn, keep,
                             nextvn)
            for v, o in zip(eq.outvars, outs):
                env[v] = o
            continue

        ink = [in_key(v) for v in eq.invars]
        if name in _COMMUTATIVE and len(ink) == 2:
            ink = sorted(ink, key=repr)
        key = (name, _key_params(eq.params), tuple(ink))
        cached = seen.get(key)
        if cached is not None:
            outs = cached
        else:
            outs = eq.primitive.bind(*(read(v) for v in eq.invars),
                                     **eq.params)
            outs = list(outs) if eq.primitive.multiple_results else [outs]
            # Effectful or unhashable-param primitives must not cache.
            try:
                hash(key)
                if not eq.effects:
                    seen[key] = outs
            except TypeError:
                pass
        for v, o in zip(eq.outvars, outs):
            env[v] = o

    return [read(v) for v in jaxpr.outvars]


def cse(fn):
    """Wrap ``fn`` so duplicate equations in its trace evaluate once.

    Re-traces per call (under ``jit`` this costs only trace time, like
    :func:`ops.complexify.realify`).  Output values are bit-identical to
    the untransformed function's.
    """

    def wrapped(*args):
        flat, tree = jax.tree.flatten(args)

        def ffn(*fargs):
            return fn(*jax.tree.unflatten(tree, fargs))

        closed = jax.make_jaxpr(ffn)(*flat)
        out_flat = _eval_cse(closed.jaxpr, closed.consts, list(flat),
                             {}, {}, [], [0])
        out_tree = jax.tree.structure(jax.eval_shape(ffn, *flat))
        return jax.tree.unflatten(out_tree, out_flat)

    return wrapped
