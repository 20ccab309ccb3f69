"""Pallas TPU ray-march kernel: per-tile geodesic integration in VMEM.

This is the TPU analogue of the reference's workgroup dispatch of
``do_generic_rays`` (main.cpp:203, cl.cl:3954): the image is cut into ray
tiles; each Pallas grid step loads one tile's state into VMEM and runs the
*whole* adaptive Verlet march for that tile in a single kernel invocation with
a tile-local ``while_loop``.  Divergence cost is therefore bounded by the
tile (like a GPU workgroup), not by the worst ray of the whole frame — the
key advantage over the XLA whole-batch ``while_loop``, whose every iteration
pays for all rays until the last one terminates.

The integration math is the exact shared ``make_step_fn`` from ops.integrate,
traced into the kernel on (4, TILE) component-first blocks (rays on the VPU
lane axis).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...metrics.base import Metric
from .. import integrate
from ..integrate import Features, RayState, TraceOptions, _StateT

Array = jax.Array

DEFAULT_TILE = 1024


def _flatten_params(params: dict):
    keys = sorted(params)
    vec = jnp.stack([jnp.asarray(params[k], dtype=jnp.float32) for k in keys]) \
        if keys else jnp.zeros((1,), dtype=jnp.float32)
    return keys, vec


def trace_rays_pallas(metric: Metric, state: RayState, params,
                      features: Features = Features(),
                      opts: TraceOptions = TraceOptions(),
                      tile: int = DEFAULT_TILE,
                      interpret: bool = False) -> RayState:
    """Pallas-tiled twin of :func:`integrate.trace_rays` (while method)."""
    n = state.position.shape[0]
    n_pad = -(-n // tile) * tile

    pos = state.position.T
    vel = state.velocity.T
    acc = state.acceleration.T
    f_in_x = jnp.abs(vel[0])

    def pad_v(x):  # (4, N) -> (4, n_pad)
        return jnp.pad(x, ((0, 0), (0, n_pad - n)))

    def pad_s(x, fill=0):  # (N,) -> (1, n_pad)
        return jnp.pad(x[None, :], ((0, 0), (0, n_pad - n)),
                       constant_values=fill)

    pos, vel, acc = pad_v(pos), pad_v(vel), pad_v(acc)
    next_ds = pad_s(state.next_ds)
    rdl = pad_s(state.running_dlambda_dnew, 1)
    status = pad_s(state.status, integrate.DEAD)
    steps = pad_s(state.steps)
    finx = pad_s(f_in_x)

    pkeys, pvec = _flatten_params(params)
    fvec = jnp.stack([jnp.asarray(v, dtype=jnp.float32) for v in features])

    grid = (n_pad // tile,)

    def vspec():
        return pl.BlockSpec((4, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def sspec():
        return pl.BlockSpec((1, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def kernel(pvec_ref, fvec_ref,
               pos_ref, vel_ref, acc_ref, ds_ref, rdl_ref, status_ref,
               steps_ref, finx_ref,
               opos_ref, ovel_ref, oacc_ref, ods_ref, ordl_ref, ostatus_ref,
               osteps_ref):
        kparams = {k: pvec_ref[i] for i, k in enumerate(pkeys)}
        kfeatures = Features(*(fvec_ref[i] for i in range(len(features))))

        st0 = _StateT(
            position=pos_ref[:, :],
            velocity=vel_ref[:, :],
            acceleration=acc_ref[:, :],
            next_ds=ds_ref[0, :],
            running_dlambda_dnew=rdl_ref[0, :],
            status=status_ref[0, :],
            steps=steps_ref[0, :],
        )
        step = integrate.make_step_fn(metric, kfeatures, opts, finx_ref[0, :])

        def cond(carry):
            i, s = carry
            return (i < opts.max_steps) & jnp.any(s.status == integrate.ACTIVE)

        def body(carry):
            i, s = carry
            return i + 1, step(s, kparams)

        _, fin = jax.lax.while_loop(cond, body, (jnp.int32(0), st0))

        opos_ref[:, :] = fin.position
        ovel_ref[:, :] = fin.velocity
        oacc_ref[:, :] = fin.acceleration
        ods_ref[0, :] = fin.next_ds
        ordl_ref[0, :] = fin.running_dlambda_dnew
        ostatus_ref[0, :] = fin.status
        osteps_ref[0, :] = fin.steps

    out_shapes = (
        jax.ShapeDtypeStruct((4, n_pad), pos.dtype),
        jax.ShapeDtypeStruct((4, n_pad), vel.dtype),
        jax.ShapeDtypeStruct((4, n_pad), acc.dtype),
        jax.ShapeDtypeStruct((1, n_pad), next_ds.dtype),
        jax.ShapeDtypeStruct((1, n_pad), rdl.dtype),
        jax.ShapeDtypeStruct((1, n_pad), status.dtype),
        jax.ShapeDtypeStruct((1, n_pad), steps.dtype),
    )

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params vector
            pl.BlockSpec(memory_space=pltpu.SMEM),  # features vector
            vspec(), vspec(), vspec(),
            sspec(), sspec(), sspec(), sspec(), sspec(),
        ],
        out_specs=(vspec(), vspec(), vspec(),
                   sspec(), sspec(), sspec(), sspec()),
        out_shape=out_shapes,
        interpret=interpret,
    )(pvec, fvec, pos, vel, acc, next_ds, rdl, status, steps, finx)

    opos, ovel, oacc, ods, ordl, ostatus, osteps = outs
    return RayState(
        position=opos[:, :n].T,
        velocity=ovel[:, :n].T,
        acceleration=oacc[:, :n].T,
        next_ds=ods[0, :n],
        running_dlambda_dnew=ordl[0, :n],
        status=ostatus[0, :n],
        steps=osteps[0, :n],
    )
