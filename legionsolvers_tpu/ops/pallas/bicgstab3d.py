"""Pallas TPU kernels: fused BiCGStab passes for 3-D grids (plane-streaming).

The 3-D analog of ``bicgstab2d.py`` (same three-pass schedule honoring the
iteration's two global syncs, 15 vector passes = 60 B/unknown/iter at f32
vs 24 for the transcription), built on the plane-streaming structure of
``stencil3d.py``: each HBM operand streams through a rotating 4-slot padded
plane buffer, the pass's linear combination (p = r + beta (p - omega v);
s = r - alpha v) is formed plane-by-plane into a combined buffer, and A is
applied once to the combined planes.

* ``bicg3d_pv``    : p, v = A p, <r~, v>     (reads r/p/v/r~, writes p/v: 6)
* ``bicg3d_st``    : <t, s>, <t, t>          (reads r/v: 2; s, t VMEM-only)
* ``bicg3d_update``: x', r', <r',r'>, <r~,r'> (reads r/v/x/p/r~, writes 2: 7)

Halo planes are the COMBINED operand's x-neighbors (callers compute them
from the exchanged r/p/v planes), zeros at the global grid edges.
Geometry: |ox| <= 1, |oy| <= 8, |oz| <= 128, working set checked by
:func:`supports3d_bicgstab`.

Reference: BiCGStabSolver.hpp:64-82.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil3d import PADY, PADZ, _VMEM_BUDGET, _VMEM_LIMIT, _plane_bytes


def supports3d_bicgstab(Y: int, Z: int, offsets, itemsize: int = 4) -> bool:
    """The pv pass is the widest: three 4-slot stream buffers + the
    combined 4-slot buffer + ~3 temporaries, plus the r~/p/v block
    streams."""
    if Z % 128 != 0:
        return False
    if not all(
        abs(ox) <= 1 and abs(oy) <= PADY and abs(oz) <= PADZ
        for ox, oy, oz in offsets
    ):
        return False
    need = (16 + 3) * _plane_bytes(Y, Z, itemsize)
    need += 6 * Y * Z * itemsize
    return need <= _VMEM_BUDGET


def _mk_plane_io(Y, Z, nt):
    def issue(j, hbm, buf, sems):
        slot = jnp.asarray(j, jnp.int32) % 4
        pltpu.make_async_copy(
            hbm.at[pl.ds(j, 1), :, :],
            buf.at[pl.ds(slot, 1), pl.ds(PADY, Y), pl.ds(PADZ, Z)],
            sems.at[slot],
        ).start()

    def wait(j, hbm, buf, sems):
        slot = jnp.asarray(j, jnp.int32) % 4
        pltpu.make_async_copy(
            hbm.at[pl.ds(0, 1), :, :],
            buf.at[pl.ds(slot, 1), pl.ds(PADY, Y), pl.ds(PADZ, Z)],
            sems.at[slot],
        ).wait()

    return issue, wait


def _zero_margins(bufs, Y, Z, dtype):
    YP, ZP = Y + 2 * PADY, Z + 2 * PADZ
    for buf in bufs:
        for sl in range(4):
            buf[sl, 0:PADY, :] = jnp.zeros((PADY, ZP), dtype)
            buf[sl, PADY + Y :, :] = jnp.zeros((PADY, ZP), dtype)
            buf[sl, :, 0:PADZ] = jnp.zeros((YP, PADZ), dtype)
            buf[sl, :, PADZ + Z :] = jnp.zeros((YP, PADZ), dtype)


def _apply_planes(planes, offsets, values, Y, Z, dtype):
    # shared with stencil3d: separable-sweep fast path for full
    # class-uniform 3x3x3 boxes (the 27-pt benchmark stencil), direct
    # slice-mul-add loop otherwise
    from .stencil3d import apply_planes

    return apply_planes(planes, offsets, values, Y, Z, dtype)


def _accum(ref, i, col, part):
    @pl.when(i == 0)
    def _():
        ref[0, col] = part

    @pl.when(i > 0)
    def _():
        ref[0, col] = ref[0, col] + part


def _bicg3d_call(mode, arrays, scalars, halos, *, offsets, values,
                 interpret, compensated=False):
    """Shared driver.  ``arrays``: mode-dependent HBM operands; ``halos``:
    (top, bot) combined planes; ``scalars``: [1, k] f32."""
    r = arrays[0]
    X, Y, Z = r.shape
    dtype = r.dtype
    nt = X
    YP, ZP = Y + 2 * PADY, Z + 2 * PADZ
    issue, wait = _mk_plane_io(Y, Z, nt)
    n_streams = {"pv": 3, "st": 2, "upd": 2}[mode]
    inner = (slice(PADY, PADY + Y), slice(PADZ, PADZ + Z))

    def kernel(*refs):
        if mode == "pv":
            (r_hbm, p_hbm, v_hbm, sc_ref, top_ref, bot_ref, rt_ref,
             po_ref, vo_ref, dot_ref,
             b0, b1, b2, comb, s0, s1, s2) = refs
            hbms, bufs, sems = ((r_hbm, p_hbm, v_hbm), (b0, b1, b2),
                                (s0, s1, s2))
        elif mode == "st":
            (r_hbm, v_hbm, sc_ref, top_ref, bot_ref,
             dot_ref, b0, b1, comb, s0, s1) = refs
            hbms, bufs, sems = (r_hbm, v_hbm), (b0, b1), (s0, s1)
        else:
            (r_hbm, v_hbm, sc_ref, top_ref, bot_ref,
             xv_ref, pv_ref, rt_ref,
             xo_ref, ro_ref, dot_ref, b0, b1, comb, s0, s1) = refs
            hbms, bufs, sems = (r_hbm, v_hbm), (b0, b1), (s0, s1)
        i = pl.program_id(0)

        def combine(sl):
            if mode == "pv":
                bv = sc_ref[0, 0].astype(dtype)   # beta
                om = sc_ref[0, 1].astype(dtype)   # omega
                comb[sl] = b0[sl] + bv * (b1[sl] - om * b2[sl])
            else:
                al = sc_ref[0, 0].astype(dtype)   # alpha
                comb[sl] = b0[sl] - al * b1[sl]

        @pl.when(i == 0)
        def _():
            for h, b, s in zip(hbms, bufs, sems):
                issue(0, h, b, s)
                if nt > 1:
                    issue(1, h, b, s)

        @pl.when(i + 2 < nt)
        def _():
            for h, b, s in zip(hbms, bufs, sems):
                issue(i + 2, h, b, s)

        @pl.when(i == 0)
        def _():
            _zero_margins(list(bufs) + [comb], Y, Z, dtype)
            comb[3, PADY : PADY + Y, PADZ : PADZ + Z] = top_ref[:, :]
            for h, b, s in zip(hbms, bufs, sems):
                wait(0, h, b, s)
            combine(0)

        @pl.when(i + 1 < nt)
        def _():
            for h, b, s in zip(hbms, bufs, sems):
                wait(i + 1, h, b, s)
            combine((i + 1) % 4)

        @pl.when(i == nt - 1)
        def _():
            comb[nt % 4, PADY : PADY + Y, PADZ : PADZ + Z] = bot_ref[:, :]

        sm1, s0_, sp1 = (i - 1) % 4, i % 4, (i + 1) % 4
        planes = {-1: comb[sm1, :, :], 0: comb[s0_, :, :],
                  1: comb[sp1, :, :]}
        acc = _apply_planes(planes, offsets, values, Y, Z, dtype)
        body = jax.lax.slice(planes[0], (PADY, PADZ), (PADY + Y, PADZ + Z))

        # compensated: two-float (hi, lo) accumulation of the emitted dots
        # (ops/ddsum.py) — the f64 stand-in; see bicgstab2d._dot_accum
        from .bicgstab2d import _dot_accum

        if mode == "pv":
            po_ref[0, :, :] = body
            vo_ref[0, :, :] = acc
            _dot_accum(dot_ref, i, 0, 1, rt_ref[0, :, :], acc, compensated)
        elif mode == "st":
            _dot_accum(dot_ref, i, 0, 2, acc, body, compensated)
            _dot_accum(dot_ref, i, 1, 2, acc, acc, compensated)
        else:
            al = sc_ref[0, 0].astype(dtype)
            om = sc_ref[0, 1].astype(dtype)
            xo_ref[0, :, :] = (xv_ref[0, :, :] + al * pv_ref[0, :, :]
                               + om * body)
            rnew = body - om * acc
            ro_ref[0, :, :] = rnew
            _dot_accum(dot_ref, i, 0, 2, rnew, rnew, compensated)
            _dot_accum(dot_ref, i, 1, 2, rt_ref[0, :, :], rnew, compensated)

    blk = pl.BlockSpec((1, Y, Z), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    any_ = pl.BlockSpec(memory_space=pl.ANY)
    nsc = scalars.shape[1]
    smem = pl.BlockSpec((1, nsc), lambda i: (0, 0), memory_space=pltpu.SMEM)
    sdot = lambda k: pl.BlockSpec((1, k), lambda i: (0, 0),
                                  memory_space=pltpu.SMEM)
    scratch = [pltpu.VMEM((4, YP, ZP), dtype)] * (n_streams + 1) + \
              [pltpu.SemaphoreType.DMA((4,))] * n_streams
    shape3 = jax.ShapeDtypeStruct((X, Y, Z), dtype)
    nd = 2 if compensated else 1  # dot slots per emitted scalar
    if mode == "pv":
        r_, p_, v_, rt = arrays
        in_specs = [any_, any_, any_, smem, vm, vm, blk]
        operands = [r_, p_, v_, scalars, halos[0], halos[1], rt]
        out_specs = [blk, blk, sdot(1 * nd)]
        out_shape = [shape3, shape3,
                     jax.ShapeDtypeStruct((1, 1 * nd), jnp.float32)]
        aliases = {1: 0, 2: 1}
        nbytes = 6 * X * Y * Z * dtype.itemsize
    elif mode == "st":
        r_, v_ = arrays
        in_specs = [any_, any_, smem, vm, vm]
        operands = [r_, v_, scalars, halos[0], halos[1]]
        out_specs = [sdot(2 * nd)]
        out_shape = [jax.ShapeDtypeStruct((1, 2 * nd), jnp.float32)]
        aliases = {}
        nbytes = 2 * X * Y * Z * dtype.itemsize
    else:
        r_, v_, xv, pv_, rt = arrays
        in_specs = [any_, any_, smem, vm, vm, blk, blk, blk]
        operands = [r_, v_, scalars, halos[0], halos[1], xv, pv_, rt]
        out_specs = [blk, blk, sdot(2 * nd)]
        out_shape = [shape3, shape3,
                     jax.ShapeDtypeStruct((1, 2 * nd), jnp.float32)]
        # x consumed via its blk stream.  r' -> r in-place aliasing was
        # TRIED (round 4; safe by the plane-ordering argument, measured
        # deterministic) and REVERTED: unlike the 2-D window kernels —
        # where same-page read-modify-write streams beat separate streams
        # by ~15% — the plane-streamed layout measured ~5-10% SLOWER with
        # it (dim3 1.369 -> 1.502, dim4 1.648 -> 1.713 ms/iter)
        aliases = {5: 0}
        nbytes = 7 * X * Y * Z * dtype.itemsize

    return pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(2 * len(offsets) + 8) * X * Y * Z,
            bytes_accessed=nbytes,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


@functools.partial(
    jax.jit, static_argnames=("offsets", "values", "interpret",
                              "compensated")
)
def bicg3d_pv(r, p, v, rt, beta, omega, pn_top, pn_bot, *,
              offsets, values, interpret=False, compensated=False):
    """(p_new, v_new = A p_new, <r~, v_new>).  ``pn_top/pn_bot``: combined
    p halo planes (r + beta (p - omega v) of the neighbors); p/v buffers
    consumed."""
    sc = jnp.stack([jnp.asarray(beta, jnp.float32),
                    jnp.asarray(omega, jnp.float32)]).reshape(1, 2)
    po, vo, dot = _bicg3d_call(
        "pv", (r, p, v, rt), sc, (pn_top, pn_bot),
        offsets=offsets, values=values, interpret=interpret,
        compensated=compensated)
    return po, vo, (dot[0, 0] + dot[0, 1] if compensated else dot[0, 0])


@functools.partial(
    jax.jit, static_argnames=("offsets", "values", "interpret",
                              "compensated")
)
def bicg3d_st(r, v, alpha, s_top, s_bot, *, offsets, values,
              interpret=False, compensated=False):
    """(<t, s>, <t, t>) with s = r - alpha v and t = A s VMEM-only."""
    sc = jnp.asarray(alpha, jnp.float32).reshape(1, 1)
    (dot,) = _bicg3d_call(
        "st", (r, v), sc, (s_top, s_bot),
        offsets=offsets, values=values, interpret=interpret,
        compensated=compensated)
    if compensated:
        return dot[0, 0] + dot[0, 2], dot[0, 1] + dot[0, 3]
    return dot[0, 0], dot[0, 1]


@functools.partial(
    jax.jit, static_argnames=("offsets", "values", "interpret",
                              "compensated")
)
def bicg3d_update(r, v, x, p, rt, alpha, omega, s_top, s_bot, *,
                  offsets, values, interpret=False, compensated=False):
    """(x', r', <r', r'>, <r~, r'>); x buffer consumed."""
    sc = jnp.stack([jnp.asarray(alpha, jnp.float32),
                    jnp.asarray(omega, jnp.float32)]).reshape(1, 2)
    xo, ro, dot = _bicg3d_call(
        "upd", (r, v, x, p, rt), sc, (s_top, s_bot),
        offsets=offsets, values=values, interpret=interpret,
        compensated=compensated)
    if compensated:
        return xo, ro, dot[0, 0] + dot[0, 2], dot[0, 1] + dot[0, 3]
    return xo, ro, dot[0, 0], dot[0, 1]
