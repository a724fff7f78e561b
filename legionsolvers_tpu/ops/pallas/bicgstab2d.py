"""Pallas TPU kernels: fused BiCGStab passes (2-D grid stencils).

CG got whole-iteration fused passes in rounds 1-2; BiCGStab remained the
planner transcription at 96 B/unknown/iter (24 XLA-fused vector passes,
validated in TRAFFIC_AUDIT.md).  Its iteration has two unavoidable global
synchronizations (alpha needs <r~, A p>; omega needs <t, s>/<t, t>), so the
minimum schedule is three kernel passes:

* ``pv``  (6 passes): p = r + beta (p - omega v); v = A p formed from the
  VMEM windows; emits <r~, v>.  Reads r/p/v windows + the r~ stream,
  writes p and v.
* ``st``  (2 passes): s = r - alpha v window-wide, t = A s in VMEM; emits
  <t, s> and <t, t> only — no vector output touches HBM.
* ``upd`` (7 passes): recomputes s and t in VMEM, writes x' = x + alpha p
  + omega s and r' = s - omega t, and emits <r', r'> (residual history)
  and <r~, r'> (the NEXT iteration's rho, saving its own 2-pass dot).

Total: 15 vector passes = 60 B/unknown/iter at f32 — 1.6x less HBM
traffic than the transcription.  Each pass applies A exactly ONCE to an
operand assembled from zero-padded windows, so no intermediate re-masking
is needed (unlike the s-step CG chain); |dy| <= 8 and |dx| <= PADC as in
the other kernels.  Sharded runs use the SAME zero-halo passes plus
input-derived edge fixups built in ``parallel/stencil_op.py`` (the
``supports_fused_bicgstab`` gate there is the authoritative capability
map; see also ``parallel/overlap.py``).

Reference: BiCGStabSolver.hpp:64-82 — six separate task launches per
iteration there; the TPU analog of its async-future overlap is fusion.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil2d import PADC, _VMEM_BUDGET, _VMEM_LIMIT

PAD = 8

# Calibrated against Mosaic's actual allocation (round 5): the generic
# 40 MB budget starved the wide-row tiles (TR = 8 at C = 32768, the
# 1.40x-per-element wall of PROFILE_r05 §5); TR = 16 compiles inside the
# 64 MB scoped limit and runs 12% faster end-to-end.
_VMEM_BUDGET_BICG = 60 * 2**20


def _pick_tile_rows_nwin(
    R: int, C: int, itemsize: int, n_windows: int, n_streams: int,
    vmem_budget: int = _VMEM_BUDGET_BICG,
) -> int:
    """Largest row tile for a kernel with ``n_windows`` double-buffered
    halo windows (+1 value-level load each) and ``n_streams`` pipelined
    (TR, C) blocks, ~4 compute temporaries."""
    best = 0
    tr = 8
    while tr <= min(R, 128):
        W, CW = tr + 2 * PAD, C + 2 * PADC
        need = (3 * n_windows * W * CW
                + (2 * n_streams + 4) * tr * C) * itemsize
        if R % tr == 0 and need <= vmem_budget:
            best = tr
        tr += 8
    return best


def bicgstab_supported(R: int, C: int, offsets, itemsize: int = 4) -> bool:
    if C % 128 != 0:
        return False
    rlo = max(0, -min(dy for dy, _ in offsets))
    rhi = max(0, max(dy for dy, _ in offsets))
    # |dx| > PADC takes the roll+mask path (flat 1-D decompositions),
    # same as stencil2d.supports
    if rlo > PAD or rhi > PAD or any(abs(dx) >= C for _, dx in offsets):
        return False
    # the pv pass is the widest: 3 windows + 3 streams (r~ in, p/v out)
    return _pick_tile_rows_nwin(R, C, itemsize, 3, 3) > 0


def _mk_window_io(TR, C, nt, top_from_vmem: bool = False):
    """(issue, wait, copy_next_top) helpers for one double-buffered
    3-segment window.

    ``top_from_vmem``: the TOP (backward-looking) halo comes from the
    PREVIOUS window slot already in VMEM instead of an HBM DMA.  This is
    REQUIRED whenever the array is also an aliased kernel output: the
    top-halo DMA for window j+1 reads tile j's last rows while the tile-j
    output DMA may still be writing them — a measured nondeterminism on
    chip (round 4: same-config BiCGStab solves diverged from iteration 3).
    It also saves the 8-row halo re-read per tile.  Callers must invoke
    ``copy_next_top(i, win)`` once per step after waiting window i."""
    W = TR + 2 * PAD

    def issue(j, hbm, win, sems):
        slot = jnp.asarray(j, jnp.int32) % 2
        pltpu.make_async_copy(
            hbm.at[pl.ds(pl.multiple_of(j * TR, 8), TR), :],
            win.at[slot, pl.ds(PAD, TR), pl.ds(PADC, C)],
            sems.at[slot, 0],
        ).start()

        if not top_from_vmem:
            @pl.when(j > 0)
            def _():
                pltpu.make_async_copy(
                    hbm.at[pl.ds(pl.multiple_of(j * TR - PAD, 8), PAD), :],
                    win.at[slot, pl.ds(0, PAD), pl.ds(PADC, C)],
                    sems.at[slot, 1],
                ).start()

        @pl.when(j < nt - 1)
        def _():
            pltpu.make_async_copy(
                hbm.at[pl.ds(pl.multiple_of((j + 1) * TR, 8), PAD), :],
                win.at[slot, pl.ds(PAD + TR, PAD), pl.ds(PADC, C)],
                sems.at[slot, 2],
            ).start()

    def wait(j, hbm, win, sems):
        slot = jnp.asarray(j, jnp.int32) % 2
        pltpu.make_async_copy(
            hbm.at[pl.ds(0, TR), :],
            win.at[slot, pl.ds(PAD, TR), pl.ds(PADC, C)],
            sems.at[slot, 0],
        ).wait()

        if not top_from_vmem:
            @pl.when(j > 0)
            def _():
                pltpu.make_async_copy(
                    hbm.at[pl.ds(0, PAD), :],
                    win.at[slot, pl.ds(0, PAD), pl.ds(PADC, C)],
                    sems.at[slot, 1],
                ).wait()

        @pl.when(j < nt - 1)
        def _():
            pltpu.make_async_copy(
                hbm.at[pl.ds(0, PAD), :],
                win.at[slot, pl.ds(PAD + TR, PAD), pl.ds(PADC, C)],
                sems.at[slot, 2],
            ).wait()

    def copy_next_top(i, win):
        """Window i+1's top halo rows = window i's last body rows, copied
        VMEM->VMEM while window i is valid (call after wait(i))."""
        if not top_from_vmem:
            return

        @pl.when(i + 1 < nt)
        def _():
            nslot = jnp.asarray(i + 1, jnp.int32) % 2
            slot = jnp.asarray(i, jnp.int32) % 2
            win[nslot, 0:PAD, PADC : PADC + C] = (
                win[slot, TR : PAD + TR, PADC : PADC + C]
            )

    return issue, wait, copy_next_top


def _apply_window(wv, offsets, values, TR, C, dtype):
    """A applied once to a zero-padded window value ``wv [W, CW]`` ->
    [TR, C] body result (same shift algebra as stencil2d)."""
    cids = None
    acc = None
    for (dy, dx), v in zip(offsets, values):
        if abs(dx) <= PADC:
            sh = jax.lax.slice(
                wv, (PAD + dy, PADC + dx), (PAD + dy + TR, PADC + dx + C)
            )
        else:
            rows = jax.lax.slice(
                wv, (PAD + dy, PADC), (PAD + dy + TR, PADC + C)
            )
            rolled = pltpu.roll(rows, (-dx) % C, 1)
            if cids is None:
                cids = jax.lax.broadcasted_iota(jnp.int32, (TR, C), 1)
            valid = (cids >= -dx) & (cids < C - dx)
            sh = jnp.where(valid, rolled, jnp.zeros((), dtype))
        term = sh if v == 1.0 else (-sh if v == -1.0
                                    else jnp.asarray(v, dtype) * sh)
        acc = term if acc is None else acc + term
    return acc


def _zero_pads(i, wins, W, CW, C, dtype):
    @pl.when(i == 0)
    def _():
        for wref in wins:
            for sl in (0, 1):
                # pad COLUMNS: never written by any DMA -> both slots safe
                wref[sl, :, 0:PADC] = jnp.zeros((W, PADC), dtype)
                wref[sl, :, PADC + C : CW] = jnp.zeros((W, PADC), dtype)
            # out-of-grid TOP rows: current slot only (slot 1's top rows
            # are an in-flight halo DMA for tile 1 — do not race it)
            wref[0, 0:PAD, PADC : PADC + C] = jnp.zeros((PAD, C), dtype)


def _zero_last(i, nt, wins, W, C, dtype, TR):
    @pl.when(i == nt - 1)
    def _():
        for wref in wins:
            slot = jnp.asarray(i, jnp.int32) % 2
            wref[slot, PAD + TR : W, PADC : PADC + C] = (
                jnp.zeros((PAD, C), dtype)
            )


def _accum(ref, i, col, part):
    @pl.when(i == 0)
    def _():
        ref[0, col] = part

    @pl.when(i > 0)
    def _():
        ref[0, col] = ref[0, col] + part


def _dot_accum(ref, i, col, ncols, a, b, compensated):
    """Accumulate <a, b> into dot slot ``col`` across grid steps.  Under
    ``compensated`` the reduction carries a two-float (hi, lo) pair — hi in
    slot ``col``, lo in slot ``col + ncols`` — through the whole grid
    (ops/ddsum.py): the TPU-native stand-in for the reference's native-f64
    dot reductions, killing the f32 cancellation noise floor that makes
    rho-class scalars reduction-order chaotic at large n (PROFILE_r03.md)."""
    if not compensated:
        _accum(ref, i, col, jnp.sum((a * b).astype(jnp.float32)))
        return
    from ..ddsum import dd_add, dd_dot_tile

    hi, lo = dd_dot_tile(a, b)

    @pl.when(i == 0)
    def _():
        ref[0, col] = hi
        ref[0, col + ncols] = lo

    @pl.when(i > 0)
    def _():
        h, l = dd_add(ref[0, col], ref[0, col + ncols], hi, lo)
        ref[0, col] = h
        ref[0, col + ncols] = l


@functools.partial(
    jax.jit, static_argnames=("offsets", "values", "tile_rows", "interpret",
                              "compensated")
)
def bicg_pv(r, p, v, rt, beta, omega, *, offsets, values,
            tile_rows: int = 0, interpret: bool = False,
            compensated: bool = False):
    """(p_new, v_new = A p_new, <r~, v_new>); p/v buffers are consumed."""
    R, C = r.shape
    dtype = r.dtype
    TR = tile_rows or _pick_tile_rows_nwin(R, C, dtype.itemsize, 3, 3)
    if TR == 0 or R % TR:
        raise ValueError(f"unsupported geometry R={R} C={C}")
    nt = R // TR
    W, CW = TR + 2 * PAD, C + 2 * PADC
    ND = 2 if compensated else 1  # dot slots (hi + lo under compensation)
    issue, wait, _ = _mk_window_io(TR, C, nt)
    # p and v are ALIASED OUTPUTS: their top halos must come from VMEM
    # (the HBM top-halo DMA would race the previous tile's output write —
    # the round-4 nondeterminism fix)
    issue_a, wait_a, copy_top = _mk_window_io(TR, C, nt, top_from_vmem=True)

    def kernel(r_hbm, p_hbm, v_hbm, rt_ref, sc_ref,
               po_ref, vo_ref, dot_ref, rwin, pwin, vwin,
               rs, ps, vs):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            issue(0, r_hbm, rwin, rs)
            issue_a(0, p_hbm, pwin, ps)
            issue_a(0, v_hbm, vwin, vs)

        @pl.when(i + 1 < nt)
        def _():
            issue(i + 1, r_hbm, rwin, rs)
            issue_a(i + 1, p_hbm, pwin, ps)
            issue_a(i + 1, v_hbm, vwin, vs)

        wait(i, r_hbm, rwin, rs)
        wait_a(i, p_hbm, pwin, ps)
        wait_a(i, v_hbm, vwin, vs)
        copy_top(i, pwin)
        copy_top(i, vwin)
        slot = jnp.asarray(i, jnp.int32) % 2
        _zero_pads(i, (rwin, pwin, vwin), W, CW, C, dtype)
        _zero_last(i, nt, (rwin, pwin, vwin), W, C, dtype, TR)

        b = sc_ref[0, 0].astype(dtype)
        om = sc_ref[0, 1].astype(dtype)
        pw = rwin[slot] + b * (pwin[slot] - om * vwin[slot])
        vnew = _apply_window(pw, offsets, values, TR, C, dtype)
        body = jax.lax.slice(pw, (PAD, PADC), (PAD + TR, PADC + C))
        po_ref[:, :] = body
        vo_ref[:, :] = vnew
        _dot_accum(dot_ref, i, 0, 1, rt_ref[:, :], vnew, compensated)

    blk = lambda: pl.BlockSpec((TR, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    sc = jnp.stack([jnp.asarray(beta, jnp.float32),
                    jnp.asarray(omega, jnp.float32)]).reshape(1, 2)
    po, vo, dot = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            blk(),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[blk(), blk(),
                   pl.BlockSpec((1, ND), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((R, C), dtype),
            jax.ShapeDtypeStruct((R, C), dtype),
            jax.ShapeDtypeStruct((1, ND), jnp.float32),
        ],
        input_output_aliases={1: 0, 2: 1},
        scratch_shapes=[
            pltpu.VMEM((2, W, CW), dtype),
            pltpu.VMEM((2, W, CW), dtype),
            pltpu.VMEM((2, W, CW), dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(2 * len(offsets) + 6) * R * C,
            bytes_accessed=6 * R * C * dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(r, p, v, rt, sc)
    return po, vo, (dot[0, 0] + dot[0, 1] if compensated else dot[0, 0])


@functools.partial(
    jax.jit, static_argnames=("offsets", "values", "tile_rows", "interpret",
                              "compensated")
)
def bicg_st(r, v, alpha, *, offsets, values,
            tile_rows: int = 0, interpret: bool = False,
            compensated: bool = False):
    """(<t, s>, <t, t>) with s = r - alpha v and t = A s both VMEM-only."""
    R, C = r.shape
    dtype = r.dtype
    TR = tile_rows or _pick_tile_rows_nwin(R, C, dtype.itemsize, 2, 0)
    if TR == 0 or R % TR:
        raise ValueError(f"unsupported geometry R={R} C={C}")
    nt = R // TR
    W, CW = TR + 2 * PAD, C + 2 * PADC
    ND = 4 if compensated else 2
    issue, wait, _ = _mk_window_io(TR, C, nt)

    def kernel(r_hbm, v_hbm, sc_ref, dot_ref, rwin, vwin, rs, vs):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            issue(0, r_hbm, rwin, rs)
            issue(0, v_hbm, vwin, vs)

        @pl.when(i + 1 < nt)
        def _():
            issue(i + 1, r_hbm, rwin, rs)
            issue(i + 1, v_hbm, vwin, vs)

        wait(i, r_hbm, rwin, rs)
        wait(i, v_hbm, vwin, vs)
        slot = jnp.asarray(i, jnp.int32) % 2
        _zero_pads(i, (rwin, vwin), W, CW, C, dtype)
        _zero_last(i, nt, (rwin, vwin), W, C, dtype, TR)

        al = sc_ref[0, 0].astype(dtype)
        sw = rwin[slot] - al * vwin[slot]
        t = _apply_window(sw, offsets, values, TR, C, dtype)
        sb = jax.lax.slice(sw, (PAD, PADC), (PAD + TR, PADC + C))
        _dot_accum(dot_ref, i, 0, 2, t, sb, compensated)
        _dot_accum(dot_ref, i, 1, 2, t, t, compensated)

    (dot,) = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[pl.BlockSpec((1, ND), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((1, ND), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((2, W, CW), dtype),
            pltpu.VMEM((2, W, CW), dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(2 * len(offsets) + 6) * R * C,
            bytes_accessed=2 * R * C * dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(r, v, jnp.asarray(alpha, jnp.float32).reshape(1, 1))
    if compensated:
        return dot[0, 0] + dot[0, 2], dot[0, 1] + dot[0, 3]
    return dot[0, 0], dot[0, 1]


@functools.partial(
    jax.jit, static_argnames=("offsets", "values", "tile_rows", "interpret",
                              "compensated")
)
def bicg_update(r, v, x, p, rt, alpha, omega, *, offsets, values,
                tile_rows: int = 0, interpret: bool = False,
                compensated: bool = False):
    """(x', r', <r', r'>, <r~, r'>): x' = x + alpha p + omega s,
    r' = s - omega t with s/t recomputed in VMEM; x/r buffers consumed."""
    R, C = r.shape
    dtype = r.dtype
    TR = tile_rows or _pick_tile_rows_nwin(R, C, dtype.itemsize, 2, 5)
    if TR == 0 or R % TR:
        raise ValueError(f"unsupported geometry R={R} C={C}")
    nt = R // TR
    W, CW = TR + 2 * PAD, C + 2 * PADC
    ND = 4 if compensated else 2
    issue, wait, _ = _mk_window_io(TR, C, nt)
    # r is aliased to the r' output (saves a loop-carried buffer at the
    # BiCGStab max sizes): its top halo must be VMEM-sourced — the
    # round-4 determinism rule for aliased windowed operands
    issue_a, wait_a, copy_top = _mk_window_io(TR, C, nt, top_from_vmem=True)

    def kernel(r_hbm, v_hbm, x_ref, p_ref, rt_ref, sc_ref,
               xo_ref, ro_ref, dot_ref, rwin, vwin, rs, vs):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            issue_a(0, r_hbm, rwin, rs)
            issue(0, v_hbm, vwin, vs)

        @pl.when(i + 1 < nt)
        def _():
            issue_a(i + 1, r_hbm, rwin, rs)
            issue(i + 1, v_hbm, vwin, vs)

        wait_a(i, r_hbm, rwin, rs)
        wait(i, v_hbm, vwin, vs)
        copy_top(i, rwin)
        slot = jnp.asarray(i, jnp.int32) % 2
        _zero_pads(i, (rwin, vwin), W, CW, C, dtype)
        _zero_last(i, nt, (rwin, vwin), W, C, dtype, TR)

        al = sc_ref[0, 0].astype(dtype)
        om = sc_ref[0, 1].astype(dtype)
        sw = rwin[slot] - al * vwin[slot]
        t = _apply_window(sw, offsets, values, TR, C, dtype)
        sb = jax.lax.slice(sw, (PAD, PADC), (PAD + TR, PADC + C))
        xo_ref[:, :] = x_ref[:, :] + al * p_ref[:, :] + om * sb
        rnew = sb - om * t
        ro_ref[:, :] = rnew
        _dot_accum(dot_ref, i, 0, 2, rnew, rnew, compensated)
        _dot_accum(dot_ref, i, 1, 2, rt_ref[:, :], rnew, compensated)

    blk = lambda: pl.BlockSpec((TR, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    sc = jnp.stack([jnp.asarray(alpha, jnp.float32),
                    jnp.asarray(omega, jnp.float32)]).reshape(1, 2)
    xo, ro, dot = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            blk(), blk(), blk(),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[blk(), blk(),
                   pl.BlockSpec((1, ND), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((R, C), dtype),
            jax.ShapeDtypeStruct((R, C), dtype),
            jax.ShapeDtypeStruct((1, ND), jnp.float32),
        ],
        # x consumed via its blk stream; r' aliased onto the windowed r
        # (its top halo is VMEM-sourced, so the in-place write cannot race
        # any window read — see _mk_window_io)
        input_output_aliases={2: 0, 0: 1},
        scratch_shapes=[
            pltpu.VMEM((2, W, CW), dtype),
            pltpu.VMEM((2, W, CW), dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(2 * len(offsets) + 10) * R * C,
            bytes_accessed=7 * R * C * dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(r, v, x, p, rt, sc)
    if compensated:
        return xo, ro, dot[0, 0] + dot[0, 2], dot[0, 1] + dot[0, 3]
    return xo, ro, dot[0, 0], dot[0, 1]
