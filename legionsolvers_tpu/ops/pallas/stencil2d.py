"""Pallas TPU kernels: 2-D grid stencil SpMV and fused-CG passes.

This is the performance replacement for the reference's cuSPARSE SpMV leaf
tasks (reference: CSRMatrixTasks.cu:14-156, COOMatrixTasks.cu:12-146) for
stencil operators, plus fused whole-iteration CG passes the reference has no
analog of (its iteration is 6 separate task launches, CGSolver.hpp:46-55).

All kernels share one structure: the source grid x stays in HBM and is
streamed tile-by-tile through a double-buffered VMEM window (3-segment manual
DMA: the tile body plus its +-bandwidth row halo), and every stencil diagonal
is formed from VMEM slices.  Measured on v5e these run at ~95% of the HBM
streaming roofline, so the remaining lever is *bytes per iteration*; the
fused modes exist to cut those:

* ``mode="y"``      : y = A x                      (8 B/elt: read x, write y)
* ``mode="y_dot"``  : y = A x and <x, A x>         (8 B/elt)
* ``mode="pq"``     : <x, A x> only — A x is formed in VMEM and never
                      written back                  (4 B/elt: read x)
* ``mode="update"`` : the CG interior update: given p, xv(=x), rv(=r), alpha:
                      q = A p in VMEM; x' = x + alpha p; r' = r - alpha q;
                      rr = <r', r'>                 (20 B/elt; q never in HBM)

A CG iteration scheduled as pq + update + an XLA xpay moves 36 B/unknown vs
48 B for the classic matvec/axpy/dot/xpay schedule — q is never materialized.

Layout: x is the 2-D grid [R, C] (C a multiple of 128, R a multiple of the
row tile).  Stencil offsets are (dy, dx) pairs; dy is handled by row-shifted
VMEM slices (grid-boundary rows come from caller-provided halo blocks, which
are zeros on the outermost shards and neighbor edge rows otherwise), dx by
zero-padded window columns (|dx| <= 128) or a lane roll plus a column mask.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


PADC = 128  # column padding (one lane tile) on each side of the window
# We raise Mosaic's scoped-vmem limit from its 16M default (v5e has 128M
# physical VMEM per core) and budget against this; the cost model below
# still overestimates Mosaic's actual stack allocation to keep a margin.
_VMEM_LIMIT = 64 * 2**20
_VMEM_BUDGET = 40 * 2**20


def _pick_tile_rows(
    R: int, C: int, itemsize: int, n_streams: int = 1,
    vmem_budget: int = _VMEM_BUDGET,
) -> int:
    """Largest row tile (multiple of 8, dividing R, <= 128) fitting the VMEM
    budget.  128 caps the tile: measured on v5e, 64-128 rows x 4096 cols
    already saturates HBM streaming and larger tiles only grow VMEM stack.

    ``n_streams`` counts the pipelined (TR, C) block arrays besides the
    window (outputs and extra inputs), each double-buffered by the pipeline.
    The model charges the double-buffered window scratch (2 W*CW), the
    value-level window load (W*CW), and ~3 (TR, C) compute temporaries.
    """
    best = 0
    tr = 8
    while tr <= min(R, 128):
        W, CW = tr + 16, C + 2 * PADC
        need = (3 * W * CW + (2 * n_streams + 3) * tr * C) * itemsize
        if R % tr == 0 and need <= vmem_budget:
            best = tr
        tr += 8
    return best


def supports(R: int, C: int, offsets, itemsize: int = 4, n_streams: int = 4) -> bool:
    """Whether the kernel family handles this geometry.  ``n_streams=4``
    (the update mode's stream count) guarantees every mode fits."""
    if C % 128 != 0:
        return False
    tr = _pick_tile_rows(R, C, itemsize, n_streams)
    if tr == 0:
        return False
    rlo = max(0, -min(dy for dy, _ in offsets))
    rhi = max(0, max(dy for dy, _ in offsets))
    # the window provides exactly 8 halo rows above/below each tile and row
    # shifts are slices at PAD + dy, so |dy| must fit in one 8-row pad block
    return rlo <= 8 and rhi <= 8 and all(abs(dx) < C for _, dx in offsets)


def decompose_flat_offsets(flat_offsets, values, C: int):
    """Rewrite 1-D linearized shifts as (dy, dx) terms over a [R, C] view.

    A flat shift ``s = q*C + r`` (0 <= r < C) reads, for column c, either
    row+q col c+r (when c+r < C) or row+q+1 col c+r-C — exactly the two
    complementary column-masked terms the kernel's roll+mask produces, so any
    1-D banded operator maps onto the 2-D kernel with no extra masking."""
    offs, vals = [], []
    for s, v in zip(flat_offsets, values):
        q, r = divmod(int(s), C)
        if r == 0:
            offs.append((q, 0))
            vals.append(float(v))
        else:
            offs.append((q, r))
            vals.append(float(v))
            offs.append((q + 1, r - C))
            vals.append(float(v))
    return tuple(offs), tuple(vals)


_N_STREAMS = {"y": 1, "y_dot": 1, "pq": 0, "update": 4}


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "values", "tile_rows", "mode", "interpret"),
)
def _stencil_call(
    x: jnp.ndarray,
    halo_top: jnp.ndarray,
    halo_bot: jnp.ndarray,
    extra: tuple,
    *,
    offsets: Tuple[Tuple[int, int], ...],
    values: Tuple[float, ...],
    tile_rows: int = 0,
    mode: str = "y",
    interpret: bool = False,
):
    """Shared kernel driver; see module docstring for the modes.

    ``halo_top`` and ``halo_bot`` are [8, C] blocks supplying the rows just
    above/below this array: the *last* rlo rows of ``halo_top`` and the
    *first* rhi rows of ``halo_bot`` are real (zeros at the global grid
    edges); remaining rows are ignored padding that keeps the VMEM stores
    sublane-aligned.  ``extra`` is () except for mode="update", where it is
    (xv, rv, alpha) with alpha a [1, 1] f32.
    """
    R, C = x.shape
    dtype = x.dtype
    rlo = max(0, -min(dy for dy, _ in offsets))
    rhi = max(0, max(dy for dy, _ in offsets))
    TR = tile_rows or _pick_tile_rows(R, C, dtype.itemsize, _N_STREAMS[mode])
    if TR == 0 or R % TR != 0 or rlo > 8 or rhi > 8:
        raise ValueError(f"unsupported geometry R={R} C={C} TR={TR}")
    nt = R // TR
    # Window layout (per slot): 8 padding/halo rows, TR body rows, 8 rows.
    # DMA destinations must start at sublane-aligned (multiple-of-8) row
    # offsets, so halo segments are full 8-row copies; only the innermost
    # rlo/rhi of them are read.
    PAD = 8
    W = TR + 2 * PAD
    CW = C + 2 * PADC  # window width: zero pad columns make masks free

    def issue_window(j, x_hbm, win, sems):
        """Start the 3-segment DMA for window j into slot j % 2 (columns
        land at [PADC, PADC + C); the pad columns stay zero)."""
        slot = jnp.asarray(j, jnp.int32) % 2
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(j * TR, 8), TR), :],
            win.at[slot, pl.ds(PAD, TR), pl.ds(PADC, C)],
            sems.at[slot, 0],
        ).start()
        if rlo > 0:
            @pl.when(j > 0)
            def _():
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(pl.multiple_of(j * TR - PAD, 8), PAD), :],
                    win.at[slot, pl.ds(0, PAD), pl.ds(PADC, C)],
                    sems.at[slot, 1],
                ).start()
        if rhi > 0:
            @pl.when(j < nt - 1)
            def _():
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(pl.multiple_of((j + 1) * TR, 8), PAD), :],
                    win.at[slot, pl.ds(PAD + TR, PAD), pl.ds(PADC, C)],
                    sems.at[slot, 2],
                ).start()

    def wait_window(j, x_hbm, win, sems):
        slot = jnp.asarray(j, jnp.int32) % 2
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(0, TR), :],
            win.at[slot, pl.ds(PAD, TR), pl.ds(PADC, C)],
            sems.at[slot, 0],
        ).wait()
        if rlo > 0:
            @pl.when(j > 0)
            def _():
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(0, PAD), :],
                    win.at[slot, pl.ds(0, PAD), pl.ds(PADC, C)],
                    sems.at[slot, 1],
                ).wait()
        if rhi > 0:
            @pl.when(j < nt - 1)
            def _():
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(0, PAD), :],
                    win.at[slot, pl.ds(PAD + TR, PAD), pl.ds(PADC, C)],
                    sems.at[slot, 2],
                ).wait()

    def kernel(x_hbm, top_ref, bot_ref, *rest):
        if mode == "y":
            (y_ref, win, sems) = rest
        elif mode == "y_dot":
            (y_ref, dot_ref, win, sems) = rest
        elif mode == "pq":
            (dot_ref, win, sems) = rest
        else:  # update
            (xv_ref, rv_ref, alpha_ref,
             xo_ref, ro_ref, rr_ref, win, sems) = rest
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            issue_window(0, x_hbm, win, sems)

        @pl.when(i + 1 < nt)
        def _():
            issue_window(i + 1, x_hbm, win, sems)

        wait_window(i, x_hbm, win, sems)
        slot = jnp.asarray(i, jnp.int32) % 2

        # zero the pad columns of both slots once (they are never written
        # by the DMAs, and zero pads make column-boundary masking free)
        @pl.when(i == 0)
        def _():
            for sl in (0, 1):
                win[sl, :, 0:PADC] = jnp.zeros((W, PADC), dtype)
                win[sl, :, PADC + C : CW] = jnp.zeros((W, PADC), dtype)

        # grid-edge halo rows from the provided blocks (full aligned 8-row
        # stores; the caller pads the halo blocks to PAD rows)
        if rlo > 0:
            @pl.when(i == 0)
            def _():
                win[slot, 0:PAD, PADC : PADC + C] = top_ref[:, :]
        if rhi > 0:
            @pl.when(i == nt - 1)
            def _():
                win[slot, PAD + TR : PAD + TR + PAD, PADC : PADC + C] = (
                    bot_ref[:, :]
                )

        # Load the whole window once (aligned), then form shifts as
        # value-level slices (sublane/lane shuffles) — sublane-unaligned
        # *ref* accesses are rejected by Mosaic.  Offsets with |dx| <= PADC
        # read straight from the zero-padded window (no masks); larger |dx|
        # (flat 1-D decompositions) take the roll+mask path.
        wv = win[slot, :, :]
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
                # pltpu.roll needs a non-negative shift; (-dx) mod C is the
                # same circular shift
                rolled = pltpu.roll(rows, (-dx) % C, 1)
                if cids is None:
                    cids = jax.lax.broadcasted_iota(jnp.int32, (TR, C), 1)
                valid = (cids >= -dx) & (cids < C - dx)
                sh = jnp.where(valid, rolled, jnp.zeros((), dtype))
            term = jnp.asarray(v, dtype) * sh
            acc = term if acc is None else acc + term

        def accum_scalar(ref, part):
            @pl.when(i == 0)
            def _():
                ref[0, 0] = part

            @pl.when(i > 0)
            def _():
                ref[0, 0] = ref[0, 0] + part

        if mode in ("y", "y_dot"):
            y_ref[:, :] = acc
        body = lambda: jax.lax.slice(wv, (PAD, PADC), (PAD + TR, PADC + C))
        if mode in ("y_dot", "pq"):
            part = jnp.sum((body() * acc).astype(jnp.float32))
            accum_scalar(dot_ref, part)
        if mode == "update":
            alpha = alpha_ref[0, 0].astype(dtype)
            xo_ref[:, :] = xv_ref[:, :] + alpha * body()
            rnew = rv_ref[:, :] - alpha * acc
            ro_ref[:, :] = rnew
            accum_scalar(rr_ref, jnp.sum((rnew * rnew).astype(jnp.float32)))

    blk = lambda: pl.BlockSpec((TR, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem = lambda: pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),   # x stays in HBM
        pl.BlockSpec(memory_space=pltpu.VMEM),  # halo_top (small)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # halo_bot (small)
    ]
    out_shape, out_specs = [], []
    operands = [x, halo_top, halo_bot]
    aliases = {}
    bytes_accessed = R * C * dtype.itemsize  # read x
    if mode in ("y", "y_dot"):
        out_shape.append(jax.ShapeDtypeStruct((R, C), dtype))
        out_specs.append(blk())
        bytes_accessed += R * C * dtype.itemsize
    if mode in ("y_dot", "pq"):
        out_shape.append(jax.ShapeDtypeStruct((1, 1), jnp.float32))
        out_specs.append(smem())
    if mode == "update":
        xv, rv, alpha = extra
        operands += [xv, rv, alpha.reshape(1, 1).astype(jnp.float32)]
        in_specs += [blk(), blk(), smem()]
        out_shape += [
            jax.ShapeDtypeStruct((R, C), dtype),   # x'
            jax.ShapeDtypeStruct((R, C), dtype),   # r'
            jax.ShapeDtypeStruct((1, 1), jnp.float32),  # rr
        ]
        out_specs += [blk(), blk(), smem()]
        # x/r are consumed: write the updates into the same buffers
        aliases = {3: 0, 4: 1}
        bytes_accessed += 4 * R * C * dtype.itemsize

    result = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        scratch_shapes=[
            pltpu.VMEM((2, W, CW), dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * len(offsets) * R * C,
            bytes_accessed=bytes_accessed,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return result


def grid2d_stencil_matvec(
    x, halo_top, halo_bot, *, offsets, values,
    tile_rows: int = 0, with_dot: bool = False, interpret: bool = False,
):
    """y = A @ x (and optionally <x, y>) for the stencil {(dy,dx): v}."""
    mode = "y_dot" if with_dot else "y"
    result = _stencil_call(
        x, halo_top, halo_bot, (), offsets=offsets, values=values,
        tile_rows=tile_rows, mode=mode, interpret=interpret,
    )
    if with_dot:
        y, dot = result
        return y, dot[0, 0]
    return result[0]


def grid2d_cg_pq(
    p, halo_top, halo_bot, *, offsets, values,
    tile_rows: int = 0, interpret: bool = False,
):
    """<p, A p> without materializing A p (fused-CG pass 1; 4 B/elt)."""
    (dot,) = _stencil_call(
        p, halo_top, halo_bot, (), offsets=offsets, values=values,
        tile_rows=tile_rows, mode="pq", interpret=interpret,
    )
    return dot[0, 0]


def grid2d_cg_update(
    p, x, r, alpha, halo_top, halo_bot, *, offsets, values,
    tile_rows: int = 0, interpret: bool = False,
):
    """(x + alpha p, r - alpha A p, <r', r'>) with A p formed in VMEM only
    (fused-CG pass 2; 20 B/elt).  ``x`` and ``r`` buffers are consumed
    (aliased to the outputs)."""
    xo, ro, rr = _stencil_call(
        p, halo_top, halo_bot,
        (x, r, jnp.asarray(alpha, jnp.float32)),
        offsets=offsets, values=values,
        tile_rows=tile_rows, mode="update", interpret=interpret,
    )
    return xo, ro, rr[0, 0]


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "values", "tile_rows", "interpret"),
)
def grid2d_cg_xpay_pq(
    r: jnp.ndarray,
    p_old: jnp.ndarray,
    beta: jnp.ndarray,
    r_top: jnp.ndarray,
    r_bot: jnp.ndarray,
    p_top: jnp.ndarray,
    p_bot: jnp.ndarray,
    *,
    offsets: Tuple[Tuple[int, int], ...],
    values: Tuple[float, ...],
    tile_rows: int = 0,
    interpret: bool = False,
):
    """(p, <p, A p>) where p = r + beta * p_old (fused-CG pass 1; 12 B/elt).

    Both ``r`` and ``p_old`` stream through their own double-buffered VMEM
    windows (each with row halos); p is formed window-wide in VMEM — its
    halo rows come out correct because p_halo = r_halo + beta * p_old_halo —
    so A p and <p, A p> need no materialized p halo exchange beyond the two
    input halos.  ``p_old``'s buffer is consumed (aliased to the p output).
    """
    R, C = r.shape
    dtype = r.dtype
    rlo = max(0, -min(dy for dy, _ in offsets))
    rhi = max(0, max(dy for dy, _ in offsets))
    # two windows + one output stream
    TR = tile_rows or _pick_tile_rows_dual(R, C, dtype.itemsize)
    if TR == 0 or R % TR != 0 or rlo > 8 or rhi > 8:
        raise ValueError(f"unsupported geometry R={R} C={C} TR={TR}")
    nt = R // TR
    PAD = 8
    W = TR + 2 * PAD
    CW = C + 2 * PADC

    def issue_window(j, hbm, win, sems):
        slot = jnp.asarray(j, jnp.int32) % 2
        pltpu.make_async_copy(
            hbm.at[pl.ds(pl.multiple_of(j * TR, 8), TR), :],
            win.at[slot, pl.ds(PAD, TR), pl.ds(PADC, C)],
            sems.at[slot, 0],
        ).start()
        if rlo > 0:
            @pl.when(j > 0)
            def _():
                pltpu.make_async_copy(
                    hbm.at[pl.ds(pl.multiple_of(j * TR - PAD, 8), PAD), :],
                    win.at[slot, pl.ds(0, PAD), pl.ds(PADC, C)],
                    sems.at[slot, 1],
                ).start()
        if rhi > 0:
            @pl.when(j < nt - 1)
            def _():
                pltpu.make_async_copy(
                    hbm.at[pl.ds(pl.multiple_of((j + 1) * TR, 8), PAD), :],
                    win.at[slot, pl.ds(PAD + TR, PAD), pl.ds(PADC, C)],
                    sems.at[slot, 2],
                ).start()

    def wait_window(j, hbm, win, sems):
        slot = jnp.asarray(j, jnp.int32) % 2
        pltpu.make_async_copy(
            hbm.at[pl.ds(0, TR), :],
            win.at[slot, pl.ds(PAD, TR), pl.ds(PADC, C)],
            sems.at[slot, 0],
        ).wait()
        if rlo > 0:
            @pl.when(j > 0)
            def _():
                pltpu.make_async_copy(
                    hbm.at[pl.ds(0, PAD), :],
                    win.at[slot, pl.ds(0, PAD), pl.ds(PADC, C)],
                    sems.at[slot, 1],
                ).wait()
        if rhi > 0:
            @pl.when(j < nt - 1)
            def _():
                pltpu.make_async_copy(
                    hbm.at[pl.ds(0, PAD), :],
                    win.at[slot, pl.ds(PAD + TR, PAD), pl.ds(PADC, C)],
                    sems.at[slot, 2],
                ).wait()

    def kernel(r_hbm, p_hbm, beta_ref, rt_ref, rb_ref, pt_ref, pb_ref,
               p_out, pq_ref, rwin, pwin, rsems, psems):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            issue_window(0, r_hbm, rwin, rsems)
            issue_window(0, p_hbm, pwin, psems)

        @pl.when(i + 1 < nt)
        def _():
            issue_window(i + 1, r_hbm, rwin, rsems)
            issue_window(i + 1, p_hbm, pwin, psems)

        wait_window(i, r_hbm, rwin, rsems)
        wait_window(i, p_hbm, pwin, psems)
        slot = jnp.asarray(i, jnp.int32) % 2

        @pl.when(i == 0)
        def _():
            for wref in (rwin, pwin):
                for sl in (0, 1):
                    wref[sl, :, 0:PADC] = jnp.zeros((W, PADC), dtype)
                    wref[sl, :, PADC + C : CW] = jnp.zeros((W, PADC), dtype)

        if rlo > 0:
            @pl.when(i == 0)
            def _():
                rwin[slot, 0:PAD, PADC : PADC + C] = rt_ref[:, :]
                pwin[slot, 0:PAD, PADC : PADC + C] = pt_ref[:, :]
        if rhi > 0:
            @pl.when(i == nt - 1)
            def _():
                rwin[slot, PAD + TR :, PADC : PADC + C] = rb_ref[:, :]
                pwin[slot, PAD + TR :, PADC : PADC + C] = pb_ref[:, :]

        beta_v = beta_ref[0, 0].astype(dtype)
        pw = rwin[slot, :, :] + beta_v * pwin[slot, :, :]
        cids = None
        acc = None
        for (dy, dx), v in zip(offsets, values):
            if abs(dx) <= PADC:
                sh = jax.lax.slice(
                    pw, (PAD + dy, PADC + dx), (PAD + dy + TR, PADC + dx + C)
                )
            else:
                rows = jax.lax.slice(
                    pw, (PAD + dy, PADC), (PAD + dy + TR, PADC + C)
                )
                rolled = pltpu.roll(rows, (-dx) % C, 1)
                if cids is None:
                    cids = jax.lax.broadcasted_iota(jnp.int32, (TR, C), 1)
                valid = (cids >= -dx) & (cids < C - dx)
                sh = jnp.where(valid, rolled, jnp.zeros((), dtype))
            term = jnp.asarray(v, dtype) * sh
            acc = term if acc is None else acc + term

        body = jax.lax.slice(pw, (PAD, PADC), (PAD + TR, PADC + C))
        p_out[:, :] = body
        part = jnp.sum((body * acc).astype(jnp.float32))

        @pl.when(i == 0)
        def _():
            pq_ref[0, 0] = part

        @pl.when(i > 0)
        def _():
            pq_ref[0, 0] = pq_ref[0, 0] + part

    halo = pl.BlockSpec(memory_space=pltpu.VMEM)
    result = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # r in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # p_old in HBM
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            halo, halo, halo, halo,
        ],
        out_specs=[
            pl.BlockSpec((TR, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, C), dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        input_output_aliases={1: 0},  # p_old buffer becomes p
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
            flops=(2 * len(offsets) + 4) * R * C,
            bytes_accessed=3 * R * C * dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(r, p_old, jnp.asarray(beta, jnp.float32).reshape(1, 1),
      r_top, r_bot, p_top, p_bot)
    p, pq = result
    return p, pq[0, 0]


def _pick_tile_rows_dual(
    R: int, C: int, itemsize: int, vmem_budget: int = _VMEM_BUDGET
) -> int:
    """Tile rows for the dual-window xpay_pq kernel: 2 double-buffered
    windows, 3 value-level window loads (r, p_old, p), 1 double-buffered
    output stream, ~3 compute temporaries."""
    best = 0
    tr = 8
    while tr <= min(R, 128):
        W, CW = tr + 16, C + 2 * PADC
        need = (7 * W * CW + 5 * tr * C) * itemsize
        if R % tr == 0 and need <= vmem_budget:
            best = tr
        tr += 8
    return best
