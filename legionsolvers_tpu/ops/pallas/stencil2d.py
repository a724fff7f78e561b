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
import os
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
    # window buffer depth (see _sstep_call: same env knob drives the
    # round-4 overlap experiments for both window families)
    NBUF = int(os.environ.get("LEGIONSOLVERS_STEP2_NBUF", "2"))

    def issue_window(j, hbm, win, sems, skip_top=False):
        # skip_top: the array is an ALIASED OUTPUT — its top halo would
        # race the previous tile's output write (measured nondeterminism,
        # round 4); it is VMEM-copied from the previous window instead
        slot = jnp.asarray(j, jnp.int32) % NBUF
        pltpu.make_async_copy(
            hbm.at[pl.ds(pl.multiple_of(j * TR, 8), TR), :],
            win.at[slot, pl.ds(PAD, TR), pl.ds(PADC, C)],
            sems.at[slot, 0],
        ).start()
        if rlo > 0 and not skip_top:
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

    def wait_window(j, hbm, win, sems, skip_top=False):
        slot = jnp.asarray(j, jnp.int32) % NBUF
        pltpu.make_async_copy(
            hbm.at[pl.ds(0, TR), :],
            win.at[slot, pl.ds(PAD, TR), pl.ds(PADC, C)],
            sems.at[slot, 0],
        ).wait()
        if rlo > 0 and not skip_top:
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

    def copy_next_top(i, win):
        """Window i+1's top halo = window i's last body rows (VMEM copy
        while window i is valid)."""
        if rlo <= 0:
            return

        @pl.when(i + 1 < nt)
        def _():
            nslot = jnp.asarray(i + 1, jnp.int32) % NBUF
            slot = jnp.asarray(i, jnp.int32) % NBUF
            win[nslot, 0:PAD, PADC : PADC + C] = (
                win[slot, TR : PAD + TR, PADC : PADC + C]
            )

    def kernel(r_hbm, p_hbm, beta_ref, rt_ref, rb_ref, pt_ref, pb_ref,
               p_out, pq_ref, rwin, pwin, rsems, psems):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            # fill the prefetch pipeline: tiles 0 .. NBUF-2 (both
            # bounds static)
            for j0 in range(min(NBUF - 1, nt)):
                issue_window(j0, r_hbm, rwin, rsems)
                issue_window(j0, p_hbm, pwin, psems, skip_top=True)

        @pl.when(i + NBUF - 1 < nt)
        def _():
            issue_window(i + NBUF - 1, r_hbm, rwin, rsems)
            issue_window(i + NBUF - 1, p_hbm, pwin, psems, skip_top=True)

        wait_window(i, r_hbm, rwin, rsems)
        wait_window(i, p_hbm, pwin, psems, skip_top=True)
        copy_next_top(i, pwin)
        slot = jnp.asarray(i, jnp.int32) % NBUF

        @pl.when(i == 0)
        def _():
            for wref in (rwin, pwin):
                for sl in range(NBUF):
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
            pltpu.VMEM((NBUF, W, CW), dtype),
            pltpu.VMEM((NBUF, W, CW), dtype),
            pltpu.SemaphoreType.DMA((NBUF, 3)),
            pltpu.SemaphoreType.DMA((NBUF, 3)),
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


# ===========================================================================
# s-step fused CG: TWO iterations per HBM pass (12 B/unknown/iteration)
# ===========================================================================
#
# The 2-pass fused schedule above is already at its traffic floor for
# one-iteration-at-a-time CG (the alpha = rr/<p,Ap> reduction forces a global
# synchronization between forming p and updating x/r).  s-step CG breaks that
# floor: with s = 2, both iterations' coefficients are rational functions of
# the 10-entry Gram matrix of {r, Ar, p, Ap, A^2p}, which the PREVIOUS pass
# computed, so one pass can apply two full CG iterations:
#
#   reads  x, r, p; writes x'', r'', p''       -> 6 vector passes / 2 iters
#   Ap, A^2p, Ar, Ap'', A^2p'', Ar'' formed in VMEM (never touch HBM)
#   emits the Gram matrix of (r'', p'') for the next pass
#
# = 12 B/unknown/iteration at f32 vs 32 for the 2-pass schedule.  This is the
# same algebra as the reference's own s-step research sketch
# (reference: scripts/krylov.py:34-93, the "double CG" prototype) carried to
# its TPU-native conclusion.  Monomial-basis s=2 is numerically benign for
# the fixed-iteration benchmark regime (trajectories tracked against classic
# CG in tests/test_20_sstep.py); the classic fused path remains the default
# for sharded runs, fp64, and |dy| > 1 stencils.
#
# Update algebra (A symmetric; all dots from the incoming Gram):
#   a0 = rr/<p,Ap>;  r1 = r - a0 Ap;  rr1 = rr - 2 a0 <r,Ap> + a0^2 <Ap,Ap>
#   b1 = rr1/rr;     p1 = r1 + b1 p;  a1 = rr1/<p1,Ap1>
#   x'' = x + (a0 + a1 b1) p + a1 r - a0 a1 Ap
#   r'' = r - (a0 + a1 b1) Ap - a1 Ar + a0 a1 A^2p
#   p'' = r'' + b2 r - b2 a0 Ap + b2 b1 p          (b2 = rr2/rr1)

GRAM_NAMES = ("rr", "pAp", "rAp", "ApAp", "rAr",
              "ApAr", "ApA2p", "ArAr", "ArA2p", "A2pA2p")


# step2 gets a higher budget than the generic kernels: TR=128 at C=4096
# models at ~51 MB and measures ~2% faster than TR=64 (fewer window-halo
# re-reads), still under the 64 MB scoped-vmem limit (62 MB since round
# 5: admits TR = 16 at C = 32768, verified compiling and 16% faster)
_VMEM_BUDGET_STEP2 = 62 * 2**20


def _pick_tile_rows_step2(
    R: int, C: int, itemsize: int, vmem_budget: int = _VMEM_BUDGET_STEP2
) -> int:
    """Tile rows for the step2 kernel: 2 double-buffered windows (r, p), 2
    value-level window loads, ~6 extended-row compute temporaries, and 4
    streamed (TR, C) blocks (x in; x/r/p out), each double-buffered.

    The temporaries coefficient is calibrated against Mosaic's actual
    allocation (round 5): the previous 8x model rejected TR = 16 at
    C = 32768 (modelled 67.5 MB) although it compiles inside the 64 MB
    scoped limit and runs 16% faster than the TR = 8 it forced — the
    wide-row tile starvation behind the 2-D 2^30 rung's 71%-of-stream
    (PROFILE_r05 §5)."""
    best = 0
    tr = 8
    while tr <= min(R, 128):
        W, CW = tr + 16, C + 2 * PADC
        need = (6 * W * CW + 6 * (tr + 8) * CW + 8 * tr * C) * itemsize
        if R % tr == 0 and need <= vmem_budget:
            best = tr
        tr += 8
    return best


def step2_supported(R: int, C: int, offsets, itemsize: int = 4) -> bool:
    """step2/gram2 geometry gate: row bandwidth 1 (four chained stencil
    applications must stay inside the 8-row window pad) and the VMEM
    budget.  Column offsets beyond the lane-pad block (flat 1-D
    decompositions) take the roll+mask path inside applyA; |dx| < C is
    required so one roll suffices."""
    if C % 128 != 0:
        return False
    if any(abs(dy) > 1 for dy, _ in offsets):
        return False
    if any(abs(dx) >= C for _, dx in offsets):
        return False
    return _pick_tile_rows_step2(R, C, itemsize) > 0


def cg2_coeffs(g: jnp.ndarray):
    """(update coefficients [6], rr after iter 1, rr after iter 2) from the
    Gram vector ``g`` ordered as :data:`GRAM_NAMES`.  Pure scalar jnp —
    traced between passes, O(1)."""
    rr, pAp, rAp, ApAp, rAr, ApAr, ApA2p, ArAr, ArA2p, A2pA2p = (
        g[i] for i in range(10)
    )
    a0 = rr / pAp
    rr1 = rr - 2.0 * a0 * rAp + a0 * a0 * ApAp
    b1 = rr1 / rr
    r1Ar1 = rAr - 2.0 * a0 * ApAr + a0 * a0 * ApA2p
    r1Ap = rAp - a0 * ApAp
    p1Ap1 = r1Ar1 + 2.0 * b1 * r1Ap + b1 * b1 * pAp
    a1 = rr1 / p1Ap1
    r1Ap1 = r1Ar1 + b1 * r1Ap
    Ar1Ap = ApAr - a0 * ApA2p
    Ar1Ar1 = ArAr - 2.0 * a0 * ArA2p + a0 * a0 * A2pA2p
    Ap1Ap1 = Ar1Ar1 + 2.0 * b1 * Ar1Ap + b1 * b1 * ApAp
    rr2 = rr1 - 2.0 * a1 * r1Ap1 + a1 * a1 * Ap1Ap1
    b2 = rr2 / rr1
    coef = jnp.stack(
        [a0 + a1 * b1, a1, a0 * a1, b2, b2 * a0, b2 * b1]
    ).astype(jnp.float32)
    return coef, rr1, rr2


def _sstep_call(
    r: jnp.ndarray,
    p: jnp.ndarray,
    extra: tuple,
    *,
    offsets: Tuple[Tuple[int, int], ...],
    values: Tuple[float, ...],
    tile_rows: int = 0,
    mode: str = "step2",
    interpret: bool = False,
):
    """Shared driver for the s=2 kernels (modes ``gram2`` and ``step2``).

    Both stream r and p through dual double-buffered VMEM windows exactly
    like :func:`grid2d_cg_xpay_pq`; there are no halo-block operands — each
    pass is ZERO-HALO (rows outside the local grid are zeroed in the
    window, Dirichlet), and every intermediate stencil application is
    re-masked to the real grid so chained applications see true matrix
    powers, not zero-padded convolutions.  Sharded runs reuse these same
    zero-halo passes per shard and repair the edge rows + Gram entries
    afterwards from pre-exchanged input halos (``parallel/sstep_sharded.py``).
    ``extra`` is () for gram2 and (x, coef) for step2.
    """
    R, C = r.shape
    dtype = r.dtype
    if any(abs(dy) > 1 for dy, _ in offsets):
        raise ValueError("step2 kernels require row bandwidth <= 1")
    TR = tile_rows or _pick_tile_rows_step2(R, C, dtype.itemsize)
    if TR == 0 or R % TR != 0:
        raise ValueError(f"unsupported geometry R={R} C={C} TR={TR}")
    nt = R // TR
    PAD = 8
    W = TR + 2 * PAD
    CW = C + 2 * PADC

    # Round-4 overlap experiment knobs (scripts/probe_binding.py measured
    # the manual-window DMA path sustaining only ~350 GB/s — the NOP
    # variant with zero compute still takes 0.80 of step2's 0.88 ms):
    # NBUF = window buffer depth (2 = classic double buffering);
    # NSPLIT = body-DMA split count (more outstanding descriptors can
    # engage more DMA parallelism)
    NBUF = int(os.environ.get("LEGIONSOLVERS_STEP2_NBUF", "2"))
    NSPLIT = int(os.environ.get("LEGIONSOLVERS_STEP2_SPLIT", "1"))
    if TR % (8 * NSPLIT):
        NSPLIT = 1
    # AUTOBODY: the window BODY rides the automatic pallas pipeline (which
    # sustains full stream) and only the two 8-row halo segments use the
    # manual DMA path (measured at ~350 GB/s for dual windows — the
    # round-4 nop-mode finding, PROFILE_r04.md §1); the body is then
    # copied VMEM->VMEM into the window scratch (~2 VPU ops/elt)
    AUTOBODY = bool(int(os.environ.get("LEGIONSOLVERS_STEP2_AUTOBODY", "0")))

    def issue_window(j, hbm, win, sems):
        slot = jnp.asarray(j, jnp.int32) % NBUF
        TS = TR // NSPLIT
        if not AUTOBODY:
            for q in range(NSPLIT):
                pltpu.make_async_copy(
                    hbm.at[pl.ds(pl.multiple_of(j * TR + q * TS, 8), TS), :],
                    win.at[slot, pl.ds(PAD + q * TS, TS), pl.ds(PADC, C)],
                    sems.at[slot, 3 + q],
                ).start()

        # top (backward) halos are VMEM-copied from the previous window
        # (copy_next_top): an HBM top-halo DMA would race the previous
        # tile's ALIASED output write now that step2 aliases r/p in place
        # (round-4 determinism fix + 2^30 max-size enabler: the loop no
        # longer double-buffers r/p) — and the copy saves the halo re-read

        @pl.when(j < nt - 1)
        def _():
            pltpu.make_async_copy(
                hbm.at[pl.ds(pl.multiple_of((j + 1) * TR, 8), PAD), :],
                win.at[slot, pl.ds(PAD + TR, PAD), pl.ds(PADC, C)],
                sems.at[slot, 2],
            ).start()

    def wait_window(j, hbm, win, sems):
        slot = jnp.asarray(j, jnp.int32) % NBUF
        TS = TR // NSPLIT
        if not AUTOBODY:
            for q in range(NSPLIT):
                pltpu.make_async_copy(
                    hbm.at[pl.ds(0, TS), :],
                    win.at[slot, pl.ds(PAD + q * TS, TS), pl.ds(PADC, C)],
                    sems.at[slot, 3 + q],
                ).wait()

        @pl.when(j < nt - 1)
        def _():
            pltpu.make_async_copy(
                hbm.at[pl.ds(0, PAD), :],
                win.at[slot, pl.ds(PAD + TR, PAD), pl.ds(PADC, C)],
                sems.at[slot, 2],
            ).wait()

    def copy_next_top(i, win):
        """Window i+1's top halo = window i's last body rows, VMEM-copied
        while window i is valid."""

        @pl.when(i + 1 < nt)
        def _():
            nslot = jnp.asarray(i + 1, jnp.int32) % NBUF
            slot = jnp.asarray(i, jnp.int32) % NBUF
            win[nslot, 0:PAD, PADC : PADC + C] = (
                win[slot, TR : PAD + TR, PADC : PADC + C]
            )

    def kernel(r_hbm, p_hbm, *rest):
        rest = list(rest)
        rb_ref = pb_ref = None
        if AUTOBODY:
            rb_ref, pb_ref = rest[0], rest[1]
            rest = rest[2:]
        if mode == "gram2":
            (gram_ref, rwin, pwin, rsems, psems) = rest
        else:
            (x_ref, coef_ref, xo_ref, ro_ref, po_ref, gram_ref,
             rwin, pwin, rsems, psems) = rest
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            # fill the prefetch pipeline: tiles 0 .. NBUF-2 (both
            # bounds static)
            for j0 in range(min(NBUF - 1, nt)):
                issue_window(j0, r_hbm, rwin, rsems)
                issue_window(j0, p_hbm, pwin, psems)

        @pl.when(i + NBUF - 1 < nt)
        def _():
            issue_window(i + NBUF - 1, r_hbm, rwin, rsems)
            issue_window(i + NBUF - 1, p_hbm, pwin, psems)

        wait_window(i, r_hbm, rwin, rsems)
        wait_window(i, p_hbm, pwin, psems)
        copy_next_top(i, rwin)
        copy_next_top(i, pwin)
        slot = jnp.asarray(i, jnp.int32) % NBUF
        if AUTOBODY:
            # body arrives via the automatic pipeline; land it in the
            # window scratch (VMEM->VMEM, ~2 VPU ops/elt)
            rwin[slot, PAD : PAD + TR, PADC : PADC + C] = rb_ref[:, :]
            pwin[slot, PAD : PAD + TR, PADC : PADC + C] = pb_ref[:, :]

        @pl.when(i == 0)
        def _():
            for wref in (rwin, pwin):
                for sl in range(NBUF):
                    wref[sl, :, 0:PADC] = jnp.zeros((W, PADC), dtype)
                    wref[sl, :, PADC + C : CW] = jnp.zeros((W, PADC), dtype)

        # out-of-grid rows are Dirichlet zeros (single-shard contract)
        @pl.when(i == 0)
        def _():
            rwin[slot, 0:PAD, PADC : PADC + C] = jnp.zeros((PAD, C), dtype)
            pwin[slot, 0:PAD, PADC : PADC + C] = jnp.zeros((PAD, C), dtype)

        @pl.when(i == nt - 1)
        def _():
            rwin[slot, PAD + TR : W, PADC : PADC + C] = (
                jnp.zeros((PAD, C), dtype)
            )
            pwin[slot, PAD + TR : W, PADC : PADC + C] = (
                jnp.zeros((PAD, C), dtype)
            )

        wr = rwin[slot, :, :]
        wp = pwin[slot, :, :]

        def applyA(val):
            """One stencil application; rows shrink by 1 each side.  +-1.0
            coefficients fold into the add/subtract (no multiply).  Terms
            with |dx| beyond the zero-pad columns (the flat 1-D
            decomposition's row-wrap terms, decompose_flat_offsets) roll
            the lanes and mask the wrapped range per term — the same
            validity algebra as the matvec/BiCGStab kernels, costing a
            couple of VPU ops per wrapped term (headroom exists: the pass
            is stream-bound, PROFILE_r04.md §1)."""
            m = val.shape[0]
            acc = None
            wcids = None
            for (dy, dx), v in zip(offsets, values):
                sh = jax.lax.slice(val, (1 + dy, 0), (m - 1 + dy, CW))
                if dx:
                    sh = pltpu.roll(sh, (-dx) % CW, 1)
                if abs(dx) > PADC - 8:
                    # wrapped lanes land INSIDE the body; kill them by the
                    # original-column validity c in [max(0,-dx), C-dx)
                    if wcids is None:
                        wcids = jax.lax.broadcasted_iota(
                            jnp.int32, (m - 2, CW), 1
                        ) - PADC
                    valid = (wcids >= -dx) & (wcids < C - dx)
                    sh = jnp.where(valid, sh, jnp.zeros((), dtype))
                if acc is None:
                    acc = sh if v == 1.0 else (-sh if v == -1.0
                                               else jnp.asarray(v, dtype) * sh)
                elif v == 1.0:
                    acc = acc + sh
                elif v == -1.0:
                    acc = acc - sh
                else:
                    acc = acc + jnp.asarray(v, dtype) * sh
            return acc

        # one 0/1 mask for the whole window, built once per tile; every
        # masked intermediate is a single multiply by a row-aligned slice.
        # (A round-3 experiment cached this in a persistent VMEM scratch
        # rebuilt only on edge tiles; measured SLOWER on chip — 0.63 vs
        # 0.43 ms/iter end-to-end: the VMEM round-trip costs more than the
        # register-resident iota+compare chain Mosaic emits here.)
        rid = jax.lax.broadcasted_iota(jnp.int32, (W, CW), 0) + (i * TR - PAD)
        cid = jax.lax.broadcasted_iota(jnp.int32, (W, CW), 1)
        maskW = (
            (rid >= 0) & (rid < R) & (cid >= PADC) & (cid < PADC + C)
        ).astype(dtype)

        def mask(val, lo):
            """Zero entries outside the real grid.  ``lo`` is the global row
            of val's first row relative to this tile's first body row."""
            return val * jax.lax.slice(
                maskW, (PAD + lo, 0), (PAD + lo + val.shape[0], CW)
            )

        body = lambda a, lo: jax.lax.slice(
            a, (-lo, PADC), (-lo + TR, PADC + C)
        )

        def accum(vals_):
            @pl.when(i == 0)
            def _():
                for j, s in enumerate(vals_):
                    gram_ref[0, j] = s

            @pl.when(i > 0)
            def _():
                for j, s in enumerate(vals_):
                    gram_ref[0, j] = gram_ref[0, j] + s

        def gram(rb, pb, Apb, A2pb, Arb):
            d = lambda a, b: jnp.sum((a * b).astype(jnp.float32))
            accum((
                d(rb, rb), d(pb, Apb), d(rb, Apb), d(Apb, Apb), d(rb, Arb),
                d(Apb, Arb), d(Apb, A2pb), d(Arb, Arb), d(Arb, A2pb),
                d(A2pb, A2pb),
            ))

        if mode == "gram2":
            p2e = jax.lax.slice(wp, (PAD - 2, 0), (PAD + TR + 2, CW))
            r1e = jax.lax.slice(wr, (PAD - 1, 0), (PAD + TR + 1, CW))
            Ap1 = mask(applyA(p2e), -1)
            A2p = applyA(Ap1)
            Ar = applyA(r1e)
            gram(
                body(wr, -PAD), body(wp, -PAD),
                body(Ap1, -1), A2p[:, PADC : PADC + C],
                Ar[:, PADC : PADC + C],
            )
            return

        if mode == "nop":
            # DIAGNOSTIC mode (scripts/probe_binding.py): identical I/O
            # traffic and DMA structure to step2, trivial VPU body — its
            # runtime is the DMA machinery's own ceiling, separating
            # pipeline health from compute/DMA contention
            rb0 = jax.lax.slice(wr, (PAD, PADC), (PAD + TR, PADC + C))
            pb0 = jax.lax.slice(wp, (PAD, PADC), (PAD + TR, PADC + C))
            xo_ref[:, :] = x_ref[:, :] + rb0
            ro_ref[:, :] = rb0
            po_ref[:, :] = pb0
            accum(tuple(
                jnp.sum((rb0 * pb0).astype(jnp.float32)) if j == 0
                else jnp.float32(0.0)
                for j in range(10)
            ))
            return

        # ---- step2 ----
        # Five stencil applications per two CG iterations, using linearity:
        #   u  = c0 p + c1 r - c2 Ap        (= x'' - x)
        #   r'' = r - A u                    (c0 Ap + c1 Ar - c2 A^2p = A u)
        #   p'' = r'' + c3 r - c4 Ap + c5 p
        # then Ap'', A^2p'', Ar'' for the next pass's Gram.
        c0 = coef_ref[0, 0].astype(dtype)
        c1 = coef_ref[0, 1].astype(dtype)
        c2 = coef_ref[0, 2].astype(dtype)
        c3 = coef_ref[0, 3].astype(dtype)
        c4 = coef_ref[0, 4].astype(dtype)
        c5 = coef_ref[0, 5].astype(dtype)

        ext = lambda a, e: jax.lax.slice(
            a, (PAD - e, 0), (PAD + TR + e, CW)
        )
        s3 = mask(applyA(ext(wp, 4)), -3)               # A p  on [-3, TR+3)
        u3 = c0 * ext(wp, 3) + c1 * ext(wr, 3) - c2 * s3
        t2 = mask(applyA(u3), -2)                       # A u  on [-2, TR+2)
        rn = ext(wr, 2) - t2                            # r''  on [-2, TR+2)
        s2 = jax.lax.slice(s3, (1, 0), (TR + 5, CW))
        pn = rn + c3 * ext(wr, 2) - c4 * s2 + c5 * ext(wp, 2)
        Apn1 = mask(applyA(jax.lax.slice(pn, (0, 0), (TR + 4, CW))), -1)
        A2pn = applyA(Apn1)                             # rows [0, TR)
        Arn = applyA(jax.lax.slice(rn, (1, 0), (TR + 3, CW)))

        xo_ref[:, :] = x_ref[:, :] + body(u3, -3)
        rb = body(rn, -2)
        pb = body(pn, -2)
        ro_ref[:, :] = rb
        po_ref[:, :] = pb
        gram(rb, pb, body(Apn1, -1), A2pn[:, PADC : PADC + C],
             Arn[:, PADC : PADC + C])

    smem1 = lambda n: pl.BlockSpec(
        (1, n), lambda i: (0, 0), memory_space=pltpu.SMEM
    )
    blk = lambda: pl.BlockSpec(
        (TR, C), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),   # r in HBM
        pl.BlockSpec(memory_space=pl.ANY),   # p in HBM
    ]
    operands = [r, p]
    if AUTOBODY:
        # same arrays again, body-blocked on the automatic pipeline
        in_specs += [blk(), blk()]
        operands += [r, p]
    out_shape = []
    out_specs = []
    aliases = {}
    if mode in ("step2", "nop"):
        x, coef = extra
        operands += [x, coef.reshape(1, 6).astype(jnp.float32)]
        in_specs += [blk(), smem1(6)]
        out_shape += [
            jax.ShapeDtypeStruct((R, C), dtype),   # x''
            jax.ShapeDtypeStruct((R, C), dtype),   # r''
            jax.ShapeDtypeStruct((R, C), dtype),   # p''
        ]
        out_specs += [blk(), blk(), blk()]
        # x streams body-only blocks (block i fully read before the
        # aliased output i is written).  r and p are ALSO aliased in place
        # since the round-4 fix: their backward (top) halos come from the
        # previous VMEM window — never re-read from HBM — and forward
        # reads complete (semaphore-waited) before the corresponding
        # output write is enqueued, so in-place writes cannot race any
        # window read.  This keeps the whole s-step solve at THREE live
        # vectors (the 2^30-unknowns-per-chip enabler).  AUTOBODY (the
        # diagnostic body-via-pipeline mode) re-reads r/p as blocked
        # operands, so it keeps only the x alias.  NOALIAS (diagnostic):
        # drop all aliasing.
        if int(os.environ.get("LEGIONSOLVERS_STEP2_NOALIAS", "0")):
            aliases = {}
        elif AUTOBODY:
            aliases = {4: 0}
        else:
            aliases = {2: 0, 0: 1, 1: 2}
    out_shape.append(jax.ShapeDtypeStruct((1, 10), jnp.float32))
    out_specs.append(smem1(10))
    bytes_accessed = (2 if mode == "gram2" else 6) * R * C * dtype.itemsize
    napply = 3 if mode == "gram2" else 6
    result = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        scratch_shapes=[
            pltpu.VMEM((NBUF, W, CW), dtype),
            pltpu.VMEM((NBUF, W, CW), dtype),
            pltpu.SemaphoreType.DMA((NBUF, 3 + NSPLIT)),
            pltpu.SemaphoreType.DMA((NBUF, 3 + NSPLIT)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(2 * len(offsets) * napply + 40) * R * C,
            bytes_accessed=bytes_accessed,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return result


@functools.partial(
    jax.jit, static_argnames=("offsets", "values", "tile_rows", "interpret")
)
def grid2d_cg_gram2(
    r, p, *, offsets, values, tile_rows: int = 0, interpret: bool = False
):
    """Gram vector (ordered :data:`GRAM_NAMES`) of (r, p) — the s-step CG
    bootstrap pass (8 B/elt, once per solve)."""
    (g,) = _sstep_call(
        r, p, (), offsets=offsets, values=values, tile_rows=tile_rows,
        mode="gram2", interpret=interpret,
    )
    return g[0]


@functools.partial(
    jax.jit, static_argnames=("offsets", "values", "tile_rows", "interpret")
)
def grid2d_cg_step2(
    x, r, p, coef, *, offsets, values, tile_rows: int = 0,
    interpret: bool = False,
):
    """TWO fused CG iterations in one pass (24 B/elt): returns
    (x'', r'', p'', gram(r'', p'')) given the coefficient vector from
    :func:`cg2_coeffs`.  ``x``'s buffer is consumed (aliased)."""
    xo, ro, po, g = _sstep_call(
        r, p, (x, coef), offsets=offsets, values=values,
        tile_rows=tile_rows, mode="step2", interpret=interpret,
    )
    return xo, ro, po, g[0]
