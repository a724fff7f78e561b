"""Pallas TPU kernel: windowed-gather ELL SpMV for general sparse matrices.

This is the TPU answer to the round-3 finding that closed the door on a
direct gather kernel: Mosaic's ``tpu.dynamic_gather`` reaches ONE vreg along
the gather axis (established adversarially in round 3; see
``ops/pallas/dia2d.py``), so gathering ``x[cols]`` from an arbitrary-length
VMEM buffer cannot be expressed in one op.  What CAN be expressed is a
gather from a 128-lane chunk (broadcast one window row to all sublanes,
``take_along_axis`` along lanes), so this kernel decomposes the gather into
a *static chunk sweep*:

    g = 0
    for c in range(KR):                       # KR = window rows of 128
        g = where(idx >> 7 == c, gather(window[c], idx & 127), g)

at a VPU cost of ~4 vector ops per (nonzero, chunk) — i.e. ~4*KR ops per
nonzero.  For this to be fast, KR must be small, which is a *data layout*
problem solved at build time on the host:

* rows are reordered by reverse Cuthill-McKee (``native.rcm_permutation``)
  so all columns of a row live within a band (the solver runs in the
  permuted basis — see ``parallel/reorder.py``);
* nonzeros are ELL-packed with slots sorted by column, and every
  (row-tile, slot) pair gets its own 1024-element-aligned window of x whose
  start rides a scalar (SMEM) array into the kernel — per-slot windows keep
  each window's span near the tile height instead of the full matrix band.

The matrix data (vals + local cols) streams through the automatic pallas
pipeline at 8 B/nonzero; the x windows are DMAed manually (double-buffered,
one per (tile, slot)).  Traffic: 8 B/nnz + KR*512 B per (tile, slot) window
+ 4 B/row output.

Reference analog: cuSPARSE CSR/COO SpMV (reference: CSRMatrixTasks.cu:14-156,
COOMatrixTasks.cu:12-146) — the GPU gathers through its memory system at
full speed; the TPU has no such path, so the gather is decomposed into
lane-chunk selects against host-planned windows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil2d import _VMEM_LIMIT

# Hard cap on window rows (chunks of 128): the chunk sweep costs ~4*KR VPU
# ops per nonzero, so KR bounds the compute-side Gnnz/s.  Beyond this the
# planner should not route a matrix here (the XLA-gather ELL fallback or a
# failed-build report is more honest than a crawling kernel).
MAX_WINDOW_ROWS = 64


@functools.partial(
    jax.jit,
    static_argnames=("window_rows", "interpret"),
)
def winell_spmv(
    x2d: jnp.ndarray,      # [NR, 128] f32 — x viewed as rows of 128
    wstart: jnp.ndarray,   # [nt, L] int32 — window start row per (tile, slot)
    cols: jnp.ndarray,     # [nt, L, Rt, 128] int32 — window-local indices
    vals: jnp.ndarray,     # [nt, L, Rt, 128] f32
    *,
    window_rows: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = A @ x with A in per-tile windowed ELL layout.

    Tile t covers output rows [t*Rt*128, (t+1)*Rt*128) in x2d layout
    (row r -> element (r // 128, r % 128)).  Slot s of the tile multiplies
    ``vals[t, s]`` with ``x[wstart[t, s]*128 + cols[t, s]]``; padding slots
    carry val 0 (their gathered value is irrelevant).  All wstart entries
    must be multiples of 8 with ``wstart + window_rows <= NR`` (host packer
    contract, :mod:`legionsolvers_tpu.parallel.winell_op`).
    """
    NR, C = x2d.shape
    assert C == 128
    nt, L, Rt, _ = cols.shape
    ntp = wstart.shape[0]
    assert ntp % 8 == 0 and ntp >= nt, "wstart rows must be padded to 8"
    KR = int(window_rows)
    if KR <= 0 or KR % 8 or KR > MAX_WINDOW_ROWS:
        raise ValueError(f"unsupported window_rows={KR}")
    dtype = x2d.dtype

    def issue(j, x_hbm, ws_blk, jloc, win, sems):
        slot = jnp.asarray(j, jnp.int32) % 2
        for s in range(L):
            ws = pl.multiple_of(ws_blk[jloc, s], 8)
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(ws, KR), :],
                win.at[slot, s],
                sems.at[slot, s],
            ).start()

    def wait(j, x_hbm, win, sems):
        slot = jnp.asarray(j, jnp.int32) % 2
        for s in range(L):
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(0, KR), :],
                win.at[slot, s],
                sems.at[slot, s],
            ).wait()

    def kernel(x_hbm, ws_cur, ws_nxt, cols_ref, vals_ref, y_ref, win,
               sems):
        # ws_cur/ws_nxt are (8, L) SMEM blocks of the same wstart array
        # covering tiles [8*(i//8), ...) and [8*((i+1)//8), ...): the whole
        # [nt, L] array must NOT live in SMEM (1 MB scoped budget; nt*L
        # overflows it at modest sizes), Mosaic requires 8-divisible block
        # rows, and the prefetch for tile i+1 needs next-tile starts
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            issue(0, x_hbm, ws_cur, i % 8, win, sems)

        @pl.when(i + 1 < nt)
        def _():
            issue(i + 1, x_hbm, ws_nxt, (i + 1) % 8, win, sems)

        wait(i, x_hbm, win, sems)
        slot = jnp.asarray(i, jnp.int32) % 2

        acc = jnp.zeros((Rt, 128), dtype)
        for s in range(L):
            idx = cols_ref[0, s]
            lo = jnp.bitwise_and(idx, 127)
            hi = jnp.right_shift(idx, 7)
            g = jnp.zeros((Rt, 128), dtype)
            for c in range(KR):
                src = jnp.broadcast_to(win[slot, s, c, :][None, :], (Rt, 128))
                gg = jnp.take_along_axis(src, lo, axis=1)
                g = jnp.where(hi == c, gg, g)
            acc = acc + vals_ref[0, s] * g
        y_ref[...] = acc

    y = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # x2d stays in HBM
            pl.BlockSpec((8, L), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),   # wstart, tile i's blk
            pl.BlockSpec((8, L),
                         lambda i: (jnp.minimum((i + 1) // 8,
                                                ntp // 8 - 1), 0),
                         memory_space=pltpu.SMEM),   # wstart, tile i+1 blk
            pl.BlockSpec((1, L, Rt, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, Rt, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Rt, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt * Rt, 128), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, L, KR, 128), dtype),
            pltpu.SemaphoreType.DMA((2, L)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nt * L * Rt * 128,
            bytes_accessed=(8 * nt * L * Rt * 128
                            + nt * L * KR * 512
                            + nt * Rt * 512),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2d, wstart, wstart, cols, vals)
    return y
