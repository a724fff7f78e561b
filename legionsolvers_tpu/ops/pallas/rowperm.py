"""Pallas TPU kernel: blocked row-local gather (static permutation stage).

Building block of the general-sparsity SpMV (``parallel/genspmv.py``): an
arbitrary static gather ``out[k] = src[g[k]]`` is NOT expressible fast on
TPU — XLA's gather scalarizes (measured 0.2 Gelt/s with the canonical
marginal harness) and Mosaic's ``tpu.dynamic_gather`` reaches one vreg (the
round-3 finding) — but a *row-structured* gather, where every output row of
1024 sources from a statically-known short run of source rows, is a static
chunk sweep of one-vreg lane gathers.  This is the same decomposition as
``ops/pallas/winell.py`` WITHOUT its per-(tile, slot) window DMAs and SMEM
start arrays, which dominate at one slot per tile (measured 2.0 ms for an
8M-element within-row permutation through the winell kernel; this kernel's
automatic block pipeline removes that).

The host-planned radix routing (``genspmv.plan_static_gather``) arranges
that EVERY stage of an arbitrary permutation/duplication is row-structured;
XLA transposes between stages do all long-range movement.

Geometry is fully static: each dest block of ``block_rows`` rows of 1024
sources one ``src_block_rows``-row block (consecutive blocks, stride =
shape — Mosaic needs 8-divisible sublane blocks, which drives the
``block_rows = 8 * p`` shapes), and dest row ``dl`` of the block sweeps
window rows ``[w0_table[dl], w0_table[dl] + w_rows)``.

Cost: 4 * 8 * w_rows VPU ops per element + streaming idx/src/out.

Reference analog: cuSPARSE's arbitrary-sparsity SpMV
(CSRMatrixTasks.cu:14-156) — the GPU's memory system routes in hardware;
on TPU it becomes host-planned routing + this kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil2d import _VMEM_LIMIT

MAX_W_ROWS = 8        # sweep cost cap: 32 * w_rows ops/element
MAX_BLOCK_ROWS = 256  # dest block cap (1 MB idx + 1 MB out + 1 MB vals)
MAX_SRC_ROWS = 64     # source block cap (256 KB)


@functools.partial(
    jax.jit,
    static_argnames=("block_rows", "src_block_rows", "w0_table", "w_rows",
                     "interpret"),
)
def blockperm_gather(
    src: jnp.ndarray,     # flat source, length RS * 1024 (RS % srb == 0)
    idx: jnp.ndarray,     # [RD, 1024] int32, values in [0, w_rows * 1024)
    vals: jnp.ndarray | None = None,  # optional [RD, 1024] scale
    *,
    block_rows: int,
    src_block_rows: int,
    w0_table: tuple,      # len block_rows; w0_table[dl] + w_rows <= srb
    w_rows: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[d, j] = src[(blk(d) * srb + w0_table[d % br]) * 1024 + idx[d, j]]
    (* vals[d, j]), with blk(d) = d // br, br = block_rows,
    srb = src_block_rows, and idx relative to the w_rows-row window."""
    BRK, SRB, W = int(block_rows), int(src_block_rows), int(w_rows)
    if BRK % 8 or BRK > MAX_BLOCK_ROWS:
        raise ValueError(f"unsupported block_rows={BRK}")
    if SRB % 8 or SRB > MAX_SRC_ROWS:
        raise ValueError(f"unsupported src_block_rows={SRB}")
    if W < 1 or W > MAX_W_ROWS:
        raise ValueError(f"unsupported w_rows={W}")
    if len(w0_table) != BRK or any(
        w0 < 0 or w0 + W > SRB for w0 in w0_table
    ):
        raise ValueError("bad w0_table")
    RD = idx.shape[0]
    assert idx.shape[1] == 1024 and RD % BRK == 0
    assert src.size % (SRB * 1024) == 0, (src.size, SRB)
    dtype = src.dtype
    scaled = vals is not None

    # collapse equal-w0 runs: rows sharing a window sweep TOGETHER as one
    # wide vector op, so the trace is O(runs * w_rows * 8) regardless of
    # block_rows (a per-row unroll at block_rows=192 was ~5k ops and
    # minutes of Mosaic compile).  All refs live in the native [*, 128]
    # layout — the first cut reshaped (rc, 1024) <-> (rc*8, 128) INSIDE the
    # kernel, a Mosaic relayout that ran a stage at 1.1 Gelt/s instead of
    # ~45 (outside pallas the same reshape is a free row-major bitcast).
    runs = []
    s0 = 0
    for dl in range(1, BRK + 1):
        if dl == BRK or w0_table[dl] != w0_table[s0]:
            runs.append((s0, dl - s0, w0_table[s0]))
            s0 = dl

    def kernel(*refs):
        if scaled:
            src_ref, idx_ref, val_ref, out_ref = refs
        else:
            src_ref, idx_ref, out_ref = refs
        for (r0, rc, w0) in runs:
            sl = slice(8 * r0, 8 * (r0 + rc))
            ii = idx_ref[sl, :]
            lo = jnp.bitwise_and(ii, 127)
            hi = jnp.right_shift(ii, 7)
            g = jnp.zeros((rc * 8, 128), dtype)
            for wr in range(W):
                for c in range(8):
                    chunk = src_ref[8 * (w0 + wr) + c, :]
                    bc = jnp.broadcast_to(chunk[None, :], (rc * 8, 128))
                    gg = jnp.take_along_axis(bc, lo, axis=1)
                    g = jnp.where(hi == 8 * wr + c, gg, g)
            if scaled:
                g = g * val_ref[sl, :]
            out_ref[sl, :] = g

    in_specs = [
        pl.BlockSpec((SRB * 8, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((BRK * 8, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [src.reshape(-1, 128), idx.reshape(-1, 128)]
    if scaled:
        in_specs.append(
            pl.BlockSpec((BRK * 8, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(vals.reshape(-1, 128))
    out = pl.pallas_call(
        kernel,
        grid=(RD // BRK,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BRK * 8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((RD * 8, 128), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * RD * 1024 * 8 * W,
            bytes_accessed=(4 * RD * 1024 * (2 + (1 if scaled else 0))
                            + 4 * src.size),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return out.reshape(RD, 1024)
