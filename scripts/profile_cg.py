"""Component timing for the CG iteration on the real chip.

Times, via the marginal-window method (utils/timing.py), fori_loop bodies of:
  A. the Pallas stencil matvec_dot alone
  B. the three BLAS-1 updates alone (axpy, axpy+dot, xpay)
  C. the full CG step (what bench.py measures)
so the iteration's 0.97 ms can be attributed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

N_GRID = 4096
SHORT, LONG = 50, 250


def time_loop(name, body, init, bpe):
    from legionsolvers_tpu.utils.timing import marginal_seconds_per_iter, time_call

    fns = {}
    for k in (SHORT, LONG):
        f = jax.jit(lambda c, k=k: jax.lax.fori_loop(0, k, body, c))
        jax.block_until_ready(f(init))  # compile
        fns[k] = f

    s = marginal_seconds_per_iter(lambda k: fns[k](init), SHORT, LONG)
    n = N_GRID * N_GRID
    gbs = bpe * n / s / 1e9
    print(f"[profile] {name}: {s*1e3:.3f} ms/iter  ({gbs:.0f} GB/s at {bpe} B/elt)")
    return s


def main():
    from legionsolvers_tpu import (
        BlockPartition, PartitionedVector, SquarePlanner, CGSolver,
        StencilOperator, SolverOptions, laplacian_stencil,
    )
    from legionsolvers_tpu.ops import blas1

    options = SolverOptions(entry_dtype=jnp.float32)
    n = N_GRID * N_GRID
    part = BlockPartition(n, 1)
    op = StencilOperator((N_GRID, N_GRID), laplacian_stencil(2),
                         partition=part, mesh=None, options=options)
    print("[profile] uses_pallas:", op.uses_pallas)
    gs = (N_GRID, N_GRID) if op.uses_pallas else None

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (N_GRID, N_GRID), jnp.float32)

    # A: matvec_dot only
    def body_a(i, c):
        p, acc = c
        q, pq = op.matvec_dot(p)
        return q, acc + pq

    time_loop("matvec_dot", body_a, (x, jnp.float32(0)), 8)

    # A2: matvec only
    def body_a2(i, c):
        return op.matvec(c)

    time_loop("matvec", body_a2, x, 8)

    # B: the BLAS tail: two axpys, dot, xpay
    def body_b(i, c):
        xx, r, p, q, rr = c
        alpha = rr / jnp.float32(1.7)
        xx = xx + alpha * p
        r = r - alpha * q
        rr_new = jnp.sum((r * r), dtype=jnp.float32)
        p = r + (rr_new / rr) * p
        return xx, r, p, q, rr_new

    time_loop("blas_tail", body_b, (x, x + 1, x + 2, x + 3, jnp.float32(1)), 40)

    # C: full solver step through the planner
    rhs = PartitionedVector("rhs", part, mesh=None, options=options, grid_shape=gs)
    rhs.constant_fill(1.0)
    sol = PartitionedVector("sol", part, mesh=None, options=options, grid_shape=gs)
    sol.zero_fill()
    planner = SquarePlanner(mesh=None, options=options)
    planner.add_sol_vector(sol)
    planner.add_rhs_vector(rhs)
    planner.add_operator(op, 0, 0)
    solver = CGSolver(planner)

    from legionsolvers_tpu.utils.timing import marginal_seconds_per_iter

    solver.solve(SHORT)
    solver.solve(LONG)  # compile both
    s = marginal_seconds_per_iter(lambda k: solver.solve(k), SHORT, LONG)
    print(f"[profile] full_cg_step: {s*1e3:.3f} ms/iter")


if __name__ == "__main__":
    main()
