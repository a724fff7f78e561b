"""End-to-end CG golden-convergence tests — analog of reference Test05/Test06
(reference: test/Test05COOSolveCG.cpp, Test06CSRSolveCG.cpp; golden residual²
sequence in test_all.py:130-133): 10 CG iterations on the n=100 1-D negative
Laplacian with b=1, x0=0 must reproduce the exact-integer fp64 residual²
history {100, 4900, 4704, 4512, 4324, 4140, 3960, 3784, 3612, 3444, 3280}
(the harness compares sorted output; this is the true iteration order).

This is the primary correctness oracle.  Run in every combination of
{COO, CSR} x {unsharded, 4-piece sharded mesh} x {eager step(), scanned
solve()}.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from legionsolvers_tpu import (
    BlockPartition,
    CGSolver,
    PartitionedVector,
    SolverOptions,
    SquarePlanner,
    coo_negative_laplacian_1d,
    csr_negative_laplacian_1d,
)

GOLDEN = [100, 4900, 4704, 4512, 4324, 4140, 3960, 3784, 3612, 3444, 3280]
F64 = SolverOptions(entry_dtype=jnp.float64)


def setup_planner(fmt, mesh, n=100, pieces=4):
    part = BlockPartition(n, pieces)
    gen = coo_negative_laplacian_1d if fmt == "coo" else csr_negative_laplacian_1d
    A = gen(n, options=F64)
    rhs = PartitionedVector("rhs", part, mesh=mesh, options=F64).constant_fill(1.0)
    sol = PartitionedVector("sol", part, mesh=mesh, options=F64).zero_fill()
    planner = SquarePlanner(mesh=mesh, options=F64)
    planner.add_sol_vector(sol)
    planner.add_rhs_vector(rhs)
    planner.add_row_partitioned_matrix(A, 0, 0)
    return planner


@pytest.mark.parametrize("fmt", ["coo", "csr"])
@pytest.mark.parametrize("use_mesh", [False, True])
def test_cg_golden_eager(fmt, use_mesh, mesh4):
    planner = setup_planner(fmt, mesh4 if use_mesh else None)
    solver = CGSolver(planner)
    for _ in range(10):
        solver.step()
    hist = [s.get_value() for s in solver.residual_norm_squared]
    assert hist == GOLDEN


@pytest.mark.parametrize("fmt", ["coo", "csr"])
@pytest.mark.parametrize("use_mesh", [False, True])
def test_cg_golden_scan(fmt, use_mesh, mesh4):
    planner = setup_planner(fmt, mesh4 if use_mesh else None)
    solver = CGSolver(planner)
    hist = solver.solve(10)
    assert np.asarray(hist).tolist() == GOLDEN
    # the solution must actually solve the system to the residual the history
    # claims: ||b - A x||^2 == hist[-1]
    A = (coo_negative_laplacian_1d if fmt == "coo" else csr_negative_laplacian_1d)(
        100, options=F64
    )
    x = planner.sol_vectors[0].to_numpy()
    r = np.ones(100) - A.to_dense() @ x
    assert np.isclose(r @ r, hist[-1], rtol=1e-12)


def test_cg_converges_small():
    """Full convergence (beyond the reference's 10-iteration golden): n=32
    CG must reach machine-precision residual in <= n iterations."""
    planner = setup_planner("csr", None, n=32, pieces=1)
    solver = CGSolver(planner)
    hist = np.asarray(solver.solve(40))
    assert hist[-1] < 1e-18 * hist[0] + 1e-20


def test_cg_golden_8pieces(mesh8):
    """Piece count beyond the reference's 4 — goldens must be invariant to
    the partitioning (n=100 is integer-exact in fp64 for any sum order)."""
    planner = setup_planner("coo", mesh8, pieces=8)
    solver = CGSolver(planner)
    hist = solver.solve(10)
    assert np.asarray(hist).tolist() == GOLDEN
