"""Preconditioned CG tests (beyond-reference feature: the reference has no
preconditioners, SURVEY §2)."""

import jax.numpy as jnp
import numpy as np
import pytest

from legionsolvers_tpu import (
    BlockPartition,
    CGSolver,
    JacobiPreconditioner,
    PartitionedVector,
    PCGSolver,
    SolverOptions,
    SquarePlanner,
    create_coo_stencil_matrix,
)
from legionsolvers_tpu.core.matrix import COOMatrix

F64 = SolverOptions(entry_dtype=jnp.float64)


def variable_diag_system(n):
    """SPD system with strongly varying diagonal: D + tridiag(-1, 0, -1)."""
    rng = np.random.default_rng(7)
    d = rng.uniform(3.0, 100.0, n)
    rows = np.concatenate([np.arange(n), np.arange(n - 1), np.arange(1, n)])
    cols = np.concatenate([np.arange(n), np.arange(1, n), np.arange(n - 1)])
    vals = np.concatenate([d, -np.ones(n - 1), -np.ones(n - 1)])
    return COOMatrix(rows, cols, vals, n, n, options=F64)


def build(A, n, pieces, mesh):
    part = BlockPartition(n, pieces)
    rhs = PartitionedVector("rhs", part, mesh=mesh, options=F64).constant_fill(1.0)
    sol = PartitionedVector("sol", part, mesh=mesh, options=F64).zero_fill()
    planner = SquarePlanner(mesh=mesh, options=F64)
    planner.add_sol_vector(sol)
    planner.add_rhs_vector(rhs)
    planner.add_row_partitioned_matrix(A, 0, 0)
    return planner


@pytest.mark.parametrize("use_mesh", [False, True])
def test_pcg_solves_and_beats_cg(use_mesh, mesh4):
    n = 96
    A = variable_diag_system(n)
    its = 20
    p_cg = build(A, n, 4, mesh4 if use_mesh else None)
    h_cg = np.asarray(CGSolver(p_cg).solve(its))
    p_pcg = build(A, n, 4, mesh4 if use_mesh else None)
    solver = PCGSolver(p_pcg, JacobiPreconditioner(p_pcg))
    h_pcg = np.asarray(solver.solve(its))
    x = p_pcg.sol_vectors[0].to_numpy()
    r = np.ones(n) - A.to_dense() @ x
    assert np.isclose(r @ r, h_pcg[-1], rtol=1e-8, atol=1e-25)
    # Jacobi must accelerate convergence on this diagonally-varying system
    assert h_pcg[-1] < h_cg[-1] * 1e-2


def test_pcg_identity_preconditioner_matches_cg():
    """PCG with M = I must reproduce plain CG exactly."""
    n = 64
    A = variable_diag_system(n)
    p1 = build(A, n, 1, None)
    h1 = np.asarray(CGSolver(p1).solve(15))
    p2 = build(A, n, 1, None)
    h2 = np.asarray(PCGSolver(p2, None).solve(15))
    np.testing.assert_allclose(h1, h2, rtol=1e-12)


def test_pcg_eager_matches_scan(mesh4):
    n = 64
    A = variable_diag_system(n)
    p1 = build(A, n, 4, mesh4)
    s1 = PCGSolver(p1, JacobiPreconditioner(p1))
    for _ in range(5):
        s1.step()
    p2 = build(A, n, 4, mesh4)
    s2 = PCGSolver(p2, JacobiPreconditioner(p2))
    s2.solve(5)
    np.testing.assert_allclose(
        p1.sol_vectors[0].to_numpy(), p2.sol_vectors[0].to_numpy(), rtol=1e-12
    )
