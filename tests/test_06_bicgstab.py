"""BiCGStab solver tests (reference has no golden for BiCGStab — its tests
only cover CG — so correctness is established against dense numpy solves and
an independent scipy-free BiCGStab transcription)."""

import jax.numpy as jnp
import numpy as np
import pytest

from legionsolvers_tpu import (
    BiCGStabSolver,
    BlockPartition,
    PartitionedVector,
    SolverOptions,
    SquarePlanner,
    coo_negative_laplacian_1d,
    create_coo_stencil_matrix,
)
from legionsolvers_tpu.core.matrix import COOMatrix

F64 = SolverOptions(entry_dtype=jnp.float64)


def build(A, n, pieces, mesh, rhs_vals=None):
    part = BlockPartition(n, pieces)
    rhs_arr = np.ones(n) if rhs_vals is None else rhs_vals
    rhs = PartitionedVector.from_array("rhs", rhs_arr, part, mesh=mesh, options=F64)
    sol = PartitionedVector("sol", part, mesh=mesh, options=F64).zero_fill()
    planner = SquarePlanner(mesh=mesh, options=F64)
    planner.add_sol_vector(sol)
    planner.add_rhs_vector(rhs)
    planner.add_row_partitioned_matrix(A, 0, 0)
    return planner


def reference_bicgstab(A, b, its):
    """Independent numpy transcription of the reference recurrence
    (BiCGStabSolver.hpp:64-82) for trajectory comparison."""
    x = np.zeros_like(b)
    r = b.copy()
    r_tilde = b.copy()
    p = np.zeros_like(b)
    v = np.zeros_like(b)
    rho, alpha, omega = 1.0, 0.0, 1.0
    hist = [r @ r]
    for _ in range(its):
        rho_new = r @ r_tilde
        beta = (rho_new / rho) * (alpha / omega)
        rho = rho_new
        p = r + beta * (p - omega * v)
        v = A @ p
        temp = r_tilde @ v
        r = r + (-1 * rho / temp) * v
        alpha = rho / temp
        u = A @ r
        omega = (r @ u) / (u @ u)
        x = x + alpha * p + omega * r
        r = r - omega * u
        hist.append(r @ r)
    return x, np.array(hist)


@pytest.mark.parametrize("use_mesh", [False, True])
def test_bicgstab_matches_reference_recurrence(use_mesh, mesh4):
    """Trajectory parity with the transcribed recurrence on an asymmetric
    operator (BiCGStab's reason to exist)."""
    n = 64
    # asymmetric: convection-diffusion-like stencil
    offs = [((0,), 2.5), ((-1,), -1.5), ((1,), -0.5)]
    A = create_coo_stencil_matrix((n,), offs, options=F64)
    mesh = mesh4 if use_mesh else None
    planner = build(A, n, 4, mesh)
    solver = BiCGStabSolver(planner)
    hist = np.asarray(solver.solve(12))
    _, ref_hist = reference_bicgstab(A.to_dense(), np.ones(n), 12)
    # rtol: the DIA operator sums diagonal contributions in offset order,
    # the numpy oracle in dense-matmul order — fp64 summation-order noise
    np.testing.assert_allclose(hist, ref_hist, rtol=1e-7)


@pytest.mark.parametrize("use_mesh", [False, True])
def test_bicgstab_solves_spd(use_mesh, mesh4):
    n = 100
    A = coo_negative_laplacian_1d(n, options=F64)
    planner = build(A, n, 4, mesh4 if use_mesh else None)
    solver = BiCGStabSolver(planner)
    hist = np.asarray(solver.solve(120))
    x = planner.sol_vectors[0].to_numpy()
    r = np.ones(n) - A.to_dense() @ x
    assert r @ r < 1e-16
    assert hist[-1] < 1e-16


def test_bicgstab_eager_matches_scan(mesh4):
    n = 40
    A = coo_negative_laplacian_1d(n, options=F64)
    p1 = build(A, n, 4, mesh4)
    s1 = BiCGStabSolver(p1)
    for _ in range(5):
        s1.step()
    x_eager = p1.sol_vectors[0].to_numpy()
    p2 = build(A, n, 4, mesh4)
    s2 = BiCGStabSolver(p2)
    s2.solve(5)
    x_scan = p2.sol_vectors[0].to_numpy()
    np.testing.assert_allclose(x_eager, x_scan, rtol=1e-13)
