"""Mixed-basis registration safety (r4 advisor, severity high + medium).

Once a planner space adopts an RCM solver basis (parallel/reorder.py), every
later operator touching that space must be expressed in it:

* a second square matrix on the space is FORCED into the basis (best kernel
  on the permuted matrix, generic ELL fallback) — previously it silently
  registered in the original basis and computed garbage once
  ``to_solver_basis`` permuted the vectors;
* a cross-space matrix gets the two-sided ``CrossBasisOperator``;
* matrix-free operators raise (they cannot be re-expressed);
* ``_permute_vectors`` applies each space's OWN permutation (previously the
  space-0 permutation hit every space);
* ``JacobiPreconditioner`` builds its diagonal in both bases and applies
  the one matching ``planner._in_solver_basis``.

Oracles are scipy dense/sparse algebra and NO_RCM reruns of the identical
system (reference semantics anchor: SquarePlanner.hpp:340-357 accumulates
all registered operators into the range space).
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp
import scipy.sparse as sp

from legionsolvers_tpu import (
    BlockPartition,
    CGSolver,
    PartitionedVector,
    SolverOptions,
    SquarePlanner,
)
from legionsolvers_tpu.core.matrix import COOMatrix
from legionsolvers_tpu.parallel.reorder import (
    CrossBasisOperator,
    ReorderedOperator,
)


@pytest.fixture
def f64():
    return SolverOptions(entry_dtype=jnp.float64)


def _spd_banded_coo(n, bw, avg, seed, options, shift_scale=4.0):
    """SPD: A = B + B^T + diag(shift) with shift > ||B + B^T||_inf."""
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, n, n * avg)
    cols = rows + rng.integers(-bw, bw + 1, n * avg)
    keep = (cols >= 0) & (cols < n)
    rows, cols = rows[keep], cols[keep]
    vals = rng.uniform(-1.0, 1.0, len(rows))
    r = np.concatenate([rows, cols, np.arange(n)])
    c = np.concatenate([cols, rows, np.arange(n)])
    v = np.concatenate([vals, vals, np.full(n, shift_scale * avg)])
    return COOMatrix(r, c, v, n, n, options=options)


def _scipy_of(m):
    return sp.coo_matrix(
        (np.asarray(m.vals), (np.asarray(m.rows), np.asarray(m.cols))),
        shape=(m.n_range, m.n_domain),
    ).tocsr()


def _planner_1space(n, options, *matrices, no_rcm=False):
    part = BlockPartition(n, 1)
    pl = SquarePlanner(mesh=None, options=options)
    pl.add_sol_vector(
        PartitionedVector("s", part, options=options).zero_fill()
    )
    pl.add_rhs_vector(
        PartitionedVector("b", part, options=options).constant_fill(1.0)
    )
    if no_rcm:
        os.environ["LEGIONSOLVERS_NO_RCM"] = "1"
        os.environ["LEGIONSOLVERS_NO_DIA"] = "1"
    try:
        for m in matrices:
            pl.add_row_partitioned_matrix(m, 0, 0)
    finally:
        if no_rcm:
            del os.environ["LEGIONSOLVERS_NO_RCM"]
            del os.environ["LEGIONSOLVERS_NO_DIA"]
    return pl


def test_second_matrix_forced_into_basis(f64):
    """Two scattered SPD matrices on one space: the first establishes the
    basis, the second MUST adopt it; the summed-operator CG trajectory
    matches the NO_RCM run of the identical system."""
    n = 4096
    A = _spd_banded_coo(n, bw=160, avg=4, seed=7, options=f64)
    B = _spd_banded_coo(n, bw=200, avg=3, seed=8, options=f64)
    pl = _planner_1space(n, f64, A, B)
    op_a, op_b = (t[0] for t in pl.row_partitioned_matrices)
    assert isinstance(op_a, ReorderedOperator)
    assert isinstance(op_b, ReorderedOperator)
    # shared basis: identical permutation arrays
    np.testing.assert_array_equal(op_a.perm_np, op_b.perm_np)
    hist = np.asarray(CGSolver(pl).solve(12))
    x = np.asarray(pl.get_vector(0, 0).data)[:n]

    pl2 = _planner_1space(n, f64, A, B, no_rcm=True)
    hist2 = np.asarray(CGSolver(pl2).solve(12))
    x2 = np.asarray(pl2.get_vector(0, 0).data)[:n]
    np.testing.assert_allclose(hist, hist2, rtol=1e-9)
    np.testing.assert_allclose(x, x2, rtol=1e-8, atol=1e-12)


def test_multispace_per_space_bases(f64):
    """The reference's benchmark stress shape — two spaces, a matrix
    registered on each (BenchmarkStencil.cpp:201-207) — with reorderable
    matrices: each space gets its own basis and its own vector permutation;
    the block-diagonal trajectory equals the sum of two single-space runs."""
    n = 4096
    A = _spd_banded_coo(n, bw=160, avg=4, seed=21, options=f64)
    part = BlockPartition(n, 1)
    pl = SquarePlanner(mesh=None, options=f64)
    for i in range(2):
        pl.add_sol_vector(
            PartitionedVector(f"s{i}", part, options=f64).zero_fill()
        )
        pl.add_rhs_vector(
            PartitionedVector(f"b{i}", part, options=f64).constant_fill(1.0)
        )
    pl.add_row_partitioned_matrix(A, 0, 0)
    pl.add_row_partitioned_matrix(A, 1, 1)
    assert 0 in pl.basis_perms and 1 in pl.basis_perms
    assert all(
        isinstance(t[0], ReorderedOperator)
        for t in pl.row_partitioned_matrices
    )
    hist = np.asarray(CGSolver(pl).solve(10))

    pl1 = _planner_1space(n, f64, A)
    hist1 = np.asarray(CGSolver(pl1).solve(10))
    np.testing.assert_allclose(hist, 2.0 * hist1, rtol=1e-9)
    x1 = np.asarray(pl1.get_vector(0, 0).data)[:n]
    for i in range(2):
        xi = np.asarray(pl.get_vector(0, i).data)[:n]
        np.testing.assert_allclose(xi, x1, rtol=1e-8, atol=1e-12)
        bi = np.asarray(pl.get_vector(1, i).data)[:n]
        np.testing.assert_allclose(bi, 1.0)  # rhs restored to original basis


def test_cross_space_operator_joins_basis(f64):
    """A coupling matrix (domain space 1 -> range space 0) registered after
    space 0 adopted a basis: planner.matvec must equal the scipy block
    product both eagerly (out of basis) and through the basis round-trip."""
    n = 4096
    A = _spd_banded_coo(n, bw=160, avg=4, seed=31, options=f64)
    rng = np.random.default_rng(32)
    k = 3 * n
    C = COOMatrix(
        rng.integers(0, n, k), rng.integers(0, n, k),
        rng.uniform(-1, 1, k), n, n, options=f64,
    )
    part = BlockPartition(n, 1)
    pl = SquarePlanner(mesh=None, options=f64)
    for i in range(2):
        pl.add_sol_vector(
            PartitionedVector(f"s{i}", part, options=f64).zero_fill()
        )
        pl.add_rhs_vector(
            PartitionedVector(f"b{i}", part, options=f64).constant_fill(1.0)
        )
    pl.add_row_partitioned_matrix(A, 0, 0)
    assert 0 in pl.basis_perms
    pl.add_row_partitioned_matrix(C, 1, 0)
    op_c = pl.row_partitioned_matrices[1][0]
    assert isinstance(op_c, CrossBasisOperator)

    x0 = rng.standard_normal(n)
    x1 = rng.standard_normal(n)
    pl.get_vector(0, 0).data = jnp.asarray(
        np.pad(x0, (0, part.padded_size - n))
    )
    pl.get_vector(0, 1).data = jnp.asarray(
        np.pad(x1, (0, part.padded_size - n))
    )
    pl.allocate_workspace(1)
    expect0 = _scipy_of(A) @ x0 + _scipy_of(C) @ x1

    pl.matvec(2, 0)  # eager, original basis
    y0 = np.asarray(pl.get_vector(2, 0).data)[:n]
    np.testing.assert_allclose(y0, expect0, rtol=1e-10, atol=1e-10)
    y1 = np.asarray(pl.get_vector(2, 1).data)[:n]
    np.testing.assert_allclose(y1, 0.0, atol=0.0)  # no op ranges in space 1

    pl.to_solver_basis()
    pl.matvec(2, 0)
    pl.from_solver_basis()
    y0b = np.asarray(pl.get_vector(2, 0).data)[:n]
    np.testing.assert_allclose(y0b, expect0, rtol=1e-10, atol=1e-10)
    # sol vectors returned to the original basis exactly
    np.testing.assert_allclose(
        np.asarray(pl.get_vector(0, 0).data)[:n], x0, rtol=0, atol=0
    )


def test_add_operator_after_basis_raises(f64):
    n = 4096
    A = _spd_banded_coo(n, bw=160, avg=4, seed=41, options=f64)
    pl = _planner_1space(n, f64, A)
    assert 0 in pl.basis_perms

    class FakeStencilOp:
        def matvec_add(self, y, x):
            return y

    with pytest.raises(ValueError, match="matrix-free"):
        pl.add_operator(FakeStencilOp(), 0, 0)


def test_pcg_jacobi_with_reordered_operator(f64):
    """r4 advisor (medium): Jacobi must unwrap ReorderedOperator and apply
    the diagonal in the solver basis.  Trajectory must match the NO_RCM
    PCG+Jacobi run exactly (same math, different basis)."""
    from legionsolvers_tpu.solvers.pcg import JacobiPreconditioner, PCGSolver

    n = 4096
    # varied diagonal so Jacobi actually changes the iteration
    A = _spd_banded_coo(n, bw=160, avg=4, seed=51, options=f64)
    diag_bump = np.arange(n) % 7
    A2 = COOMatrix(
        np.concatenate([np.asarray(A.rows), np.arange(n)]),
        np.concatenate([np.asarray(A.cols), np.arange(n)]),
        np.concatenate([np.asarray(A.vals), diag_bump.astype(float)]),
        n, n, options=f64,
    )

    def run(no_rcm):
        pl = _planner_1space(n, f64, A2, no_rcm=no_rcm)
        if not no_rcm:
            assert isinstance(
                pl.row_partitioned_matrices[0][0], ReorderedOperator
            )
        solver = PCGSolver(pl, JacobiPreconditioner(pl))
        hist = np.asarray(solver.solve(12))
        return hist, np.asarray(pl.get_vector(0, 0).data)[:n]

    hist_r, x_r = run(no_rcm=False)
    hist_p, x_p = run(no_rcm=True)
    np.testing.assert_allclose(hist_r, hist_p, rtol=1e-9)
    np.testing.assert_allclose(x_r, x_p, rtol=1e-8, atol=1e-12)
    # and it actually converges faster than unpreconditioned CG would drift:
    assert hist_r[-1] < hist_r[0]
