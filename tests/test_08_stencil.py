"""Stencil generator + matrix-free DIA operator tests (reference:
StencilGenerator.hpp/.cpp, BenchmarkStencil.cpp stencils)."""

import jax.numpy as jnp
import numpy as np
import pytest

from legionsolvers_tpu import (
    BlockPartition,
    CGSolver,
    PartitionedVector,
    SolverOptions,
    SquarePlanner,
    StencilOperator,
    calculate_stencil_size,
    coo_negative_laplacian_1d,
    create_coo_stencil_matrix,
    create_csr_stencil_matrix,
    laplacian_stencil,
)

F64 = SolverOptions(entry_dtype=jnp.float64)


def dense_stencil(shape, offsets):
    """Brute-force dense construction for oracle comparison."""
    n = int(np.prod(shape))
    A = np.zeros((n, n))
    strides = []
    acc = 1
    for d in reversed(shape):
        strides.insert(0, acc)
        acc *= d
    for p in np.ndindex(*shape):
        row = sum(pi * si for pi, si in zip(p, strides))
        for off, v in offsets:
            q = tuple(pi + oi for pi, oi in zip(p, off))
            if all(0 <= qi < ni for qi, ni in zip(q, shape)):
                col = sum(qi * si for qi, si in zip(q, strides))
                A[row, col] += v
    return A


@pytest.mark.parametrize("dim,shape", [(1, (37,)), (2, (7, 9)), (3, (4, 5, 3)), (4, (4, 3, 5))])
def test_stencil_size_and_matrix(dim, shape):
    offs = laplacian_stencil(dim)
    nnz = calculate_stencil_size(shape, offs)
    A = create_coo_stencil_matrix(shape, offs, options=F64)
    assert A.n_kernel == nnz
    np.testing.assert_allclose(A.to_dense(), dense_stencil(shape, offs))
    Ac = create_csr_stencil_matrix(shape, offs, options=F64)
    np.testing.assert_allclose(Ac.to_dense(), dense_stencil(shape, offs))


def test_stencil_1d_matches_laplacian():
    """The dim-1 benchmark stencil must equal the ExampleSystems 1-D negative
    Laplacian (same operator, different generator)."""
    n = 50
    A1 = create_coo_stencil_matrix((n,), laplacian_stencil(1), options=F64)
    A2 = coo_negative_laplacian_1d(n, options=F64)
    np.testing.assert_array_equal(A1.to_dense(), A2.to_dense())


@pytest.mark.parametrize(
    "dim,shape",
    # shapes chosen so stencil bandwidth <= block size at 4 pieces
    [(1, (64,)), (2, (8, 8)), (3, (4, 4, 4)), (4, (6, 4, 4))],
)
@pytest.mark.parametrize("pieces", [1, 4])
def test_dia_operator_matches_explicit(dim, shape, pieces, mesh4):
    """Matrix-free DIA matvec == explicit COO matvec, sharded and not."""
    offs = laplacian_stencil(dim)
    mesh = mesh4 if pieces == 4 else None
    part = BlockPartition(int(np.prod(shape)), pieces)
    op = StencilOperator(shape, offs, partition=part, mesh=mesh, options=F64)
    rng = np.random.default_rng(0)
    x_host = rng.random(part.n)
    x = PartitionedVector.from_array("x", x_host, part, mesh=mesh, options=F64)
    y = np.asarray(op.matvec(x.data))[: part.n]
    expected = dense_stencil(shape, offs) @ x_host
    np.testing.assert_allclose(y, expected, rtol=1e-12, atol=1e-12)


def test_dia_operator_unsharded_multipiece():
    """The mesh-less multi-piece simulation path must agree too."""
    shape, offs = (8, 8), laplacian_stencil(2)
    part = BlockPartition(64, 4)
    op = StencilOperator(shape, offs, partition=part, mesh=None, options=F64)
    rng = np.random.default_rng(1)
    x_host = rng.random(64)
    x = PartitionedVector.from_array("x", x_host, part, options=F64)
    y = np.asarray(op.matvec(x.data))[:64]
    np.testing.assert_allclose(y, dense_stencil(shape, offs) @ x_host, rtol=1e-12)


def test_wide_bandwidth_gather_fallback(mesh8):
    """Bandwidth > block size (halo spans non-adjacent shards) must fall back
    to the gather-based halo and still match the dense oracle (previously a
    hard ValueError; the reference handles any ghost shape via Legion images,
    COOMatrix.cpp:98-118)."""
    shape, offs = (4, 8), laplacian_stencil(2)  # band = 8 > block = 4
    part = BlockPartition(32, 8)
    op = StencilOperator(shape, offs, partition=part, mesh=mesh8, options=F64)
    assert op._wide_band
    rng = np.random.default_rng(2)
    x_host = rng.random(32)
    x = PartitionedVector.from_array("x", x_host, part, mesh=mesh8, options=F64)
    y = np.asarray(op.matvec(x.data))[:32]
    np.testing.assert_allclose(y, dense_stencil(shape, offs) @ x_host, rtol=1e-12)


def test_wide_bandwidth_cg(mesh8):
    """End-to-end CG on a wide-band sharded geometry: the fused jnp runner
    must route through the gather halo and converge to the true solution."""
    shape, offs = (4, 8), laplacian_stencil(2)
    part = BlockPartition(32, 8)
    op = StencilOperator(shape, offs, partition=part, mesh=mesh8, options=F64)
    rhs = PartitionedVector("rhs", part, mesh=mesh8, options=F64).constant_fill(1.0)
    sol = PartitionedVector("sol", part, mesh=mesh8, options=F64).zero_fill()
    planner = SquarePlanner(mesh=mesh8, options=F64)
    planner.add_sol_vector(sol)
    planner.add_rhs_vector(rhs)
    planner.add_operator(op, 0, 0)
    solver = CGSolver(planner)
    solver.solve(60)
    x = np.asarray(planner.get_vector(0, 0).data)[:32]
    expected = np.linalg.solve(dense_stencil(shape, offs), np.ones(32))
    np.testing.assert_allclose(x, expected, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("use_mesh", [False, True])
def test_cg_with_dia_operator(use_mesh, mesh4):
    """End-to-end: CG over the matrix-free operator reproduces the CG golden
    (dim-1 stencil == the golden 1-D Laplacian, n=100)."""
    GOLDEN = [100, 4900, 4704, 4512, 4324, 4140, 3960, 3784, 3612, 3444, 3280]
    n = 100
    mesh = mesh4 if use_mesh else None
    part = BlockPartition(n, 4)
    op = StencilOperator((n,), laplacian_stencil(1), partition=part, mesh=mesh, options=F64)
    rhs = PartitionedVector("rhs", part, mesh=mesh, options=F64).constant_fill(1.0)
    sol = PartitionedVector("sol", part, mesh=mesh, options=F64).zero_fill()
    planner = SquarePlanner(mesh=mesh, options=F64)
    planner.add_sol_vector(sol)
    planner.add_rhs_vector(rhs)
    planner.add_operator(op, 0, 0)
    solver = CGSolver(planner)
    hist = solver.solve(10)
    assert np.asarray(hist).tolist() == GOLDEN
