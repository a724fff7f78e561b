"""Matrix Market I/O + checkpoint/resume tests (features the reference
planned but never implemented — its README.md:90-99 — and SURVEY §5 notes no
checkpointing exists)."""

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
)
from legionsolvers_tpu.utils.io import (
    load_checkpoint,
    read_matrix_market,
    save_checkpoint,
    write_matrix_market,
)

F64 = SolverOptions(entry_dtype=jnp.float64)


def test_matrix_market_roundtrip(tmp_path):
    A = coo_negative_laplacian_1d(20, options=F64)
    path = str(tmp_path / "lap.mtx")
    write_matrix_market(path, A)
    B = read_matrix_market(path, options=F64)
    np.testing.assert_array_equal(A.to_dense(), B.to_dense())
    assert B.n_range == 20 and B.n_domain == 20


def test_matrix_market_symmetric(tmp_path):
    path = str(tmp_path / "sym.mtx")
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real symmetric\n")
        f.write("% comment line\n")
        f.write("3 3 4\n")
        f.write("1 1 2.0\n2 2 2.0\n3 3 2.0\n2 1 -1.0\n")
    A = read_matrix_market(path)
    expected = np.array([[2, -1, 0], [-1, 2, 0], [0, 0, 2.0]])
    np.testing.assert_array_equal(A.to_dense(), expected)


def test_matrix_market_rejects_garbage(tmp_path):
    path = str(tmp_path / "bad.mtx")
    with open(path, "w") as f:
        f.write("not a matrix\n")
    with pytest.raises(ValueError):
        read_matrix_market(path)


def build_solver(mesh=None):
    n = 60
    part = BlockPartition(n, 4)
    A = coo_negative_laplacian_1d(n, options=F64)
    rhs = PartitionedVector("rhs", part, mesh=mesh, options=F64).constant_fill(1.0)
    sol = PartitionedVector("sol", part, mesh=mesh, options=F64).zero_fill()
    planner = SquarePlanner(mesh=mesh, options=F64)
    planner.add_sol_vector(sol)
    planner.add_rhs_vector(rhs)
    planner.add_row_partitioned_matrix(A, 0, 0)
    return CGSolver(planner)


def test_checkpoint_resume(tmp_path, mesh4):
    """Running 4 + 4 iterations through a checkpoint must equal 8 straight
    iterations exactly (fp64)."""
    s1 = build_solver(mesh4)
    s1.solve(4)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, s1)

    s2 = build_solver(mesh4)
    load_checkpoint(path, s2)
    h2 = np.asarray(s2.solve(4))

    s3 = build_solver(mesh4)
    h3 = np.asarray(s3.solve(8))
    np.testing.assert_allclose(h2[1:], h3[5:], rtol=1e-14)
    np.testing.assert_allclose(
        s2.planner.sol_vectors[0].to_numpy(),
        s3.planner.sol_vectors[0].to_numpy(),
        rtol=1e-13,
    )
