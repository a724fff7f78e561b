"""Preconditioned Conjugate Gradient + Jacobi preconditioner.

The reference's interface mentions preconditioners but implements none
(its README.md:31; SURVEY §2 notes "no preconditioners").  This module goes
beyond parity: textbook PCG over the planner algebra with a pluggable
preconditioner, plus the diagonal (Jacobi) preconditioner for explicit
matrices (for pure stencil operators the diagonal is a constant, so Jacobi
degenerates to a scaling — use explicit matrices for variable-coefficient
problems).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.scalar import Scalar
from ..planner import SquarePlanner


class JacobiPreconditioner:
    """z = D^{-1} r with D = diag(A).  Elementwise, so it needs no halo and
    shards trivially with the vectors."""

    def __init__(self, planner: SquarePlanner):
        self.inv_diags = []
        for space in range(planner.num_spaces):
            part = planner.canonical_partitions[space]
            diag = np.zeros(part.padded_size)
            for dist, dom, rng in planner.row_partitioned_matrices:
                if rng != space or dom != space:
                    continue
                m = getattr(dist, "matrix", None)
                if m is not None:
                    on_diag = m.rows == m.cols
                    np.add.at(diag, m.rows[on_diag], np.asarray(m.vals)[on_diag])
                else:  # stencil operator: constant diagonal
                    for off, v in dist.offsets:
                        if all(c == 0 for c in off):
                            diag[: part.n] += v
            inv = np.zeros_like(diag)
            nz = diag != 0
            inv[nz] = 1.0 / diag[nz]
            gs = planner.canonical_grid_shapes[space]
            arr = jnp.asarray(
                inv.reshape(gs) if gs else inv,
                dtype=planner.options.entry_dtype,
            )
            v0 = planner.sol_vectors[space]
            if v0.mesh is not None:
                arr = jax.device_put(arr, v0.sharding)
            self.inv_diags.append(arr)

    def apply(self, space: int, r: jnp.ndarray) -> jnp.ndarray:
        return self.inv_diags[space] * r


class PCGSolver:
    """Preconditioned CG: same planner discipline as CGSolver (SOL=0, RHS=1)
    with workspace P=2, Q=3, R=4, Z=5."""

    SOL = 0
    RHS = 1
    P = 2
    Q = 3
    R = 4
    Z = 5

    def __init__(
        self, planner: SquarePlanner, preconditioner: Optional[object] = None
    ):
        self.planner = planner
        self.M = preconditioner
        planner.allocate_workspace(4)
        planner.copy(self.R, self.RHS)  # assumes x0 = 0, as the reference does
        self._apply_M(self.Z, self.R)
        planner.copy(self.P, self.Z)
        self.rz: List[Scalar] = [planner.dot(self.R, self.Z)]
        self.residual_norm_squared: List[Scalar] = [planner.dot(self.R, self.R)]
        self._solve_cache = {}

    def _apply_M(self, dst_idx: int, src_idx: int) -> None:
        planner = self.planner
        for i in range(planner.num_spaces):
            src = planner.get_vector(src_idx, i)
            dst = planner.get_vector(dst_idx, i)
            dst.data = self.M.apply(i, src.data) if self.M else src.data

    def step(self) -> None:
        planner = self.planner
        pq = planner.matvec_dot(self.Q, self.P)
        rz_old = self.rz[-1]
        planner.axpy(self.SOL, rz_old, pq, self.P)
        planner.axpy(self.R, Scalar(-1.0), rz_old, pq, self.Q)
        self._apply_M(self.Z, self.R)
        rz_new = planner.dot(self.R, self.Z)
        self.rz.append(rz_new)
        self.residual_norm_squared.append(planner.dot(self.R, self.R))
        planner.xpay(self.P, rz_new, rz_old, self.Z)

    def solve(self, num_iterations: int, use_jit: bool = True) -> jnp.ndarray:
        self.planner.to_solver_basis()
        try:
            return self._solve_in_basis(num_iterations, use_jit)
        finally:
            self.planner.from_solver_basis()

    def _solve_in_basis(self, num_iterations, use_jit):
        planner = self.planner

        def body(i, carry):
            state, rz, history = carry
            planner.load_state(state)
            self.rz = [Scalar(rz)]
            self.residual_norm_squared = []
            self.step()
            history = history.at[i + 1].set(self.residual_norm_squared[-1].value)
            return planner.dump_state(), self.rz[-1].value, history

        rr0 = self.planner.dot(self.R, self.R).value

        def run_impl(state, rz0, rr0):
            history = jnp.zeros(num_iterations + 1, dtype=jnp.asarray(rr0).dtype)
            history = history.at[0].set(rr0)
            return jax.lax.fori_loop(
                0, num_iterations, body, (state, rz0, history)
            )

        key = (num_iterations, use_jit)
        run = self._solve_cache.get(key)
        if run is None:
            run = jax.jit(run_impl) if use_jit else run_impl
            self._solve_cache[key] = run
        final_state, rz, history = run(
            planner.dump_state(), self.rz[-1].value, rr0
        )
        planner.load_state(final_state)
        self.rz = [Scalar(rz)]
        self.residual_norm_squared = [Scalar(history[-1])]
        return history
