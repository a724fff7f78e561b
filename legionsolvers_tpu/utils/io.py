"""Matrix Market I/O and solver-state checkpointing.

The reference *planned* Matrix Market import ("file formats: .mtx", its
README.md:90-99) but never implemented it, and has no checkpoint/resume at
all (SURVEY §5); both are provided here for completeness.

MatrixMarket: the ``coordinate real general/symmetric`` subset (what sparse
solver benchmarks actually use), 1-based indices per the spec.

Checkpoints: a solver's full restartable state is the planner's vector state
plus the solver's scalar recurrences; saved as a single ``.npz``.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..core.matrix import COOMatrix
from ..options import SolverOptions, DEFAULT_OPTIONS


def read_matrix_market(
    path: str, options: SolverOptions = DEFAULT_OPTIONS
) -> COOMatrix:
    """Read a MatrixMarket coordinate file into a COOMatrix."""
    with open(path, "r") as f:
        header = f.readline()
        if not header.startswith("%%MatrixMarket"):
            raise ValueError(f"{path}: not a MatrixMarket file")
        parts = header.split()
        if parts[1] != "matrix" or parts[2] != "coordinate":
            raise ValueError(f"{path}: only coordinate matrices supported")
        field, symmetry = parts[3], parts[4]
        if field not in ("real", "integer", "pattern"):
            raise ValueError(f"{path}: unsupported field {field}")
        line = f.readline()
        while line.startswith("%"):
            line = f.readline()
        n_rows, n_cols, nnz = (int(t) for t in line.split())
        data = np.loadtxt(f, ndmin=2) if nnz else np.empty((0, 3))
    if data.shape[0] != nnz:
        raise ValueError(f"{path}: expected {nnz} entries, got {data.shape[0]}")
    rows = data[:, 0].astype(np.int64) - 1
    cols = data[:, 1].astype(np.int64) - 1
    vals = data[:, 2] if field != "pattern" and data.shape[1] > 2 else np.ones(nnz)
    if symmetry == "symmetric":
        off = rows != cols  # mirror strictly-off-diagonal entries
        rows, cols, vals = (
            np.concatenate([rows, cols[off]]),
            np.concatenate([cols, rows[off]]),
            np.concatenate([vals, vals[off]]),
        )
    elif symmetry != "general":
        raise ValueError(f"{path}: unsupported symmetry {symmetry}")
    name = os.path.splitext(os.path.basename(path))[0]
    return COOMatrix(rows, cols, vals, n_rows, n_cols, name=name, options=options)


def write_matrix_market(path: str, matrix) -> None:
    """Write a COO/CSR operator as MatrixMarket coordinate real general."""
    rows = np.asarray(matrix.rows)
    cols = np.asarray(matrix.cols)
    vals = np.asarray(matrix.vals, dtype=np.float64)
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        f.write(f"{matrix.n_range} {matrix.n_domain} {len(rows)}\n")
        for r, c, v in zip(rows, cols, vals):
            f.write(f"{r + 1} {c + 1} {float(v)!r}\n")


# -- solver checkpointing ---------------------------------------------------

def save_checkpoint(path: str, solver) -> None:
    """Save a solver's restartable state (planner vectors + scalar
    recurrences) to ``path`` (.npz)."""
    planner = solver.planner
    state = planner.dump_state()
    arrays = {}
    for key, vecs in state.items():
        for i, v in enumerate(vecs):
            arrays[f"vec_{key}_{i}"] = np.asarray(v)
    for attr in ("residual_norm_squared", "rho", "alpha", "omega"):
        if hasattr(solver, attr):
            vals = getattr(solver, attr)
            arrays[f"scalar_{attr}"] = np.asarray(
                [np.asarray(s.value) for s in vals]
            )
    np.savez(path, **arrays)


def load_checkpoint(path: str, solver) -> None:
    """Restore state saved by :func:`save_checkpoint` into ``solver`` (which
    must be built over an identically-shaped system)."""
    import jax.numpy as jnp

    from ..core.scalar import Scalar

    data = np.load(path)
    planner = solver.planner
    state = planner.dump_state()
    new_state = {
        key: tuple(
            jnp.asarray(data[f"vec_{key}_{i}"]) for i in range(len(vecs))
        )
        for key, vecs in state.items()
    }
    planner.load_state(new_state)
    for attr in ("residual_norm_squared", "rho", "alpha", "omega"):
        k = f"scalar_{attr}"
        if k in data and hasattr(solver, attr):
            setattr(solver, attr, [Scalar(v) for v in data[k]])
