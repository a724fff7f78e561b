"""General N-D stencil -> sparse matrix generators.

TPU-native analog of the reference's ``StencilGenerator``
(reference: StencilGenerator.hpp:270-643, StencilGenerator.cpp).  A stencil
is a list of ``(offset_vector, entry_value)`` pairs over an N-D grid; the
matrix has ``A[p, p+o] = v`` for every grid point ``p`` with ``p+o`` in
bounds.  Grid points are linearized **row-major** (C order), matching the
reference's ``linearize_row_major`` (StencilGenerator.hpp:231-243) used by
the linearized-CSR factory that BenchmarkStencil drives.

Where the reference index-launches fill tasks that enumerate grid points and
skip to their owned kernel range (with a bulk-slice fast-forward optimization,
StencilGenerator.cpp:464-516), the TPU build generates the arrays vectorized
on the host in O(nnz); the scalable no-materialization path for huge grids is
the DIA :class:`~legionsolvers_tpu.parallel.stencil_op.StencilOperator`,
which never stores per-nonzero data at all.

Benchmark stencils (reference: BenchmarkStencil.cpp:24-137): 1-D 3-point,
2-D 5-point, 3-D 7-point Laplacians and the 3-D 27-point kernel.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from ..core.matrix import COOMatrix, CSRMatrix
from ..options import MAX_DIM, SolverOptions, DEFAULT_OPTIONS

Offset = Tuple[int, ...]
Stencil = Sequence[Tuple[Offset, float]]


def calculate_stencil_size(shape: Sequence[int], offsets: Stencil) -> int:
    """Exact nonzero count (reference: calculate_stencil_size,
    StencilGenerator.hpp:270-323, computed there by recursion over dims; the
    closed form is prod_d max(n_d - |o_d|, 0) summed over offsets)."""
    total = 0
    for off, _ in offsets:
        cnt = 1
        for n_d, o_d in zip(shape, off):
            cnt *= max(n_d - abs(o_d), 0)
        total += cnt
    return total


def _strides(shape: Sequence[int]) -> List[int]:
    """Row-major strides (reference: linearize_row_major accumulates from the
    last dimension, StencilGenerator.hpp:231-243)."""
    s = [1] * len(shape)
    for i in range(len(shape) - 2, -1, -1):
        s[i] = s[i + 1] * shape[i + 1]
    return s


def linear_offset(shape: Sequence[int], off: Offset) -> int:
    """The constant linearized distance of a stencil offset."""
    return int(sum(o * st for o, st in zip(off, _strides(shape))))


def stencil_coo_arrays(shape: Sequence[int], offsets: Stencil):
    """Generation of (rows, cols, vals), sorted row-major by (row, col) so
    COO and CSR agree on layout.  Uses the native C++ fill loop when the
    shared library is available (legionsolvers_tpu/native — the analog of
    the reference's C++ fill tasks), vectorized numpy otherwise."""
    shape = tuple(int(n) for n in shape)
    if not (1 <= len(shape) <= MAX_DIM):
        raise ValueError(f"stencil dim must be 1..{MAX_DIM}, got {len(shape)}")
    n = int(np.prod(shape))

    from ..native import stencil_fill_coo as _native_fill

    # Pre-sort the offsets by their LINEAR offset: the fill enumerates grid
    # points in row order and offsets in the given order per point, so the
    # emitted stream is then already (row, col)-sorted and the O(nnz log
    # nnz) global lexsort (measured ~850 s at n = 2^28) disappears.
    lin = np.asarray(
        [linear_offset(shape, o) for o, _ in offsets], np.int64
    )
    oorder = np.argsort(lin, kind="stable")
    offs_sorted = [offsets[int(i)] for i in oorder]
    res = _native_fill(
        np.asarray(shape, np.int64),
        np.asarray([o for o, _ in offs_sorted], np.int64).reshape(
            len(offsets), -1),
        np.asarray([v for _, v in offs_sorted], np.float64),
    )
    if res is not None:
        rows, cols, vals = res
        return rows, cols, vals, n

    strides = _strides(shape)
    rows_l, cols_l, vals_l = [], [], []
    for off, val in offsets:
        # valid points: lo_d <= p_d + o_d < n_d  ->  p_d in [max(0,-o), n - max(0,o))
        ranges = [
            np.arange(max(0, -o), n_d - max(0, o), dtype=np.int64)
            for n_d, o in zip(shape, off)
        ]
        if any(len(r) == 0 for r in ranges):
            continue
        grids = np.meshgrid(*ranges, indexing="ij")
        p_lin = sum(g * st for g, st in zip(grids, strides)).ravel()
        rows_l.append(p_lin)
        cols_l.append(p_lin + linear_offset(shape, off))
        vals_l.append(np.full(len(p_lin), val))
    rows = np.concatenate(rows_l) if rows_l else np.empty(0, np.int64)
    cols = np.concatenate(cols_l) if cols_l else np.empty(0, np.int64)
    vals = np.concatenate(vals_l) if vals_l else np.empty(0, np.float64)
    order = np.lexsort((cols, rows))
    assert len(rows) == calculate_stencil_size(shape, offsets)
    return rows[order], cols[order], vals[order], n


def create_coo_stencil_matrix(
    shape: Sequence[int],
    offsets: Stencil,
    name: str = "stencil_coo",
    options: SolverOptions = DEFAULT_OPTIONS,
) -> COOMatrix:
    """reference: create_coo_stencil_matrix, StencilGenerator.hpp:326-416
    (linearized: grid mapped to a 1-D index space)."""
    rows, cols, vals, n = stencil_coo_arrays(shape, offsets)
    return COOMatrix(rows, cols, vals, n, n, name=name, options=options)


def create_csr_stencil_matrix(
    shape: Sequence[int],
    offsets: Stencil,
    name: str = "stencil_csr",
    options: SolverOptions = DEFAULT_OPTIONS,
) -> CSRMatrix:
    """reference: create_csr_stencil_matrix / create_linearized_csr_stencil_matrix,
    StencilGenerator.hpp:419-643 (the variant BenchmarkStencil uses)."""
    rows, cols, vals, n = stencil_coo_arrays(shape, offsets)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, rows + 1, 1)
    indptr = np.cumsum(indptr)
    return CSRMatrix(indptr, cols, vals, n, n, name=name, options=options)


# Alias for reference-name parity: the reference distinguishes N-D-indexed
# CSR from linearized (1-D-indexed) CSR; this build always linearizes.
create_linearized_csr_stencil_matrix = create_csr_stencil_matrix


def laplacian_stencil(dim: int) -> Stencil:
    """The benchmark stencils (reference: BenchmarkStencil.cpp:24-137).
    ``dim`` in {1, 2, 3} gives the standard 3/5/7-point negative Laplacian
    over a ``dim``-D grid; ``dim == 4`` (as in the reference CLI) is the 3-D
    27-point kernel (grid is 3-D)."""
    if dim == 1:
        return [((0,), 2.0), ((-1,), -1.0), ((1,), -1.0)]
    if dim == 2:
        return [
            ((0, 0), 4.0),
            ((-1, 0), -1.0), ((1, 0), -1.0),
            ((0, -1), -1.0), ((0, 1), -1.0),
        ]
    if dim == 3:
        return [
            ((0, 0, 0), 6.0),
            ((-1, 0, 0), -1.0), ((1, 0, 0), -1.0),
            ((0, -1, 0), -1.0), ((0, 1, 0), -1.0),
            ((0, 0, -1), -1.0), ((0, 0, 1), -1.0),
        ]
    if dim == 4:  # 3-D 27-point (reference: BenchmarkStencil.cpp:80-130)
        offs: List[Tuple[Offset, float]] = [((0, 0, 0), 88.0 / 26.0)]
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    dist = abs(dx) + abs(dy) + abs(dz)
                    if dist == 0:
                        continue
                    val = {1: -6.0 / 26.0, 2: -3.0 / 26.0, 3: -2.0 / 26.0}[dist]
                    offs.append(((dx, dy, dz), val))
        return offs
    raise ValueError(f"dim must be 1..4, got {dim}")


def stencil_grid_ndim(dim: int) -> int:
    """Grid dimensionality for a benchmark ``dim`` selector (4 -> 3-D grid)."""
    return 3 if dim == 4 else dim
