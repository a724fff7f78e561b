"""Golden partition-derivation tests — analog of reference Test03/Test04
(reference: test/Test03COOPartitioning.cpp, Test04CSRPartitioning.cpp and the
expected piece->index map in test_all.py:19-127).

These pin the exact semantics of the dependent-partition derivations: for the
1-D negative Laplacian with n=20 over 4 pieces,
* range_partition: blocks of 5,
* matrix (kernel) partition: preimage of the row field,
* domain (ghost) partition: image of the col field, with the +-1 overlap at
  block edges.
The expected sets below are transcribed from the reference harness goldens.
"""

import numpy as np
import pytest

from legionsolvers_tpu import (
    BlockPartition,
    coo_negative_laplacian_1d,
    csr_negative_laplacian_1d,
)

# test_all.py:108-127
GOLDEN_RANGE = {
    0: [0, 1, 2, 3, 4],
    1: [5, 6, 7, 8, 9],
    2: [10, 11, 12, 13, 14],
    3: [15, 16, 17, 18, 19],
}

# test_all.py:50-107 (kernel/"matrix" partition of the 58 nonzeros)
GOLDEN_KERNEL = {
    0: list(range(0, 14)),
    1: list(range(14, 29)),
    2: list(range(29, 44)),
    3: list(range(44, 58)),
}

# test_all.py:24-48 (ghost/domain partition, aliased at block edges)
GOLDEN_DOMAIN = {
    0: [0, 1, 2, 3, 4, 5],
    1: [4, 5, 6, 7, 8, 9, 10],
    2: [9, 10, 11, 12, 13, 14, 15],
    3: [14, 15, 16, 17, 18, 19],
}


@pytest.mark.parametrize("fmt", ["coo", "csr"])
def test_partition_goldens(fmt):
    n, pieces = 20, 4
    A = (coo_negative_laplacian_1d if fmt == "coo" else csr_negative_laplacian_1d)(n)
    part = BlockPartition(n, pieces)

    assert part.index_map() == GOLDEN_RANGE

    kernel = A.kernel_partition_from_range_partition(part)
    assert {p: k.tolist() for p, k in enumerate(kernel)} == GOLDEN_KERNEL

    domain = A.domain_partition_from_kernel_partition(kernel)
    assert {p: d.tolist() for p, d in enumerate(domain)} == GOLDEN_DOMAIN

    # composition (reference: AbstractMatrix.cpp:8-29)
    domain2 = A.domain_partition_from_range_partition(part)
    assert {p: d.tolist() for p, d in enumerate(domain2)} == GOLDEN_DOMAIN


def test_reverse_derivations():
    """Round-trip: range-from-kernel recovers row blocks; kernel-from-domain
    partitions by column ownership (reference: COOMatrix.cpp:57-74, 121-141)."""
    n, pieces = 20, 4
    A = coo_negative_laplacian_1d(n)
    part = BlockPartition(n, pieces)
    kernel = A.kernel_partition_from_range_partition(part)
    rng = A.range_partition_from_kernel_partition(kernel)
    assert {p: r.tolist() for p, r in enumerate(rng)} == GOLDEN_RANGE

    kd = A.kernel_partition_from_domain_partition(part)
    # every nonzero lands in exactly one piece (disjoint + complete)
    all_idx = np.sort(np.concatenate(kd))
    np.testing.assert_array_equal(all_idx, np.arange(A.n_kernel))
    for p, idx in enumerate(kd):
        lo, hi = part.piece_bounds(p)
        assert np.all((A.cols[idx] >= lo) & (A.cols[idx] < hi))


def test_csr_row_rects():
    """CSR rowptr Rect parity (reference: CSRMatrix.hpp:22-23,
    ExampleSystems.cpp:448-466): row i of the 1-D Laplacian owns kernel
    indices [3i-1, 3i+1] clipped to [0, 3n-3]."""
    n = 20
    A = csr_negative_laplacian_1d(n)
    rects = A.row_rects()
    assert rects[0].tolist() == [0, 1]
    assert rects[n - 1].tolist() == [3 * n - 4, 3 * n - 3]
    for i in range(1, n - 1):
        assert rects[i].tolist() == [3 * i - 1, 3 * i + 1]


def test_unequal_padding_partition():
    part = BlockPartition(10, 4)  # block 3, last piece has 1 real element
    assert part.block_size == 3
    assert part.padded_size == 12
    assert part.index_map() == {0: [0, 1, 2], 1: [3, 4, 5], 2: [6, 7, 8], 3: [9]}
    assert part.mask().sum() == 10
    np.testing.assert_array_equal(
        part.owner_of(np.array([0, 2, 3, 8, 9])), [0, 0, 1, 2, 3]
    )
