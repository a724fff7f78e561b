"""Utility subsystem tests: the print_index_partition golden-format output
must reproduce the reference harness's EXPECTED_PARTITION_OUTPUT exactly
(test_all.py:19-127) when fed the derived partitions of the n=20 Laplacian."""

import numpy as np

from legionsolvers_tpu import BlockPartition, coo_negative_laplacian_1d
from legionsolvers_tpu.utils.debug import format_index_partition
from legionsolvers_tpu.utils.initialize import initialize
from legionsolvers_tpu.utils.timing import time_call

# The reference's full expected output (test_all.py:19-127), reproduced as
# data: sorted lines for the three partitions of the n=20, 4-piece system.
EXPECTED_HEADERS = [
    "[LegionSolvers] Printing index partition domain_partition with 4 pieces.",
    "[LegionSolvers] Printing index partition matrix_partition with 4 pieces.",
    "[LegionSolvers] Printing index partition range_partition with 4 pieces.",
]
DOMAIN = {0: range(6), 1: [4, 5, 6, 7, 8, 9, 10], 2: [9, 10, 11, 12, 13, 14, 15],
          3: [14, 15, 16, 17, 18, 19]}
MATRIX = {0: range(0, 14), 1: range(14, 29), 2: range(29, 44), 3: range(44, 58)}
RANGE = {p: range(5 * p, 5 * p + 5) for p in range(4)}


def expected_lines():
    lines = list(EXPECTED_HEADERS)
    for name, mp in [("domain_partition", DOMAIN), ("matrix_partition", MATRIX),
                     ("range_partition", RANGE)]:
        for p, idxs in mp.items():
            lines += [f"{name} ({p}) <{i}>" for i in idxs]
    return sorted(lines)


def test_partition_print_matches_reference_harness():
    n, pieces = 20, 4
    A = coo_negative_laplacian_1d(n)
    part = BlockPartition(n, pieces)
    kernel = A.kernel_partition_from_range_partition(part)
    domain = A.domain_partition_from_kernel_partition(kernel)

    out = (
        format_index_partition("range_partition", part)
        + format_index_partition("matrix_partition", kernel)
        + format_index_partition("domain_partition", domain)
    )
    assert sorted(out) == expected_lines()


def test_initialize_banner(capsys):
    initialize(print_info=True, verbose=False)
    out = capsys.readouterr().out
    assert "[LegionSolvers]" in out
    assert "legionsolvers_tpu" in out
    initialize(print_info=False)  # silent path


def test_time_call_basic():
    import jax.numpy as jnp

    t = time_call(lambda: jnp.arange(1000).sum(), reps=2)
    assert t >= 0
