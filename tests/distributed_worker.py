"""Worker for the multi-process distributed test (run via subprocess).

The reference tests real multi-node execution with jsrun resource sets
(reference: test_all.py:136-161); the stand-in here is two OS processes with
2 virtual CPU devices each, joined by ``jax.distributed.initialize`` into one
4-device mesh, solving the n=100 golden system across the process boundary.

Usage: python distributed_worker.py <process_id> <num_processes> <port>
Prints "GOLDEN_OK" when the residual trajectory matches the reference golden.
"""

import os
import sys


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    # replace (not append) any inherited device-count flag — e.g. the test
    # harness's 8-device setting
    flags = [
        f
        for f in os.environ.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append("--xla_force_host_platform_device_count=2")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from legionsolvers_tpu.parallel.mesh import initialize_distributed, make_mesh

    initialize_distributed(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc, len(jax.devices())

    import numpy as np
    import jax.numpy as jnp

    from legionsolvers_tpu import (
        BlockPartition,
        CGSolver,
        PartitionedVector,
        SolverOptions,
        SquarePlanner,
        coo_negative_laplacian_1d,
    )

    opts = SolverOptions(entry_dtype=jnp.float64)
    mesh = make_mesh(2 * nproc)
    part = BlockPartition(100, 2 * nproc)
    A = coo_negative_laplacian_1d(100, options=opts)
    planner = SquarePlanner(mesh=mesh, options=opts)
    planner.add_sol_vector(
        PartitionedVector("s", part, mesh=mesh, options=opts).zero_fill()
    )
    planner.add_rhs_vector(
        PartitionedVector("b", part, mesh=mesh, options=opts).constant_fill(1.0)
    )
    planner.add_row_partitioned_matrix(A, 0, 0)
    hist = CGSolver(planner).solve(10)
    # history scalars are replicated: fetching them is process-local
    vals = [float(v) for v in np.asarray(jax.device_get(hist))]
    golden = [100, 4900, 4704, 4512, 4324, 4140, 3960, 3784, 3612, 3444, 3280]
    assert vals == golden, vals
    print(f"GOLDEN_OK process {pid}/{nproc}", flush=True)


if __name__ == "__main__":
    main()
