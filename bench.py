"""Benchmark driver — the analog of the reference's BenchmarkStencil
(reference: test/BenchmarkStencil.cpp:209-262: warmup traces, timed traces,
"Achieved X ms per iteration"; metric definition in bench_all.py:206).

Runs CG on the 2-D 5-point negative Laplacian (the reference's dim-2
benchmark case) on the real TPU chip, f32, via the matrix-free DIA stencil
operator, and prints ONE JSON line:

  {"metric": "cg_spmv_nnz_per_s", "value": ..., "unit": "nnz/s",
   "vs_baseline": ...}

The reference publishes no absolute numbers (BASELINE.md), so ``vs_baseline``
is the fraction of the *measured* HBM streaming speed-of-light for a full CG
iteration at the schedule actually executed.  The bytes-per-iteration model
is shared with legionsolvers_tpu/benchmark.py (utils/roofline.py), and the
roofline itself is the VMEM-residency-proof triad of
utils/timing.measure_stream_bandwidth (validated against a Pallas HBM copy
kernel in scripts/probe_roofline.py).  1.0 = memory-bound optimum.

Timing is marginal (short vs long compiled runs) to cancel the dispatch
relay's fixed latency — see legionsolvers_tpu/utils/timing.py.
"""

from __future__ import annotations

import json
import sys

import jax.numpy as jnp
import numpy as np

N_GRID = 4096            # 2-D grid edge -> n = 16.7M unknowns
SHORT_ITERS = 50
LONG_ITERS = 250         # marginal window: 200 iterations (reference count)


def main() -> None:
    from legionsolvers_tpu import CGSolver, SolverOptions
    from legionsolvers_tpu.utils.roofline import solver_bytes_per_iteration
    from legionsolvers_tpu.utils.timing import (
        marginal_seconds_per_iter,
        measure_stream_bandwidth,
    )
    import __graft_entry__ as ge

    options = SolverOptions(entry_dtype=jnp.float32)
    planner = ge._build_system(N_GRID, mesh=None, pieces=1, options=options)
    solver = CGSolver(planner)
    n = N_GRID * N_GRID
    nnz = 5 * N_GRID * N_GRID - 4 * N_GRID  # 5-pt stencil exact nnz
    bytes_per_iter, schedule = solver_bytes_per_iteration(solver, n)
    print(f"[bench] CG schedule: {schedule} "
          f"({bytes_per_iter / n:.0f} B/unknown/iter)", file=sys.stderr)

    # default probe size (256 MB arrays): the problem size itself (64 MB at
    # n=2^24) fits in VMEM and lets XLA fold the probe loop (~3x over-report)
    bw = measure_stream_bandwidth()
    print(f"[bench] measured stream bandwidth: {bw/1e9:.0f} GB/s", file=sys.stderr)

    # repeated runs re-derive the initial state (fills + reset) rather than
    # snapshotting the planner — no second copy of the vectors stays live —
    # and the fused runner consumes (donates) its x/r/p buffers in place
    solver.donate_workspace = True

    def run(iters):
        for v in planner.sol_vectors:
            v.zero_fill()
        solver.reset()
        return solver.solve(iters)

    run(SHORT_ITERS), run(LONG_ITERS)  # compile both (cached scans)
    sec_per_iter = marginal_seconds_per_iter(run, SHORT_ITERS, LONG_ITERS)
    # report the short-run residual: f32 CG on this kappa ~ 1.7e6 system is
    # numerically meaningful at 50 iterations (long runs are fixed-work
    # timing only, like the reference's tol=0 baselines)
    hist = run(SHORT_ITERS)

    ms_per_iter = sec_per_iter * 1e3
    nnz_per_s = nnz / sec_per_iter
    stream_ms = bytes_per_iter / bw * 1e3
    # Binding roofline = max(stream, compute), with the compute side
    # MEASURED with the real kernel (round-4 upgrade, PROFILE_r04.md §1:
    # the step2 pass runs VMEM-resident at R=256 — 21.5 ps/elt, 1.6x the
    # stream's apparent bandwidth — so its per-element time is the VPU
    # ceiling; the analytic model round 3 discarded is gone).  On current
    # measurements compute (0.18 ms/iter scaled) sits BELOW stream
    # (0.29 ms/iter), so the stream SOL binds and the reported fraction is
    # honest roofline efficiency: the remaining gap is the kernel's
    # measured compute/DMA overlap deficit.
    compute_ms = None
    if schedule.startswith("fused2d_x2"):
        from legionsolvers_tpu.utils.timing import (
            measure_step2_compute_ceiling,
        )

        op = planner.row_partitioned_matrices[0][0]
        v = op._view
        try:
            per_elt, apparent = measure_step2_compute_ceiling(
                v["offs"], v["vals"]
            )
            if apparent > 1.5 * bw:
                compute_ms = per_elt * n / 2 * 1e3  # step2 = 2 iterations
                print(f"[bench] measured step2 compute ceiling: "
                      f"{per_elt*1e12:.1f} ps/elt "
                      f"(resident at {apparent/1e9:.0f} GB/s apparent) -> "
                      f"{compute_ms:.3f} ms/iter", file=sys.stderr)
            else:
                print(f"[bench] note: compute-ceiling probe not VMEM-"
                      f"resident ({apparent/1e9:.0f} GB/s apparent); "
                      "stream-only roofline", file=sys.stderr)
        except Exception as e:
            print(f"[bench] note: ceiling probe failed ({e}); "
                  "stream-only roofline", file=sys.stderr)
    sol_ms = max(stream_ms, compute_ms or 0.0)
    vs_baseline = sol_ms / ms_per_iter  # fraction of the BINDING roofline

    binding = ("compute" if compute_ms and compute_ms > stream_ms
               else "stream")
    comp_txt = f", compute-SOL {compute_ms:.3f} ms" if compute_ms else ""
    print(
        f"[bench] 2-D 5-pt CG, n={n} ({N_GRID}x{N_GRID}), f32, 1 chip: "
        f"{ms_per_iter:.3f} ms/iter (stream-SOL {stream_ms:.3f} ms"
        f"{comp_txt}; binding: {binding}), "
        f"{nnz_per_s/1e9:.2f} Gnnz/s, residual2[{SHORT_ITERS}] "
        f"{float(np.asarray(hist)[-1]):.4g}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "cg_spmv_nnz_per_s",
                "value": nnz_per_s,
                "unit": "nnz/s",
                "vs_baseline": vs_baseline,
            }
        )
    )


if __name__ == "__main__":
    main()
