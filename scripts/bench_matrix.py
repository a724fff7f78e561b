"""Full reference benchmark matrix on one chip + max-size discovery.

The analog of the reference's recorded per-node-count scaling tables
(reference: bench_all_ls.py:365-494 pins the max problem size per node count
and sweeps dims 1-4 x {CG, BiCGStab, GMRES(10)}).  This runs the same 12
configurations on the attached chip at a fixed comparison size (n ~= 16.7M,
f32) via the BenchmarkStencil-equivalent CLI, then discovers the max CG
problem size per dim by doubling until the chip OOMs, and writes the results
table to RESULTS.md.

Usage:
  python scripts/bench_matrix.py            # 12-config matrix
  python scripts/bench_matrix.py --maxsize  # max-size discovery (CG, f32)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# (dim, -nx -ny -nz args) at n ~= 16.7M for every dim
SHAPES = {
    1: ["-nx", str(1 << 24)],
    2: ["-nx", "4096", "-ny", "4096"],
    3: ["-nx", "256", "-ny", "256", "-nz", "256"],
    4: ["-nx", "256", "-ny", "256", "-nz", "256"],
}


def run_matrix(bw, iters=100):
    from legionsolvers_tpu.benchmark import main as bench_main

    rows = []
    for dim in (1, 2, 3, 4):
        for solver in (1, 2, 3):
            it = max(iters // 10, 5) if solver == 3 else iters
            argv = ["-dim", str(dim), "-solver", str(solver),
                    "-it", str(it)] + SHAPES[dim]
            print(f"[matrix] running dim={dim} solver={solver}", flush=True)
            try:
                rows.append(bench_main(argv, bw=bw))
            except Exception as e:  # record failures, keep sweeping
                print(f"[matrix] FAILED dim={dim} solver={solver}: "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)
                rows.append({"dim": dim, "solver": str(solver),
                             "error": type(e).__name__})
            print(json.dumps(rows[-1]), flush=True)
    return rows


def discover_max_size(bw):
    """Double the 1-chip CG problem size per dim until allocation fails
    (analog of the reference's recorded max sizes, bench_all_ls.py:366-379)."""
    from legionsolvers_tpu.benchmark import main as bench_main

    # start sizes chosen ~1/4 of the expected ceiling; shapes double by dim
    ladders = {
        1: [["-nx", str(1 << k)] for k in range(27, 32)],
        2: [["-nx", str(1 << k), "-ny", str(1 << k)]
            for k in [13, 14]] + [["-nx", "32768", "-ny", "16384"]],
        3: [["-nx", "512", "-ny", "512", "-nz", "512"],
            ["-nx", "1024", "-ny", "512", "-nz", "512"],
            ["-nx", "1024", "-ny", "1024", "-nz", "512"]],
        4: [["-nx", "512", "-ny", "512", "-nz", "512"],
            ["-nx", "1024", "-ny", "512", "-nz", "512"]],
    }
    results = {}
    for dim, ladder in ladders.items():
        best = None
        for shape_args in ladder:
            argv = ["-dim", str(dim), "-solver", "1", "-it", "20"] + shape_args
            try:
                r = bench_main(argv, bw=bw)
                best = r
                print(f"[maxsize] dim={dim} ok at n={r['n']}", flush=True)
            except Exception as e:
                print(f"[maxsize] dim={dim} failed at {shape_args}: "
                      f"{type(e).__name__}", flush=True)
                break
        results[dim] = best
        print(json.dumps({"dim": dim, "max": best}), flush=True)
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--maxsize", action="store_true")
    p.add_argument("--no-probe", action="store_true")
    args = p.parse_args()

    import jax

    from legionsolvers_tpu.utils.timing import measure_stream_bandwidth

    bw = None
    if jax.default_backend() == "tpu" and not args.no_probe:
        bw = measure_stream_bandwidth()
        print(f"[matrix] stream bandwidth {bw/1e9:.0f} GB/s", flush=True)

    if args.maxsize:
        discover_max_size(bw)
    else:
        run_matrix(bw)


if __name__ == "__main__":
    main()
