"""Locate fused-CG orchestration overhead: time the jitted runner directly
(raw device arrays in, history out) vs the full CGSolver.solve path
(planner state restore + Scalar history rebuild), sharing one set of
compiled executables."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from legionsolvers_tpu.utils.timing import marginal_seconds_per_iter

N_GRID = 4096
SHORT, LONG = 50, 250


def main():
    from legionsolvers_tpu import CGSolver, SolverOptions
    import __graft_entry__ as ge

    options = SolverOptions(entry_dtype=jnp.float32)
    planner = ge._build_system(N_GRID, mesh=None, pieces=1, options=options)
    solver = CGSolver(planner)
    init_state = planner.dump_state()
    init_rr = solver.residual_norm_squared[-1]

    def run_solver(iters):
        planner.load_state(init_state)
        solver.residual_norm_squared = [init_rr]
        return solver.solve(iters)

    t0 = time.perf_counter()
    run_solver(SHORT)
    print(f"compile+run({SHORT}): {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    run_solver(LONG)
    print(f"compile+run({LONG}): {time.perf_counter()-t0:.1f}s", flush=True)

    sec = marginal_seconds_per_iter(run_solver, SHORT, LONG)
    print(f"CGSolver.solve    : {sec*1e3:.3f} ms/iter", flush=True)

    # the same compiled runners, called directly with raw arrays
    fr = {k: solver._solve_cache.get((k, "fused", False)) for k in (SHORT, LONG)}
    missing = [k for k, v in fr.items() if v is None]
    assert not missing, (
        f"no fused runner compiled for iters={missing} — this topology fell "
        "back to the generic step path; the raw-runner comparison only "
        "applies to the fused path")
    # re-load the INITIAL state: run_solver(LONG) above left the planner at
    # the converged state, and timing from there with rr0 would desync the
    # CG recurrence (garbage history, though timing would still be valid)
    planner.load_state(init_state)
    x0 = planner.get_vector(CGSolver.SOL, 0).data
    r0 = planner.get_vector(CGSolver.R, 0).data
    p0 = planner.get_vector(CGSolver.P, 0).data
    rr0 = jnp.float32(float(np.asarray(init_rr.value)))

    def run_raw(k):
        x, r, p, hist = fr[k](x0, r0, p0, rr0)
        return hist

    run_raw(SHORT); run_raw(LONG)
    sec = marginal_seconds_per_iter(run_raw, SHORT, LONG)
    print(f"raw jitted runner : {sec*1e3:.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
