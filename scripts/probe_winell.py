"""On-chip probe: windowed-gather ELL SpMV vs the XLA-gather ELL fallback.

Round-4 target (VERDICT r3 next-round #1): >= 10 Gnnz/s on a matrix the DIA
gate genuinely rejects, vs the 0.11 Gnnz/s measured for the XLA-gather ELL
in round 3.  Two such matrices:

* ``permlap``: a randomly permuted 2-D 5-pt Laplacian (n = 2048^2), RCM'd
  back to bandwidth ~2048 — scattered within the band, ~1030 distinct
  diagonals at ~0.2% diagonal fill (DIA gate: reject);
* ``randband``: random banded matrix, bandwidth 512, ~8 nnz/row — ~1025
  diagonals (DIA gate: reject).

Usage: python scripts/probe_winell.py [--which permlap|randband|both]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def build_permlap(nx=2048, seed=0):
    from legionsolvers_tpu.native import bindings as nb

    n = nx * nx
    shape = np.array([nx, nx])
    offs = np.array([[0, 0], [-1, 0], [1, 0], [0, -1], [0, 1]])
    w = np.array([0.5, -0.124, -0.124, -0.124, -0.124])  # spectral radius < 1
    rows, cols, vals = nb.stencil_fill_coo(shape, offs, w)
    rng = np.random.default_rng(seed)
    pr = rng.permutation(n)
    prows, pcols = pr[rows], pr[cols]
    perm = nb.rcm_permutation(n, prows, pcols)
    iperm = np.empty(n, np.int64)
    iperm[perm] = np.arange(n)
    return iperm[prows], iperm[pcols], vals, n


def build_randband(n=4 * 1024 * 1024, bw=512, avg_nnz=8, seed=1):
    rng = np.random.default_rng(seed)
    nnz0 = n * avg_nnz
    rows = rng.integers(0, n, nnz0)
    cols = rows + rng.integers(-bw, bw + 1, nnz0)
    keep = (cols >= 0) & (cols < n)
    rows, cols = rows[keep], cols[keep]
    # scale keeps repeated applications bounded: |A|_inf <= 1
    vals = rng.uniform(-1.0, 1.0, len(rows)) / (2.0 * avg_nnz)
    return rows, cols, vals, n


def run_probe(name, rows, cols, vals, n, compare_ell, rt=None):
    import jax
    import jax.numpy as jnp
    from legionsolvers_tpu.parallel.winell_op import plan_winell, WinEllOperator
    from legionsolvers_tpu.core.partition import BlockPartition
    from legionsolvers_tpu.options import SolverOptions
    from legionsolvers_tpu.utils.timing import marginal_seconds_per_iter

    nnz = len(rows)
    print(f"[{name}] n={n} nnz={nnz} rt={rt or 'auto'}")
    t0 = time.time()
    plan = plan_winell(rows, cols, vals, n, n, np.float32,
                       tile_rows_of_128=rt)
    dt = time.time() - t0
    if plan is None:
        print(f"[{name}] pack: {dt:.1f}s -> ineligible")
        return
    print(f"[{name}] pack: {dt:.1f}s -> Rt={plan['tile_rows_of_128']} "
          f"KR={plan['window_rows']} L={plan['row_length']}")

    class M:
        pass

    m = M()
    m.rows, m.cols, m.vals = rows, cols, vals
    m.n_domain = m.n_range = n
    m.n_kernel = nnz
    part = BlockPartition(n, 1)
    op = WinEllOperator(m, part, SolverOptions(entry_dtype=jnp.float32),
                        plan=plan)

    x0 = jnp.ones(part.padded_size, jnp.float32)

    # thread the matrix buffers as ARGUMENTS (closed-over concrete arrays
    # become HLO constants and overflow the remote-compile relay — the same
    # reason SquarePlanner threads operator state through dump_state)
    def make_run():
        def run(k, x, state):
            op.set_device_state(state)
            return jax.lax.fori_loop(0, k, lambda i, v: op.matvec(v), x)
        return jax.jit(run, static_argnums=0)

    run = make_run()
    st = op.device_state()
    t0 = time.time()
    jax.block_until_ready(run(2, x0, st))
    print(f"[{name}] winell compile+2 iters: {time.time()-t0:.1f}s", flush=True)
    jax.block_until_ready(run(20, x0, st))
    jax.block_until_ready(run(120, x0, st))
    sec = marginal_seconds_per_iter(lambda k: run(k, x0, st), 20, 120)
    g = nnz / sec / 1e9
    print(f"[{name}] WINELL: {sec*1e3:.3f} ms/matvec = {g:.2f} Gnnz/s "
          f"(KR={plan['window_rows']}, L={plan['row_length']})")

    if compare_ell:
        from legionsolvers_tpu.parallel.distmatrix import RowPartitionedMatrix

        t0 = time.time()
        rpm = RowPartitionedMatrix(m, part, part, mesh=None,
                                   options=SolverOptions(entry_dtype=jnp.float32))
        print(f"[{name}] ELL pack: {time.time()-t0:.1f}s")

        def erun(k, x, state):
            rpm.set_device_state(state)
            return jax.lax.fori_loop(0, k, lambda i, v: rpm.matvec(v), x)

        erun = jax.jit(erun, static_argnums=0)
        est = rpm.device_state()
        jax.block_until_ready(erun(1, x0, est))
        jax.block_until_ready(erun(3, x0, est))
        jax.block_until_ready(erun(13, x0, est))
        esec = marginal_seconds_per_iter(
            lambda k: erun(k, x0, est), 3, 13, reps=3
        )
        eg = nnz / esec / 1e9
        print(f"[{name}] XLA-ELL fallback: {esec*1e3:.3f} ms/matvec = "
              f"{eg:.3f} Gnnz/s -> speedup {g/eg:.0f}x")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="both",
                    choices=["permlap", "randband", "both"])
    ap.add_argument("--no-ell", action="store_true")
    ap.add_argument("--rt", type=str, default="",
                    help="comma-separated tile heights (rows of 128) to "
                         "sweep; empty = model choice")
    args = ap.parse_args()
    rts = [int(x) for x in args.rt.split(",") if x] or [None]
    if args.which in ("permlap", "both"):
        data = build_permlap()
        for rt in rts:
            run_probe("permlap", *data, compare_ell=not args.no_ell, rt=rt)
    if args.which in ("randband", "both"):
        data = build_randband()
        for rt in rts:
            run_probe("randband", *data, compare_ell=not args.no_ell, rt=rt)


if __name__ == "__main__":
    main()
