"""On-chip speeds of the primitives a general-sparsity SpMV could compose.

The round-4 verdict's last capability gap: matrices RCM cannot band fall to
the XLA-gather ELL at 0.11 Gnnz/s (RESULTS §3), where cuSPARSE is
pattern-agnostic (reference: CSRMatrixTasks.cu:14-156).  Candidate designs
route the arbitrary gather through host-planned radix stages (regular
transposes + within-row one-vreg permutations).  This probe measures each
primitive in isolation on the real chip:

1. jnp.take, random indices (the current fallback's core — baseline);
2. jnp.take_along_axis, per-row random indices within 1024-wide rows
   (the within-row permutation stage, XLA version);
3. the winell kernel as a pure gather (within-row perm, Pallas version);
4. big-array transpose (the long-range movement stage);
5. monotone (column-sorted) gather via winell (phase-1a of the two-phase
   design);
6. masked segmented shift-add (the row-sum stage).

Usage: python scripts/probe_gather_primitives.py  (TPU; one process only).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

M = 8 * 1024 * 1024     # nonzeros
N = 1024 * 1024         # unknowns


def bench(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(7):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best, out


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, M).astype(np.int32))

    # 1. random jnp.take
    f = jax.jit(lambda x, i: jnp.take(x, i))
    t, _ = bench(f, x, idx, reps=3)
    print(f"1. jnp.take random      M={M}: {t*1e3:8.3f} ms  "
          f"{M/t/1e9:7.2f} Gelt/s")

    # 2. take_along_axis within 1024-wide rows
    R = M // 1024
    z = jnp.asarray(rng.standard_normal((R, 1024)).astype(np.float32))
    rowidx = jnp.asarray(rng.integers(0, 1024, (R, 1024)).astype(np.int32))
    f2 = jax.jit(lambda z, i: jnp.take_along_axis(z, i, axis=1))
    t, _ = bench(f2, z, rowidx, reps=3)
    print(f"2. take_along_axis 1024 M={M}: {t*1e3:8.3f} ms  "
          f"{M/t/1e9:7.2f} Gelt/s")

    # 3. winell kernel as within-row permutation (KR=8 windows)
    from legionsolvers_tpu.parallel.winell_op import plan_winell

    src = (np.arange(M, dtype=np.int64) // 1024) * 1024 + rng.integers(
        0, 1024, M)
    plan = plan_winell(
        np.arange(M, dtype=np.int64), src, np.ones(M), M, M, np.float32,
        tile_rows_of_128=8, min_fill=0.0,
    )
    assert plan is not None, "winell plan failed for within-row perm"
    from legionsolvers_tpu.ops.pallas.winell import winell_spmv

    zflat = jnp.asarray(rng.standard_normal(plan["N"]).astype(np.float32))
    ws = jnp.asarray(plan["wstart"])
    pc = jnp.asarray(plan["cols"])
    pv = jnp.asarray(plan["vals"])

    # plan arrays as ARGUMENTS: closed-over device arrays become HLO
    # constants and overflow the remote-compile relay at this size
    f3 = jax.jit(lambda zf, ws, pc, pv: winell_spmv(
        zf.reshape(-1, 128), ws, pc, pv,
        window_rows=plan["window_rows"]))
    t, _ = bench(f3, zflat, ws, pc, pv, reps=3)
    print(f"3. winell row-perm KR={plan['window_rows']:2d} M={M}: "
          f"{t*1e3:8.3f} ms  {M/t/1e9:7.2f} Gelt/s "
          f"(Rt={plan['tile_rows_of_128']}, L={plan['row_length']})")

    # 4. transpose [8192, 1024] f32
    f4 = jax.jit(lambda z: z.T.copy())
    t, _ = bench(f4, z, reps=5)
    print(f"4. transpose [{R},1024]      : {t*1e3:8.3f} ms  "
          f"{2*M*4/t/1e9:7.1f} GB/s")

    # 5. monotone gather: column-sorted expansion of x (counts ~ Poisson(8))
    cols_sorted = np.sort(rng.integers(0, N, M)).astype(np.int64)
    plan5 = plan_winell(
        np.arange(M, dtype=np.int64), cols_sorted, np.ones(M), M,
        max(M, N), np.float32, tile_rows_of_128=8, min_fill=0.0,
    )
    if plan5 is None:
        print("5. monotone gather: plan FAILED")
    else:
        ws5 = jnp.asarray(plan5["wstart"])
        pc5 = jnp.asarray(plan5["cols"])
        pv5 = jnp.asarray(plan5["vals"])
        xpad = jnp.pad(x, (0, plan5["N"] - N))
        f5 = jax.jit(lambda xp, ws5, pc5, pv5: winell_spmv(
            xp.reshape(-1, 128), ws5, pc5, pv5,
            window_rows=plan5["window_rows"]))
        t, out5 = bench(f5, xpad, ws5, pc5, pv5, reps=3)
        ref = np.asarray(x)[cols_sorted]
        got = np.asarray(out5).reshape(-1)[:M]
        ok = np.allclose(got, ref)
        print(f"5. monotone gather KR={plan5['window_rows']:2d} M={M}: "
              f"{t*1e3:8.3f} ms  {M/t/1e9:7.2f} Gelt/s  correct={ok}")

    # 6. segmented shift-add row sum (Lmax=32) over M products
    p = jnp.asarray(rng.standard_normal(M).astype(np.float32))
    seg = jnp.asarray((rng.integers(0, N, M)).astype(np.int32))

    def segsum(p, seg):
        acc = p
        for k in (1, 2, 4, 8, 16):
            shifted = jnp.concatenate([acc[k:], jnp.zeros(k, acc.dtype)])
            same = jnp.concatenate(
                [seg[k:] == seg[:-k],
                 jnp.zeros(k, bool)])
            acc = acc + jnp.where(same, shifted, 0.0)
        return acc

    f6 = jax.jit(segsum)
    t, _ = bench(f6, p, seg, reps=5)
    print(f"6. segmented shift-add (5 lv): {t*1e3:8.3f} ms  "
          f"{M/t/1e9:7.2f} Gelt/s")


if __name__ == "__main__":
    main()
