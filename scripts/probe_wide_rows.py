"""Why do the 2-D max-size rungs undershoot their siblings?

r4 verdict weak #2/#3: 2-D CG at 2^30 ran 71% of stream and 2-D BiCGStab
at 2^29 ran 80%, vs 96-99% for the 1-D/3-D rungs at the same byte counts.
Suspects named there: 32768-wide rows breaking the window DMA pattern, or
transient eviction near-full HBM.  This probe separates them by measuring
the SAME kernels at the SAME total n with narrow vs wide row geometry at
comfortable HBM occupancy:

* step2 (s-step CG) pass at (Br, C) = (16384, 4096) vs (2048, 32768);
* the BiCGStab pv/st/update trio at the same pair.

If the wide-C geometry is slower per element at small n, the kernel's
tiling/DMA pattern is the wall (geometry-bound); if both match, the 2^30
deficit is memory-pressure-bound (near-full-HBM transient eviction).

Usage: python scripts/probe_wide_rows.py   (TPU)
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from legionsolvers_tpu.ops.pallas import bicgstab2d as b2
from legionsolvers_tpu.ops.pallas import stencil2d as s2
from legionsolvers_tpu.utils.timing import marginal_seconds_per_iter, time_call


def marg_verbose(call, short, long):
    ts = time_call(call, short)
    tl = time_call(call, long)
    print(f"    raw: t[{short}]={ts*1e3:.1f} ms, t[{long}]={tl*1e3:.1f} ms",
          flush=True)
    return max((tl - ts) / (long - short), 1e-12)

OFFS = ((0, 0), (0, 1), (0, -1), (1, 0), (-1, 0))
VALS = (-4.0, 1.0, 1.0, 1.0, 1.0)


def marg(make_body, label, n, extra_ms=30.0, per_pass_guess=0.5):
    reps_long = max(12, int(extra_ms / per_pass_guess) + 4)

    def mk(K):
        @jax.jit
        def f(state):
            def body(k, st):
                return make_body(st, k)
            return jax.lax.fori_loop(0, K, body, state)
        return f

    return mk, reps_long


def run_step2(Br, C):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (Br, C), jnp.float32)
    r = jax.random.normal(jax.random.fold_in(key, 1), (Br, C), jnp.float32)
    p = jax.random.normal(jax.random.fold_in(key, 2), (Br, C), jnp.float32)
    coef = jnp.ones((6,), jnp.float32) * 1e-3
    kw = dict(offsets=OFFS, values=VALS)
    n = Br * C

    def body(st, k):
        xx, rr, pp = st
        xo, ro, po, g = s2.grid2d_cg_step2(xx, rr, pp, coef, **kw)
        return (xo, ro * (1.0 + 1e-9 * k), po)

    def mk(K):
        @jax.jit
        def f(state, seed):
            def b2_(k, st):
                out = body(st, k)
                return (out[0], out[1] * (1.0 + 1e-12 * seed), out[2])
            fin = jax.lax.fori_loop(0, K, b2_, state)
            # SMALL output: the relay fetches whole result buffers on any
            # host read (~7 s for a 256 MB leaf), which buries marginal
            # differences
            return sum(jnp.sum(a[:1, :8]) for a in fin)
        return f

    f1, f2 = mk(4), mk(84)
    st = (x, r, p)
    # UNIQUE seed per call: the dispatch relay serves repeated
    # (executable, args) pairs from cache without executing
    ctr = [0]

    def call(k):
        ctr[0] += 1
        return (f1 if k == 4 else f2)(st, jnp.float32(ctr[0]))

    jax.block_until_ready(call(4)), jax.block_until_ready(call(84))
    per = marg_verbose(call, 4, 84)
    print(f"step2 ({Br}x{C}, n={n/1e6:.0f}M): {per*1e3:.3f} ms/pass "
          f"({per/n*1e12:.2f} ps/elt, {24*n/per/1e9:.0f} GB/s apparent)",
          flush=True)
    return per / n


def run_bicg(Br, C):
    key = jax.random.PRNGKey(3)
    r = jax.random.normal(key, (Br, C), jnp.float32)
    p = jax.random.normal(jax.random.fold_in(key, 1), (Br, C), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (Br, C), jnp.float32)
    x = jax.random.normal(jax.random.fold_in(key, 4), (Br, C), jnp.float32)
    rt = jax.random.normal(jax.random.fold_in(key, 5), (Br, C), jnp.float32)
    kw = dict(offsets=OFFS, values=VALS, compensated=False)
    n = Br * C

    def body(st, k):
        # rt rides the carry: a closed-over 256 MB array becomes an HLO
        # constant and overflows the compile relay (HTTP 413)
        r_, p_, v_, x_, rt_ = st
        beta = jnp.float32(1e-3) * (1 + 1e-9 * k)
        p2, v2, rtv = b2.bicg_pv(r_, p_, v_, rt_, beta, jnp.float32(1e-3),
                                 **kw)
        ts, tt = b2.bicg_st(r_, v2, jnp.float32(1e-3), **kw)
        x2, r2, rr, rtr = b2.bicg_update(
            r_, v2, x_, p2, rt_, jnp.float32(1e-3),
            (ts / tt) * jnp.float32(1e-6), **kw)
        return (r2, p2, v2, x2, rt_)

    def mk(K):
        @jax.jit
        def f(state, seed):
            def b2_(k, st):
                out = body(st, k)
                return (out[0] * (1.0 + 1e-12 * seed), out[1], out[2],
                        out[3], out[4])
            fin = jax.lax.fori_loop(0, K, b2_, state)
            return sum(jnp.sum(a[:1, :8]) for a in fin[:4])
        return f

    f1, f2 = mk(3), mk(33)
    st = (r, p, v, x, rt)
    ctr = [0]

    def call(k):
        ctr[0] += 1
        return (f1 if k == 3 else f2)(st, jnp.float32(ctr[0]))

    jax.block_until_ready(call(3)), jax.block_until_ready(call(33))
    per = marg_verbose(call, 3, 33)
    print(f"bicg trio ({Br}x{C}, n={n/1e6:.0f}M): {per*1e3:.3f} ms/iter "
          f"({60*n/per/1e9:.0f} GB/s at the 60 B/u model)", flush=True)
    return per / n


def main():
    print("--- step2 geometry A/B (same n = 67.1M) ---", flush=True)
    t_narrow = run_step2(16384, 4096)
    t_wide = run_step2(2048, 32768)
    print(f"wide/narrow per-element ratio: {t_wide/t_narrow:.3f}",
          flush=True)
    print("--- bicg geometry A/B (same n = 67.1M) ---", flush=True)
    b_narrow = run_bicg(16384, 4096)
    b_wide = run_bicg(2048, 32768)
    print(f"wide/narrow per-element ratio: {b_wide/b_narrow:.3f}",
          flush=True)


if __name__ == "__main__":
    main()
