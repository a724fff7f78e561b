"""Profile the s-step fused-CG Pallas passes in isolation on the real chip.

Separates kernel-achieved bandwidth from solve-level orchestration overhead:
times a bare fori_loop of step2 passes (6 R*C streams / 2 iters), the gram2
pass, the classic xpay_pq / update passes, and a same-traffic triad, then
prints achieved GB/s for each against the measured stream roofline.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from legionsolvers_tpu.ops.pallas import stencil2d as s2
from legionsolvers_tpu.utils.timing import (
    marginal_seconds_per_iter,
    measure_stream_bandwidth,
)

R = C = 4096
SHORT, LONG = 20, 100
OFFS = ((0, 0), (0, 1), (0, -1), (1, 0), (-1, 0))
VALS = (0.5, 0.125, 0.125, 0.125, 0.125)


def bench(name, make_body, init, nbytes):
    fns = {}
    for k in (SHORT, LONG):
        def outer(c, k=k):
            out = jax.lax.fori_loop(0, k, lambda i, c: make_body(c), c)
            return jax.tree_util.tree_reduce(
                lambda a, l: a + jnp.sum(l, dtype=jnp.float32),
                out, jnp.float32(0),
            )
        f = jax.jit(outer)
        float(f(init))
        fns[k] = f
    sec = marginal_seconds_per_iter(
        lambda k: float(fns[k](init)), SHORT, LONG
    )
    gbs = nbytes / sec / 1e9
    print(f"{name:28s} {sec*1e3:8.3f} ms/pass  {gbs:7.1f} GB/s")
    return sec


def main():
    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (R, C), dtype)
    r = jax.random.normal(jax.random.fold_in(key, 1), (R, C), dtype)
    p = jax.random.normal(jax.random.fold_in(key, 2), (R, C), dtype)
    zero_halo = jnp.zeros((8, C), dtype)
    n = R * C

    bw = measure_stream_bandwidth()
    print(f"stream roofline: {bw/1e9:.0f} GB/s")
    tr2 = s2._pick_tile_rows_step2(R, C, 4)
    trd = s2._pick_tile_rows_dual(R, C, 4)
    tr1 = s2._pick_tile_rows(R, C, 4, 4)
    print(f"tile rows: step2={tr2} dual={trd} single(update)={tr1}")

    # triad with the same traffic as one step2 pass: read 3, write 3
    def triad(c):
        a, b, d = c
        return (b + 1.0, d + 1.0, a + 1.0)
    bench("triad r3/w3 (24 B/elt)", triad, (x, r, p), 6 * 4 * n)

    # step2: read x,r,p write x,r,p + gram
    coef = jnp.ones((6,), jnp.float32) * 0.01

    def step2(c):
        xx, rr_, pp = c
        xo, ro, po, g = s2.grid2d_cg_step2(
            xx, rr_, pp, coef, offsets=OFFS, values=VALS)
        return (xo, ro, po)
    bench("step2   (24 B/elt)", step2, (x, r, p), 6 * 4 * n)

    # step2 with the REAL coefficient chain (gram -> cg2_coeffs -> coef),
    # exactly like _make_step2_cg_runner's loop body
    g0 = s2.grid2d_cg_gram2(r, p, offsets=OFFS, values=VALS)

    def step2_chain(c):
        xx, rr_, pp, g = c
        cf, rr1, _ = s2.cg2_coeffs(g)
        xo, ro, po, gn = s2.grid2d_cg_step2(
            xx, rr_, pp, cf, offsets=OFFS, values=VALS)
        return (xo, ro, po, gn)
    bench("step2+coeffs (24 B/elt)", step2_chain, (x, r, p, g0), 6 * 4 * n)

    # step2 chain with history scatter (the full runner body)
    hist0 = jnp.zeros(2 * LONG + 1, jnp.float32)

    def step2_hist(c):
        xx, rr_, pp, g, h = c
        cf, rr1, _ = s2.cg2_coeffs(g)
        xo, ro, po, gn = s2.grid2d_cg_step2(
            xx, rr_, pp, cf, offsets=OFFS, values=VALS)
        h = h.at[1].set(rr1)
        h = h.at[2].set(gn[0])
        return (xo, ro, po, gn, h)
    bench("step2+coeffs+hist", step2_hist, (x, r, p, g0, hist0), 6 * 4 * n)

    # gram2: read r,p
    def gram2(c):
        rr_, pp = c
        g = s2.grid2d_cg_gram2(rr_, pp, offsets=OFFS, values=VALS)
        return (rr_ * (1.0 + 1e-9 * g[0]), pp)
    bench("gram2   (8 B/elt)", gram2, (r, p), 2 * 4 * n)

    # xpay_pq: read r,p write p
    def xpay(c):
        rr_, pp = c
        pn, pq = s2.grid2d_cg_xpay_pq(
            rr_, pp, jnp.float32(0.1), zero_halo, zero_halo,
            zero_halo, zero_halo, offsets=OFFS, values=VALS)
        return (rr_, pn)
    bench("xpay_pq (12 B/elt)", xpay, (r, p), 3 * 4 * n)

    # update: read p,x,r write x,r
    def update(c):
        pp, xx, rr_ = c
        xo, ro, rr2 = s2.grid2d_cg_update(
            pp, xx, rr_, jnp.float32(0.001), zero_halo, zero_halo,
            offsets=OFFS, values=VALS)
        return (pp, xo, ro)
    bench("update  (20 B/elt)", update, (p, x, r), 5 * 4 * n)

    # plain matvec y = A x
    def mv(c):
        (xx,) = c
        y = s2.grid2d_stencil_matvec(
            xx, zero_halo, zero_halo, offsets=OFFS, values=VALS)
        return (y,)
    bench("matvec  (8 B/elt)", mv, (x,), 2 * 4 * n)


if __name__ == "__main__":
    main()
