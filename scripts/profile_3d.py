"""Isolate the 3-D plane-streaming Pallas passes on chip (round-4 item:
the 27-pt cells were the matrix's worst — 42-48% of stream — with no
profile; this is profile_sstep.py's method applied to the grid3d family).

Per pass: marginal ms and achieved GB/s against the pass's traffic model,
plus a same-traffic triad so compute-bound vs DMA-bound separates exactly
like the 2-D diagnosis (PROFILE_r03.md).  Runs both the 7-pt and 27-pt
stencils.

Usage: python scripts/profile_3d.py [nx ny nz]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from legionsolvers_tpu.ops.pallas import stencil3d as s3
from legionsolvers_tpu.problems.stencil import laplacian_stencil
from legionsolvers_tpu.utils.timing import (
    marginal_seconds_per_iter,
    measure_stream_bandwidth,
)

SHORT, LONG = 20, 100
INTERP = False  # set True (or run on CPU smoke) for interpret mode


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
    print(f"{name:34s} {sec*1e3:8.3f} ms/pass  {gbs:7.1f} GB/s", flush=True)
    return sec


def profile(shape, dim_label):
    X, Y, Z = shape
    n = X * Y * Z
    offs = [(tuple(o), float(v)) for o, v in laplacian_stencil(dim_label)]
    OFFS = tuple(o for o, _ in offs)
    VALS = tuple(v for _, v in offs)
    print(f"\n== {dim_label}-pt family at {X}x{Y}x{Z} (n={n}) ==", flush=True)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape, jnp.float32)
    r = jax.random.normal(jax.random.fold_in(key, 1), shape, jnp.float32)
    p = jax.random.normal(jax.random.fold_in(key, 2), shape, jnp.float32)
    zplane = jnp.zeros((Y, Z), jnp.float32)

    # triad with matvec's traffic: read 1 write 1
    def triad2(c):
        (a,) = c
        return (a + 1.0,)
    bench("triad r1/w1 (8 B/elt)", triad2, (x,), 2 * 4 * n)

    def mv(c):
        (xx,) = c
        y = s3.grid3d_stencil_matvec(
            xx, zplane, zplane, offsets=OFFS, values=VALS, interpret=INTERP)
        return (y,)
    bench("matvec (8 B/elt)", mv, (x,), 2 * 4 * n)

    # xpay_pq: read r,p write p (dual stream)
    def xpay(c):
        rr_, pp = c
        pn, pq = s3.grid3d_cg_xpay_pq(
            rr_, pp, jnp.float32(0.1), zplane, zplane,
            offsets=OFFS, values=VALS, interpret=INTERP)
        return (rr_, pn)
    bench("xpay_pq (12 B/elt)", xpay, (r, p), 3 * 4 * n)

    def triad3(c):
        a, b = c
        return (b + 1.0, a * 0.5 + b)
    bench("triad r2/w1 (12 B/elt)", triad3, (r, p), 3 * 4 * n)

    # update: read p,x,r write x,r
    def update(c):
        pp, xx, rr_ = c
        xo, ro, rr2 = s3.grid3d_cg_update(
            pp, xx, rr_, jnp.float32(0.001), zplane, zplane,
            offsets=OFFS, values=VALS, interpret=INTERP)
        return (pp, xo, ro)
    bench("update (20 B/elt)", update, (p, x, r), 5 * 4 * n)

    # fused BiCGStab passes (the 48%-of-stream cells)
    try:
        from legionsolvers_tpu.ops.pallas import bicgstab3d as b3

        if b3.supports3d_bicgstab(Y, Z, OFFS):
            rt = jax.random.normal(jax.random.fold_in(key, 3), shape,
                                   jnp.float32)
            v = jax.random.normal(jax.random.fold_in(key, 4), shape,
                                  jnp.float32)

            def pv(c):
                rr_, pp, vv = c
                pn, vn, rtv = b3.bicg3d_pv(
                    rr_, pp, vv, rt, jnp.float32(0.3), jnp.float32(1.1),
                    zplane, zplane, offsets=OFFS, values=VALS, interpret=INTERP)
                return (rr_, pn, vn)
            bench("bicg pv (24 B/elt)", pv, (r, p, v), 6 * 4 * n)

            def st(c):
                rr_, vv = c
                ts, tt = b3.bicg3d_st(
                    rr_, vv, jnp.float32(0.8), zplane, zplane,
                    offsets=OFFS, values=VALS, interpret=INTERP)
                return (rr_ * (1.0 + 1e-12 * ts), vv)
            bench("bicg st (8 B/elt)", st, (r, v), 2 * 4 * n)

            def upd(c):
                rr_, vv, xx, pp = c
                xo, ro, rr2, rtr = b3.bicg3d_update(
                    rr_, vv, xx, pp, rt, jnp.float32(0.8), jnp.float32(0.4),
                    zplane, zplane, offsets=OFFS, values=VALS, interpret=INTERP)
                return (ro, vv, xo, pp)
            bench("bicg update (28 B/elt)", upd, (r, v, x, p), 7 * 4 * n)
    except Exception as e:
        print(f"[3d] bicgstab passes skipped: {e}", flush=True)


def main():
    bw = measure_stream_bandwidth()
    print(f"stream roofline: {bw/1e9:.0f} GB/s", flush=True)
    shape = (256, 256, 256)
    if len(sys.argv) == 4:
        shape = tuple(int(a) for a in sys.argv[1:4])
    profile(shape, 3)   # 7-pt
    profile(shape, 4)   # 27-pt


if __name__ == "__main__":
    main()
