"""Quick A/B harness for step2/gram2 kernel variants on the real chip.

Times one step2 pass (the whole s-step CG iteration pair) and one gram2
pass at selectable tile_rows, against the same-traffic triad, using the
marginal harness of scripts/profile_sstep.py.  Used to drive the VPU-bound
optimization of the s-step kernel (profile finding r3: step2 438 GB/s vs
triad 652 GB/s at 24 B/elt).

Usage: python scripts/exp_step2.py [tile_rows ...]   (default: 0 64 128)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from legionsolvers_tpu.ops.pallas import stencil2d as s2
from legionsolvers_tpu.utils.timing import (
    marginal_seconds_per_iter,
    measure_stream_bandwidth,
)

R = C = 4096
SHORT, LONG = 20, 100
OFFS = ((0, 0), (0, 1), (0, -1), (1, 0), (-1, 0))
VALS = (4.0, -1.0, -1.0, -1.0, -1.0)


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
    print(f"{name:34s} {sec*1e3:8.3f} ms/pass  {nbytes/sec/1e9:7.1f} GB/s",
          flush=True)
    return sec


def main():
    trs = [int(a) for a in sys.argv[1:]] or [0, 64, 128]
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (R, C), jnp.float32)
    r = jax.random.normal(jax.random.fold_in(key, 1), (R, C), jnp.float32)
    p = jax.random.normal(jax.random.fold_in(key, 2), (R, C), jnp.float32)
    n = R * C

    bw = measure_stream_bandwidth()
    print(f"stream roofline: {bw/1e9:.0f} GB/s")

    def triad(c):
        a, b, d = c
        return (b + 1.0, d + 1.0, a + 1.0)
    bench("triad r3/w3 (24 B/elt)", triad, (x, r, p), 6 * 4 * n)

    for tr in trs:
        kw = dict(offsets=OFFS, values=VALS, tile_rows=tr)
        g0 = s2.grid2d_cg_gram2(r, p, **kw)
        hist0 = jnp.zeros(2 * LONG + 1, jnp.float32)

        def step2_hist(c, kw=kw):
            xx, rr_, pp, g, h = c
            cf, rr1, _ = s2.cg2_coeffs(g)
            xo, ro, po, gn = s2.grid2d_cg_step2(xx, rr_, pp, cf, **kw)
            h = h.at[1].set(rr1).at[2].set(gn[0])
            return (xo, ro, po, gn, h)
        try:
            bench(f"step2+coeffs+hist tr={tr or 'auto'}", step2_hist,
                  (x, r, p, g0, hist0), 6 * 4 * n)
        except Exception as e:
            print(f"step2 tr={tr}: {type(e).__name__}: {str(e)[:150]}")

        def gram2(c, kw=kw):
            rr_, pp = c
            g = s2.grid2d_cg_gram2(rr_, pp, **kw)
            return (rr_ * (1.0 + 1e-9 * g[0]), pp)
        try:
            bench(f"gram2 tr={tr or 'auto'} (8 B/elt)", gram2, (r, p),
                  2 * 4 * n)
        except Exception as e:
            print(f"gram2 tr={tr}: {type(e).__name__}: {str(e)[:150]}")


if __name__ == "__main__":
    main()
