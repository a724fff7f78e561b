"""Microbench the 2-D stencil Pallas kernel against jnp alternatives.

Every timed loop is forced to produce a scalar that depends on the full
result (the dispatch relay can otherwise ack array outputs lazily and the
marginal measurement reads ~0).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from legionsolvers_tpu.utils.timing import marginal_seconds_per_iter

R = C = 4096
SHORT, LONG = 50, 250
OFFS = ((0, 0), (0, 1), (0, -1), (1, 0), (-1, 0))
VALS = (0.5, 0.125, 0.125, 0.125, 0.125)  # row sums 1: stable iterates


def bench(name, body, init, bpe):
    """body: carry -> carry (carry may be any pytree); the final carry is
    reduced to one scalar inside the jit so the measurement forces full
    execution."""
    fns = {}
    for k in (SHORT, LONG):
        def outer(c, k=k):
            out = jax.lax.fori_loop(0, k, lambda i, c: body(c), c)
            return jax.tree_util.tree_reduce(
                lambda a, l: a + jnp.sum(l, dtype=jnp.float32),
                out, jnp.float32(0),
            )
        f = jax.jit(outer)
        float(f(init))  # compile + warm
        fns[k] = f
    s = marginal_seconds_per_iter(lambda k: fns[k](init), SHORT, LONG)
    gbs = bpe * R * C / s / 1e9
    print(f"[kbench] {name}: {s*1e3:.3f} ms  ({gbs:.0f} GB/s @ {bpe} B/elt)",
          flush=True)
    return s


def main():
    from legionsolvers_tpu.ops.pallas.stencil2d import grid2d_stencil_matvec

    x = jax.random.uniform(jax.random.PRNGKey(0), (R, C), jnp.float32)
    top = jnp.zeros((8, C), jnp.float32)
    bot = jnp.zeros((8, C), jnp.float32)

    def pallas_body(tr, with_dot):
        def body(c):
            xx = c[0] if with_dot else c
            out = grid2d_stencil_matvec(
                xx, top, bot, offsets=OFFS, values=VALS,
                tile_rows=tr, with_dot=with_dot)
            if with_dot:
                return out[0], c[1] + out[1]
            return out
        return body

    for tr in (64, 128):
        try:
            bench(f"pallas tr={tr} nodot", pallas_body(tr, False), x, 8)
        except Exception as e:
            print(f"[kbench] pallas tr={tr} nodot: FAIL {type(e).__name__}")
    for tr in (64, 128):
        try:
            bench(f"pallas tr={tr} +dot",
                  pallas_body(tr, True), (x, jnp.float32(0)), 8)
        except Exception as e:
            print(f"[kbench] pallas tr={tr} +dot: FAIL {type(e).__name__}")

    # plain XLA: pad + 5 shifted slices
    def jnp_stencil(xx):
        p = jnp.pad(xx, 1)
        y = None
        for (dy, dx), v in zip(OFFS, VALS):
            t = v * jax.lax.slice(p, (1 + dy, 1 + dx), (1 + dy + R, 1 + dx + C))
            y = t if y is None else y + t
        return y

    bench("jnp pad+slices", jnp_stencil, x, 8)

    def jnp_stencil_dot(c):
        xx, acc = c
        y = jnp_stencil(xx)
        return y, acc + jnp.sum(xx * y, dtype=jnp.float32)

    bench("jnp pad+slices +dot", jnp_stencil_dot, (x, jnp.float32(0)), 8)

    # full CG-shaped iteration, pure jnp (what XLA alone can fuse)
    def jnp_full_cg(c):
        xx, r, p, rr = c
        q = jnp_stencil(p)
        pq = jnp.sum(p * q, dtype=jnp.float32)
        alpha = rr / pq
        xx = xx + alpha * p
        r = r - alpha * q
        rr_new = jnp.sum(r * r, dtype=jnp.float32)
        p = r + (rr_new / rr) * p
        return xx, r, p, rr_new

    bench("jnp full CG iter", jnp_full_cg,
          (x, x * 0.5, x * 0.25, jnp.float32(1)), 48)


if __name__ == "__main__":
    main()
