"""Microbench the 2-D stencil Pallas kernel against jnp alternatives."""

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
VALS = (2.0, -0.5, -0.5, -0.5, -0.5)  # spectral radius < 1: no overflow


def bench(name, body, init, bpe):
    fns = {}
    for k in (SHORT, LONG):
        f = jax.jit(lambda c, k=k: jax.lax.fori_loop(0, k, body, c))
        jax.block_until_ready(f(init))
        fns[k] = f
    s = marginal_seconds_per_iter(lambda k: fns[k](init), SHORT, LONG)
    gbs = bpe * R * C / s / 1e9
    print(f"[kbench] {name}: {s*1e3:.3f} ms  ({gbs:.0f} GB/s @ {bpe} B/elt)")


def main():
    from legionsolvers_tpu.ops.pallas.stencil2d import grid2d_stencil_matvec

    x = jax.random.uniform(jax.random.PRNGKey(0), (R, C), jnp.float32)
    top = jnp.zeros((8, C), jnp.float32)
    bot = jnp.zeros((8, C), jnp.float32)

    def pallas_body(tr, with_dot):
        def body(i, c):
            if with_dot:
                xx, acc = c
                y, d = grid2d_stencil_matvec(
                    xx, top, bot, offsets=OFFS, values=VALS,
                    tile_rows=tr, with_dot=True)
                return y, acc + d
            return grid2d_stencil_matvec(
                c, top, bot, offsets=OFFS, values=VALS, tile_rows=tr)
        return body

    for tr in (128, 256, 512):
        if R % tr:
            continue
        try:
            bench(f"pallas tr={tr} nodot", pallas_body(tr, False), x, 8)
        except Exception as e:
            print(f"[kbench] pallas tr={tr} nodot: FAIL {type(e).__name__}: {e}")
    for tr in (128, 256):
        try:
            bench(f"pallas tr={tr} +dot",
                  pallas_body(tr, True), (x, jnp.float32(0)), 8)
        except Exception as e:
            print(f"[kbench] pallas tr={tr} +dot: FAIL {type(e).__name__}: {e}")

    # plain XLA: pad + 5 shifted slices
    def jnp_stencil(i, xx):
        p = jnp.pad(xx, 1)
        y = None
        for (dy, dx), v in zip(OFFS, VALS):
            t = v * jax.lax.slice(p, (1 + dy, 1 + dx), (1 + dy + R, 1 + dx + C))
            y = t if y is None else y + t
        return y

    bench("jnp pad+slices", jnp_stencil, x, 8)

    def jnp_stencil_dot(i, c):
        xx, acc = c
        y = jnp_stencil(i, xx)
        return y, acc + jnp.sum(xx * y, dtype=jnp.float32)

    bench("jnp pad+slices +dot", jnp_stencil_dot, (x, jnp.float32(0)), 8)

    # roll-based (no pad materialization)
    def jnp_roll(i, xx):
        y = None
        for (dy, dx), v in zip(OFFS, VALS):
            t = v * jnp.roll(xx, (-dy, -dx), (0, 1))
            y = t if y is None else y + t
        return y

    bench("jnp rolls (no mask)", jnp_roll, x, 8)


if __name__ == "__main__":
    main()
