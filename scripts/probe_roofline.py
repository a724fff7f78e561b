"""Validate the HBM streaming roofline on the attached chip (VERDICT r1 #1).

Three independent probes, all marginal-timed (fixed dispatch latency cancels):

1. jnp triad, arrays >> VMEM (n = 2**26, 256 MB each): the carry cannot be
   kept VMEM-resident, so per-iteration traffic is genuinely 3 arrays.
2. jnp triad at the OLD size (n = 2**24, 64 MB): reproduces the round-1
   over-report (the 64 MB carry fits in v5e's 128 MB VMEM and XLA keeps it
   resident, streaming only one array -> ~3x inflation).
3. Pallas HBM->HBM copy kernel with explicit double-buffered DMA: the
   cleanest possible speed-of-light for read+write streaming.

v5e datasheet HBM bandwidth: 819 GB/s.
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from legionsolvers_tpu.utils.timing import marginal_seconds_per_iter


def triad_bw(n: int, k0: int = 20, k1: int = 100) -> float:
    x = jax.random.uniform(jax.random.PRNGKey(0), (n,), jnp.float32)
    y = jax.random.uniform(jax.random.PRNGKey(1), (n,), jnp.float32)

    def make(k):
        @jax.jit
        def chain(x, y):
            def body(i, r):
                c = (0.5 + 1e-6 * i).astype(jnp.float32)
                return c * r + 0.001 * y
            return jnp.sum(jax.lax.fori_loop(0, k, body, x))
        return chain

    f0, f1 = make(k0), make(k1)
    float(f0(x, y)), float(f1(x, y))
    per_iter = marginal_seconds_per_iter(
        lambda k: (f0 if k == k0 else f1)(x, y), k0, k1
    )
    return 3 * 4 * n / per_iter


def pallas_copy_bw(rows: int = 16384, cols: int = 4096,
                   k0: int = 20, k1: int = 100) -> float:
    """HBM->HBM tile-streamed copy (read + write = 8 B/elt)."""
    TR = 512

    def kernel(x_hbm, o_hbm, win, sems):
        nt = rows // TR
        i = pl.program_id(0)

        def issue(j):
            slot = jnp.asarray(j, jnp.int32) % 2
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(pl.multiple_of(j * TR, 8), TR), :],
                win.at[slot], sems.at[slot],
            ).start()

        @pl.when(i == 0)
        def _():
            issue(0)

        @pl.when(i + 1 < nt)
        def _():
            issue(i + 1)

        slot = jnp.asarray(i, jnp.int32) % 2
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(0, TR), :], win.at[slot], sems.at[slot]
        ).wait()
        o_hbm[:, :] = win[slot] + 1.0

    copy = pl.pallas_call(
        kernel,
        grid=(rows // TR,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((TR, cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, TR, cols), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )

    x = jax.random.uniform(jax.random.PRNGKey(0), (rows, cols), jnp.float32)

    def make(k):
        @jax.jit
        def loop(x):
            def body(i, a):
                return copy(a)
            return jnp.sum(jax.lax.fori_loop(0, k, body, x))
        return loop

    f0, f1 = make(k0), make(k1)
    float(f0(x)), float(f1(x))
    per_iter = marginal_seconds_per_iter(
        lambda k: (f0 if k == k0 else f1)(x), k0, k1
    )
    return 2 * 4 * rows * cols / per_iter


def main():
    print(f"[probe] device: {jax.devices()[0].device_kind}", flush=True)
    bw = triad_bw(1 << 26)
    print(f"[probe] jnp triad n=2^26 (256MB arrays): {bw/1e9:.0f} GB/s",
          flush=True)
    bw_old = triad_bw(1 << 24)
    print(f"[probe] jnp triad n=2^24 (64MB arrays, old probe): "
          f"{bw_old/1e9:.0f} GB/s", flush=True)
    bw_copy = pallas_copy_bw()
    print(f"[probe] pallas HBM copy (256MB): {bw_copy/1e9:.0f} GB/s",
          flush=True)


if __name__ == "__main__":
    main()
