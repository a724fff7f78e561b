"""GMRES(10) cycle profile: matvec vs CGS2 sweeps vs basis bookkeeping.

r4 verdict weak #7: GMRES was the only solver family without a
kernel-level profile, and its traffic model was known conservative, so the
real roofline fraction was unknown.  The AOT cost analysis reports 1830
B/unknown for the fused CGS2 cycle vs the 1264 model — suspect: the
``V.at[j + 1].set`` dynamic-update-slices of the stacked (m+1, n) basis.

Variants timed at n = 16.7M (4096 x 4096, 5-pt):

  full     the production CGS2 cycle;
  cgs1     single projection pass (numerics ablation, timing only):
           isolates the cost of the second sweep pair;
  nomatvec matvec replaced by a scalar multiply: isolates the 11 matvecs;
  vlist    basis as a TUPLE of arrays (no stacked DUS); projections via
           per-vector dots, updates via a fused sum — the keep/revert
           optimization attempt (trades the MXU-batched sweep for
           copy-free bookkeeping).

Usage: python scripts/profile_gmres.py   (TPU)
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from legionsolvers_tpu import (
    BlockPartition,
    SolverOptions,
    StencilOperator,
    laplacian_stencil,
)
from legionsolvers_tpu.utils.timing import marginal_seconds_per_iter

N = 4096
M = 10
HI = jax.lax.Precision.HIGHEST


def make_cycle(op, variant):
    def matvec(v):
        if variant == "nomatvec":
            return v * 1.0001
        return op.matvec(v)

    if variant == "vlist":
        def cycle(x, b, seed):
            r = b - matvec(x)
            nd = r.ndim
            beta2 = jnp.tensordot(r, r, axes=nd, precision=HI)
            inv = jnp.where(beta2 > 0, jax.lax.rsqrt(beta2), 0.0)
            V = [r * inv * (1.0 + 1e-12 * seed)]
            hs = []
            for j in range(M):
                w = matvec(V[j])
                for _ in range(2):  # CGS2, per-vector dots
                    h = [jnp.tensordot(V[k], w, axes=nd, precision=HI)
                         for k in range(j + 1)]
                    w = w - sum(h[k] * V[k] for k in range(j + 1))
                d = jnp.tensordot(w, w, axes=nd, precision=HI)
                scale = jnp.where(d > 0, jax.lax.rsqrt(d), 0.0)
                V.append(w * scale)
                hs.append(d)
            x = x + sum(1e-3 * V[j] for j in range(M))
            return x, beta2 + sum(hs)
        return cycle

    def cycle(x, b, seed):
        r = b - matvec(x)
        nd = r.ndim
        beta2 = jnp.tensordot(r, r, axes=nd, precision=HI)
        inv = jnp.where(beta2 > 0, jax.lax.rsqrt(beta2), 0.0)
        V = jnp.zeros((M + 1,) + r.shape, r.dtype)
        V = V.at[0].set(r * inv * (1.0 + 1e-12 * seed))
        acc = beta2
        for j in range(M):
            w = matvec(V[j])
            sweeps = 1 if variant == "cgs1" else 2
            for _ in range(sweeps):
                h = jnp.tensordot(V[: j + 1], w, axes=nd, precision=HI)
                w = w - jnp.tensordot(h, V[: j + 1], axes=1, precision=HI)
            d = jnp.tensordot(w, w, axes=nd, precision=HI)
            scale = jnp.where(d > 0, jax.lax.rsqrt(d), 0.0)
            V = V.at[j + 1].set(w * scale)
            acc = acc + d
        x = x + 1e-3 * jnp.tensordot(jnp.ones(M, r.dtype), V[:M], axes=1,
                                     precision=HI)
        return x, acc
    return cycle


def bench(op, variant):
    cycle = make_cycle(op, variant)

    def mk(K):
        @jax.jit
        def f(x, b, seed):
            def body(i, carry):
                x, acc = carry
                x, a = cycle(x, b, seed + i)
                return x, acc + a
            x, acc = jax.lax.fori_loop(0, K, body,
                                       (x, jnp.float32(0)))
            return jnp.sum(x[:1, :8]) + acc
        return f

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, N), jnp.float32)
    b = jax.random.normal(jax.random.fold_in(key, 1), (N, N), jnp.float32)
    f1, f2 = mk(1), mk(7)
    ctr = [0]

    def call(k):
        ctr[0] += 1
        return (f1 if k == 1 else f2)(x, b, jnp.float32(ctr[0]))

    jax.block_until_ready(call(1))
    jax.block_until_ready(call(7))
    per = marginal_seconds_per_iter(call, 1, 7)
    print(f"{variant:9s}: {per*1e3:7.2f} ms/cycle", flush=True)
    return per


def main():
    opt = SolverOptions(entry_dtype=jnp.float32)
    part = BlockPartition(N * N, 1)
    op = StencilOperator((N, N), laplacian_stencil(2), partition=part,
                         options=opt)
    full = bench(op, "full")
    cgs1 = bench(op, "cgs1")
    nomv = bench(op, "nomatvec")
    vlist = bench(op, "vlist")
    print(f"second-sweep pair: {1e3*(full-cgs1):.2f} ms; "
          f"matvecs: {1e3*(full-nomv):.2f} ms; "
          f"vlist delta: {1e3*(vlist-full):+.2f} ms", flush=True)


if __name__ == "__main__":
    main()
