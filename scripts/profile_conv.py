"""Microbench stencil-as-convolution and fused whole-CG-iteration variants."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from profile_kernel import bench, R, C, OFFS, VALS

KER = np.zeros((3, 3), np.float32)
for (dy, dx), v in zip(OFFS, VALS):
    KER[1 + dy, 1 + dx] = v
KER_J = jnp.asarray(KER)


def conv_stencil(xx):
    return jax.lax.conv_general_dilated(
        xx[None, None], KER_J[None, None], (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]


def main():
    x = jax.random.uniform(jax.random.PRNGKey(0), (R, C), jnp.float32)

    bench("conv stencil", conv_stencil, x, 8)

    def conv_dot(c):
        xx, acc = c
        y = conv_stencil(xx)
        return y, acc + jnp.sum(xx * y, dtype=jnp.float32)

    bench("conv stencil +dot", conv_dot, (x, jnp.float32(0)), 8)

    def conv_full_cg(c):
        xx, r, p, rr = c
        q = conv_stencil(p)
        pq = jnp.sum(p * q, dtype=jnp.float32)
        alpha = rr / pq
        xx = xx + alpha * p
        r = r - alpha * q
        rr_new = jnp.sum(r * r, dtype=jnp.float32)
        p = r + (rr_new / rr) * p
        return xx, r, p, rr_new

    bench("conv full CG iter", conv_full_cg,
          (x, x * 0.5, x * 0.25, jnp.float32(1)), 48)

    # the BLAS tail alone (no matvec): what does XLA achieve?
    def tail(c):
        xx, r, p, q, rr = c
        alpha = rr * jnp.float32(0.01)
        xx = xx + alpha * p
        r = r - alpha * q
        rr_new = jnp.sum(r * r, dtype=jnp.float32)
        p = r + (rr_new / (rr + 1)) * p
        return xx, r, p, q, rr_new

    bench("blas tail (2 axpy + dot + xpay)", tail,
          (x, x * 0.5, x * 0.25, x * 0.125, jnp.float32(1)), 40)


if __name__ == "__main__":
    main()
