"""Measure the VPU's sustained elementwise op rate (the compute roofline).

The s-step CG pass is VPU-bound, not HBM-bound (scripts/profile_sstep.py:
step2 streams at 438 GB/s while a same-traffic triad hits 652 GB/s), so
"fraction of the streaming roofline" under-promises what the kernel can
achieve.  This probe calibrates the other axis: a Pallas kernel that keeps
one tile VMEM-resident and loops a chain of fused multiply-adds (and,
separately, lane rolls) with no HBM traffic per repetition, giving ops/s
numbers that utils/roofline.py's op-count model converts into a compute
speed-of-light for any stencil schedule.

Usage: python scripts/probe_vpu.py          # prints JSON {vpu_*_ops_per_s}
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from legionsolvers_tpu.utils.timing import marginal_seconds_per_iter

TR, C = 256, 4096     # 4 MB tile: VMEM-resident, far above VPU latency
SHORT, LONG = 64, 512  # chain lengths (reps inside the kernel)


@functools.partial(jax.jit, static_argnames=("reps", "kind", "interpret"))
def _chain_kernel(x, *, reps: int, kind: str, interpret: bool = False):
    """y = f^reps(x) with f a 2-op multiply-add ('fma'), a 1-lane roll +
    add ('roll'), or a sublane-shifted add via static slices ('row')."""

    def kernel(x_ref, y_ref):
        v = x_ref[:, :]
        for k in range(reps):
            if kind == "fma":
                v = v * 1.000001 + 0.25
            elif kind == "roll":
                v = v + pltpu.roll(v, 1, 1)
            else:  # row: sublane shift via slice of a concatenated pair
                w = jax.lax.slice(
                    jnp.concatenate([v, v], 0), (1, 0), (TR + 1, C)
                )
                v = v + w
        y_ref[:, :] = v

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TR, C), x.dtype),
        interpret=interpret,
    )(x)


def measure(kind: str, ops_per_rep: float) -> float:
    x = jax.random.normal(jax.random.PRNGKey(0), (TR, C), jnp.float32)
    fns = {}
    for reps in (SHORT, LONG):
        f = lambda x, reps=reps: _chain_kernel(x, reps=reps, kind=kind)
        jax.block_until_ready(f(x))
        fns[reps] = f
    sec = marginal_seconds_per_iter(
        lambda k: fns[k](x), SHORT, LONG
    )
    return ops_per_rep * TR * C / sec


def main() -> None:
    out = {}
    # fma: 2 flops/elt/rep (the VPU fuses mul+add); this is the rate the
    # roofline model charges generic arithmetic at (1 "op" = 1 VPU lane
    # operation, fma counted as 2)
    out["vpu_fma_ops_per_s"] = measure("fma", 2.0)
    # roll: 1 lane rotation + 1 add per rep; charge the rotation by
    # subtracting the add at the fma rate
    roll_total = measure("roll", 1.0)  # reps/s basis: 1 unit per rep
    out["vpu_roll_plus_add_reps_per_s"] = roll_total
    out["vpu_row_shift_add_reps_per_s"] = measure("row", 1.0)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
