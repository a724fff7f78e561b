"""VPU op-rate probe: calibrates the compute roofline of utils/roofline.py.

The s-step CG pass is VPU-bound (PROFILE_r03.md), so the binding
speed-of-light is ``max(stream_time, compute_time)``.  The compute side
needs the VPU's sustained rates for the three op classes the kernel uses —
plain arithmetic (fma chain), lane rolls, and sublane row shifts — measured
by Pallas kernels that keep one tile VMEM-resident and loop the op chain
with no HBM traffic per repetition.  Rates are hardware properties;
``load_or_measure`` caches them in VPU_RATES.json at the repo root so
benchmark runs don't re-pay the probe compiles.
"""

from __future__ import annotations

import functools
import json
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TR, C = 256, 1024      # 1 MB tile: VMEM-resident (roll/concat temporaries
                       # of a 4 MB tile blew the Mosaic stack), far above
                       # VPU latency
# chain lengths (fori_loop trips inside the kernel; each trip = UNROLL
# ops per chain): the marginal work must dwarf the dispatch relay's ~ms
# noise floor — the differential is ~230 Gops ~ 100+ ms of pure VPU work
SHORT, LONG = 8192, 65536


ILP = 8     # independent chains per rep: enough to cover the VPU's fma
            # latency (a serial chain measures LATENCY; ILP=4 still
            # under-reported the sustained rate ~2x vs the real kernels)
UNROLL = 8  # ops per chain per loop iteration: amortizes the fori_loop
            # counter/branch overhead that otherwise caps the measured rate


@functools.partial(jax.jit, static_argnames=("reps", "kind", "interpret"))
def _chain_kernel(x, *, reps: int, kind: str, interpret: bool = False):
    """f^reps over ILP independent tiles (in-kernel fori_loop; a fully
    unrolled chain made Mosaic compile for minutes through the relay)."""

    def kernel(x_ref, y_ref):
        def one(v, j):
            if kind == "fma":
                return v * 1.000001 + (0.25 + 0.01 * j)
            if kind == "roll":
                return 0.5 * v + pltpu.roll(v, 1, 1)
            # row: sublane shift via slice of a concatenated pair
            w = jax.lax.slice(
                jnp.concatenate([v, v], 0), (1, 0), (TR + 1, C)
            )
            return 0.5 * v + w

        def body(_, vs):
            for _u in range(UNROLL):
                vs = tuple(one(v, j) for j, v in enumerate(vs))
            return vs

        x0 = x_ref[:, :]
        vs = tuple(x0 + float(j) for j in range(ILP))
        vs = jax.lax.fori_loop(0, reps, body, vs)
        acc = vs[0]
        for v in vs[1:]:
            acc = acc + v
        y_ref[:, :] = acc

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TR, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20,
        ),
        interpret=interpret,
    )(x)


def _measure(kind: str) -> float:
    """Element-ops/s for one op-class (ILP independent ops per rep)."""
    from .timing import marginal_seconds_per_iter

    x = jax.random.normal(jax.random.PRNGKey(0), (TR, C), jnp.float32)
    fns = {}
    for reps in (SHORT, LONG):
        f = lambda x, reps=reps: _chain_kernel(x, reps=reps, kind=kind)
        jax.block_until_ready(f(x))
        fns[reps] = f
    sec = marginal_seconds_per_iter(lambda k: fns[k](x), SHORT, LONG)
    return UNROLL * ILP * TR * C / sec


def measure_rates() -> dict:
    """{"vpu_fma_ops_per_s": flops/s of an fma chain (2 flops/rep),
    "vpu_roll_plus_add_reps_per_s", "vpu_row_shift_add_reps_per_s"}."""
    rates = {
        "vpu_fma_ops_per_s": 2.0 * _measure("fma"),
        "vpu_roll_plus_add_reps_per_s": _measure("roll"),
        "vpu_row_shift_add_reps_per_s": _measure("row"),
    }
    if not rates_sane(rates):
        raise RuntimeError(f"implausible VPU probe rates: {rates}")
    return rates


def rates_sane(rates: dict) -> bool:
    """Plausibility window for a single TPU core (v4/v5/v6 generations):
    rejects noise-floor artifacts like the 2.6e17 'rate' a collapsed
    marginal once produced."""
    try:
        return (
            2e11 <= rates["vpu_fma_ops_per_s"] <= 5e13
            and 1e10 <= rates["vpu_roll_plus_add_reps_per_s"] <= 2e13
            and 1e10 <= rates["vpu_row_shift_add_reps_per_s"] <= 2e13
        )
    except (KeyError, TypeError):
        return False


def load_or_measure(path: str | None = None) -> dict:
    """Read cached rates (VPU_RATES.json) or measure and cache them.
    Returns None off-TPU (no meaningful VPU to probe)."""
    if jax.default_backend() != "tpu":
        return None
    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), "VPU_RATES.json")
    if os.path.exists(path):
        with open(path) as f:
            cached = json.load(f)
        if rates_sane(cached):
            return cached
        os.remove(path)  # poisoned cache (e.g. noise-floor artifact)
    try:
        rates = measure_rates()
    except Exception:
        # never let the calibration probe kill a benchmark run: callers
        # fall back to the stream-only roofline
        return None
    try:
        with open(path, "w") as f:
            json.dump(rates, f, indent=1)
    except OSError:
        pass
    return rates
