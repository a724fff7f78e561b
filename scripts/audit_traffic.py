"""Validate the roofline traffic models against the TPU compiler's own
accounting (VERDICT r2 weak #7: the 100 B/unknown BiCGStab model "assumes
XLA fuses adjacent axpy/xpay pairs" — assumptions never checked).

Method: AOT-compile ONE solver iteration as a pure state -> state function
for a device-less v5e topology (no chips needed, same compiler/fusion
pipeline as the real runs) and read ``compiled.cost_analysis()['bytes
accessed']``; subtract the bytes of an identity function over the same
state (parameter/output pass-through noise), divide by n * itemsize, and
compare against utils/roofline.py's pass counts.  Pallas kernels report
their own cost estimates (already validated empirically against the
streaming roofline by scripts/profile_sstep.py), so the audit's value is
the XLA-fused jnp schedule around them.

Caveat: a single-iteration compile can't see cross-iteration fusion the
while-loop body enjoys (e.g. the rho dot folding into the previous r
update), so the audited count is an UPPER bound on the in-loop traffic;
model <= audit <= model + a few passes is a pass.

Writes TRAFFIC_AUDIT.md.  Usage: python scripts/audit_traffic.py [out.md]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

N_GRID = 1024  # n ~ 1M: big enough that per-pass bytes dominate scalars


def _topology_sharding():
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    topo = topologies.get_topology_desc(
        platform="tpu", topology_name="v5e:2x2",
        chips_per_host_bounds=(2, 2, 1), num_slices=1,
    )
    mesh = Mesh(np.array(topo.devices[:1]), ("x",))
    return NamedSharding(mesh, P())


def _shaped(tree, sh):
    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a),
                                       sharding=sh),
        tree,
    )


def _bytes(fn, *args):
    return fn.lower(*args).compile().cost_analysis()["bytes accessed"]


def build_system(solver_cls, **kw):
    from legionsolvers_tpu import (
        BlockPartition,
        PartitionedVector,
        SolverOptions,
        SquarePlanner,
        StencilOperator,
        laplacian_stencil,
    )

    options = SolverOptions(entry_dtype=jnp.float32)
    n = N_GRID * N_GRID
    part = BlockPartition(n, 1)
    op = StencilOperator((N_GRID, N_GRID), laplacian_stencil(2),
                         partition=part, mesh=None, options=options)
    planner = SquarePlanner(mesh=None, options=options)
    gs = (N_GRID, N_GRID) if op.uses_pallas else None
    planner.add_sol_vector(PartitionedVector(
        "s", part, options=options, grid_shape=gs).zero_fill())
    planner.add_rhs_vector(PartitionedVector(
        "b", part, options=options, grid_shape=gs).constant_fill(1.0))
    planner.add_operator(op, 0, 0)
    return planner, solver_cls(planner, **kw), n


def audit_step(planner, solver, scalar_names, n):
    """(audited passes, modeled passes, label) for one solver iteration."""
    from legionsolvers_tpu.core.scalar import Scalar
    from legionsolvers_tpu.utils.roofline import solver_bytes_per_iteration

    sh = _topology_sharding()

    def one_step(state, scalars):
        planner.load_state(state)
        for k, v in zip(scalar_names, scalars):
            setattr(solver, k, [Scalar(v)])
        solver.step()
        out_scalars = tuple(
            getattr(solver, k)[-1].value for k in scalar_names
        )
        return planner.dump_state(), out_scalars

    state = planner.dump_state()
    scalars = tuple(
        jnp.asarray(getattr(solver, k)[-1].value) for k in scalar_names
    )
    sa = (_shaped(state, sh), _shaped(scalars, sh))
    stepped = _bytes(jax.jit(one_step), *sa)
    ident = _bytes(jax.jit(lambda s, sc: (s, sc)), *sa)
    itemsize = 4
    audited = (stepped - ident) / (n * itemsize)
    bpi, label = solver_bytes_per_iteration(solver, n)
    return audited, bpi / (n * itemsize), label


def main():
    from legionsolvers_tpu import BiCGStabSolver, CGSolver, GMRESSolver

    out = sys.argv[1] if len(sys.argv) > 1 else "TRAFFIC_AUDIT.md"
    rows = []

    planner, solver, n = build_system(CGSolver)
    # audit the STEP path (the fused Pallas runners carry their own
    # validated cost estimates; the step path is the XLA-fused one), so
    # compare against the step-path model (fused_jnp: matvec_dot 2 +
    # axpy 3 + axpy 3 + dot 1 + xpay 3 = 12), NOT the solve() schedule
    audited, _, _ = audit_step(planner, solver,
                               ("residual_norm_squared",), n)
    from legionsolvers_tpu.utils.roofline import CG_PASSES
    rows.append(("CG step()", audited, float(CG_PASSES["fused_jnp"]),
                 "fused_jnp"))

    planner, solver, n = build_system(BiCGStabSolver)
    # like CG: the audit covers the step() path (XLA-fused transcription),
    # so compare against the 24-pass transcription model, not the 15-pass
    # fused-Pallas solve() schedule the model function would report
    audited, _, _ = audit_step(planner, solver,
                               ("rho", "alpha", "omega"), n)
    rows.append(("BiCGStab step()", audited, 24.0, "bicgstab_fused"))

    from legionsolvers_tpu.solvers.pcg import JacobiPreconditioner, PCGSolver

    def _pcg(planner):
        return PCGSolver(planner, JacobiPreconditioner(planner))

    planner, solver, n = build_system(_pcg)
    audited, modeled, label = audit_step(planner, solver, ("rz",), n)
    rows.append(("PCG(Jacobi) step()", audited, modeled, label))

    planner, solver, n = build_system(GMRESSolver, restart=10)
    from legionsolvers_tpu.core.scalar import Scalar
    sh = _topology_sharding()

    def one_cycle(state):
        planner.load_state(state)
        solver.residual_norm_squared = []
        solver.step()
        return planner.dump_state(), solver.residual_norm_squared[0].value

    sa = _shaped(planner.dump_state(), sh)
    stepped = _bytes(jax.jit(one_cycle), sa)
    ident = _bytes(jax.jit(lambda s: s), sa)
    from legionsolvers_tpu.utils.roofline import gmres_passes
    rows.append(("GMRES(10) MGS cycle", (stepped - ident) / (n * 4),
                 float(gmres_passes(10)), "gmres10_mgs"))

    lines = [
        "# Traffic-model audit (XLA cost analysis, AOT v5e compile)",
        "",
        "Machine-generated by `scripts/audit_traffic.py`.  'audited' = "
        "compiler-reported HBM bytes for ONE iteration (minus state "
        "pass-through) / (n x 4 B); 'model' = utils/roofline.py pass "
        "count.  Single-iteration compiles cannot see cross-iteration "
        "fusion, so audited slightly above model is expected; audited far "
        "ABOVE model would mean the model under-counts (overstated "
        "roofline %).  Audited BELOW model means XLA fuses better than "
        "the hand count — the model is then conservative and the reported "
        "% of roofline for that schedule is optimistic by the same "
        "factor (observed for the MGS GMRES transcription, whose "
        "sequential-looking dot/axpy chain XLA partially merges; the "
        "benchmark matrix runs the CGS2 fast path, not this one).",
        "",
        "| schedule | model passes | audited passes | ratio |",
        "|---|---|---|---|",
    ]
    ok = True
    for name, audited, model, label in rows:
        ratio = audited / model
        lines.append(f"| {name} ({label}) | {model:.2f} | {audited:.2f} | "
                     f"{ratio:.2f}x |")
        print(lines[-1], flush=True)
        if ratio > 1.35:
            ok = False
    lines.append("")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"[audit] wrote {out}; ok={ok}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
