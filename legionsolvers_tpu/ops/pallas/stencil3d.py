"""Pallas TPU kernel: 3-D grid stencil SpMV (plane-streaming).

Covers the reference benchmark's 3-D cases — the 7-point and 27-point
Laplacians (reference: test/BenchmarkStencil.cpp:24-137 builds them as
linearized-CSR matrices for cuSPARSE; here the operator stays matrix-free).

Structure: the local [X, Y, Z] block streams through VMEM one x-plane at a
time.  A rotating 4-slot buffer holds the padded planes x-1, x, x+1 (plus the
in-flight lookahead DMA), so every element of x is read from HBM exactly once
and every stencil offset (ox, oy, oz) with |ox| <= 1 becomes a value-level
slice of a resident plane:

* ox  -> plane slot selection (halo planes supply the block edges: zeros at
         the global grid boundary, the neighbor's edge plane when sharded);
* oy  -> row shift into the plane's zero-padded 8-row top/bottom margin;
* oz  -> lane shift into the plane's zero-padded 128-column margins.

Modes mirror ``stencil2d._stencil_call``:

* ``mode="y"``     : y = A x                (8 B/elt: read x, write y)
* ``mode="y_dot"`` : y = A x and <x, A x>   (8 B/elt)
* ``mode="pq"``    : <x, A x> only; A x never leaves VMEM (4 B/elt)
* ``mode="update"``: x' = x + alpha p, r' = r - alpha (A p), rr = <r', r'>
                     with A p formed in VMEM (20 B/elt)

:func:`grid3d_cg_xpay_pq` is a separate driver (two plane streams): p = r
+ beta p_old formed plane-by-plane in VMEM, then <p, A p> — 12 B/elt, so a
fused-CG iteration is 32 B/unknown instead of 36 (XLA xpay + pq).

Geometry requirements: Z a multiple of 128, |oy| <= 8, |oz| <= 128, and the
padded-plane working set must fit the VMEM budget (checked by
:func:`supports3d`).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PADY = 8    # zero-padded rows above/below each resident plane
PADZ = 128  # zero-padded lanes left/right of each resident plane

def _separable_box_decomposition(offsets, values):
    """Factor a FULL 3x3x3 box stencil whose weight depends only on the
    offset's nonzero-axis count s (center m, face f, edge e, corner c)
    into separable sweeps:

        A = mu * I + sum_j beta_j * B(t_j),
        B(t) = Px(t) Py(t) Pz(t),  per-axis P(t) = t*shift(-1) + id + t*shift(+1)

    B(t)'s weight on an s-class offset is t^s, so (f, e, c) = sum_j
    beta_j (t_j, t_j^2, t_j^3); with t2 = (e - c)/(f - e) and t1 = 1 the
    2x3 Vandermonde solves exactly, and mu = m - sum beta_j absorbs the
    center.  For the benchmark 27-pt Laplacian (f, e, c = -6, -3, -2 in
    26ths) this gives t2 = 1/3, beta = (-1.5, -13.5)/26, mu = 103/26 —
    an EXACT factorization that cuts the VPU cost from ~81 ops/element
    (27 slice-mul-adds) to ~23 (two 3-sweep box applications), the lever
    the round-4 profile identified for the compute-bound 27-pt cells
    (every 27-pt pass measured ~0.93 ms regardless of 8-28 B/elt traffic,
    PROFILE_r04.md).  Returns (mu, ((beta1, t1), (beta2, t2))) or None
    when the stencil is not a class-uniform full box.
    """
    if len(offsets) != 27:
        return None
    import numpy as _np

    wmap = {tuple(o): float(v) for o, v in zip(offsets, values)}
    if len(wmap) != 27:
        return None
    cls = {0: [], 1: [], 2: [], 3: []}
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                if (dx, dy, dz) not in wmap:
                    return None
                cls[abs(dx) + abs(dy) + abs(dz)].append(wmap[(dx, dy, dz)])
    vals4 = []
    for scount in (0, 1, 2, 3):
        arr = _np.asarray(cls[scount])
        if _np.ptp(arr) > 1e-12 * max(1.0, _np.abs(arr).max()):
            return None
        vals4.append(float(arr[0]))
    m, f, e, c = vals4
    if abs(f - e) < 1e-300:
        return None
    t2 = (e - c) / (f - e)
    if abs(t2 - 1.0) < 1e-9 or abs(t2) < 1e-12:
        return None  # degenerate: falls back to the direct loop
    beta2 = (f - e) / (t2 - t2 * t2)
    beta1 = f - beta2 * t2
    # verify the corner equation (inconsistent class pattern otherwise)
    if abs(beta1 + beta2 * t2 ** 3 - c) > 1e-9 * max(1.0, abs(c)):
        return None
    mu = m - beta1 - beta2
    return mu, ((beta1, 1.0), (beta2, t2))


def _apply_planes_sep(planes, dec, Y, Z, dtype):
    """Separable-sweep application on the three padded (YP, ZP) plane
    slabs (pads are zeros, so sweep composition equals the direct
    zero-padded 27-term sum)."""
    mu, terms = dec
    p_m1, p_0, p_p1 = planes[-1], planes[0], planes[1]
    acc = jnp.asarray(mu, dtype) * jax.lax.slice(
        p_0, (PADY, PADZ), (PADY + Y, PADZ + Z)
    )
    for beta, t in terms:
        tt = jnp.asarray(t, dtype)
        px = tt * (p_m1 + p_p1) + p_0                       # X sweep (planes)
        qy = (
            tt * (jax.lax.slice(px, (PADY - 1, 0), (PADY - 1 + Y, px.shape[1]))
                  + jax.lax.slice(px, (PADY + 1, 0), (PADY + 1 + Y, px.shape[1])))
            + jax.lax.slice(px, (PADY, 0), (PADY + Y, px.shape[1]))
        )                                                    # Y sweep
        qz = (
            tt * (jax.lax.slice(qy, (0, PADZ - 1), (Y, PADZ - 1 + Z))
                  + jax.lax.slice(qy, (0, PADZ + 1), (Y, PADZ + 1 + Z)))
            + jax.lax.slice(qy, (0, PADZ), (Y, PADZ + Z))
        )                                                    # Z sweep
        acc = acc + jnp.asarray(beta, dtype) * qz
    return acc


def apply_planes(planes, offsets, values, Y, Z, dtype):
    """A applied to the resident {-1, 0, +1} padded plane slabs -> (Y, Z)
    body result.  Full class-uniform 3x3x3 boxes take the separable-sweep
    fast path (~23 VPU ops/elt vs ~81); everything else the direct
    slice-mul-add loop."""
    dec = _separable_box_decomposition(offsets, values)
    if dec is not None:
        return _apply_planes_sep(planes, dec, Y, Z, dtype)
    acc = None
    for (ox, oy, oz), v in zip(offsets, values):
        sh = jax.lax.slice(
            planes[ox], (PADY + oy, PADZ + oz), (PADY + oy + Y, PADZ + oz + Z)
        )
        term = jnp.asarray(v, dtype) * sh
        acc = term if acc is None else acc + term
    return acc

# v5e has 128 MB physical VMEM/core; the 3-D plane kernels get a larger
# slice than the 2-D family because the reference ladder shapes
# (1024x1024x512 etc., bench_all_ls.py:370-371) need ~56 MB of planes +
# streams — round 4 raised this after the 2^29 rungs fell back to the
# 48 B/u XLA path for want of ~2 MB
_VMEM_LIMIT = 100 * 2**20
_VMEM_BUDGET = 72 * 2**20

def _plane_bytes(Y: int, Z: int, itemsize: int) -> int:
    return (Y + 2 * PADY) * (Z + 2 * PADZ) * itemsize


def supports3d(
    Y: int, Z: int, offsets, itemsize: int = 4, n_streams: int = 4
) -> bool:
    """Whether the plane-streaming kernel handles this geometry.
    ``n_streams=4`` (update mode) guarantees every mode fits."""
    if Z % 128 != 0 or Y < 1:
        return False
    if not all(
        abs(ox) <= 1 and abs(oy) <= PADY and abs(oz) <= PADZ
        for ox, oy, oz in offsets
    ):
        return False
    # 4 buffer slots + ~3 plane-sized compute temporaries + the pipelined
    # [1, Y, Z] streams (double-buffered by the pipeline)
    need = (4 + 3) * _plane_bytes(Y, Z, itemsize)
    need += (2 * n_streams + 2) * Y * Z * itemsize
    return need <= _VMEM_BUDGET


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "values", "mode", "interpret"),
)
def _stencil3d_call(
    x: jnp.ndarray,
    halo_top: jnp.ndarray,
    halo_bot: jnp.ndarray,
    extra: tuple,
    *,
    offsets: Tuple[Tuple[int, int, int], ...],
    values: Tuple[float, ...],
    mode: str = "y",
    interpret: bool = False,
):
    """Shared 3-D kernel driver.  ``x`` is the local [X, Y, Z] block;
    ``halo_top``/``halo_bot`` are [Y, Z] planes holding the x-neighbors of
    the first/last local plane (zeros at the global grid edges).  ``extra``
    is () except for mode="update": (xv, rv, alpha)."""
    X, Y, Z = x.shape
    dtype = x.dtype
    if Z % 128 != 0:
        raise ValueError(f"Z={Z} must be a multiple of 128")
    if not all(abs(o[0]) <= 1 for o in offsets):
        raise ValueError("plane-streaming kernel requires |ox| <= 1")
    nt = X
    YP, ZP = Y + 2 * PADY, Z + 2 * PADZ

    def issue_plane(j, x_hbm, buf, sems):
        slot = jnp.asarray(j, jnp.int32) % 4
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(j, 1), :, :],
            buf.at[pl.ds(slot, 1), pl.ds(PADY, Y), pl.ds(PADZ, Z)],
            sems.at[slot],
        ).start()

    def wait_plane(j, x_hbm, buf, sems):
        slot = jnp.asarray(j, jnp.int32) % 4
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(0, 1), :, :],
            buf.at[pl.ds(slot, 1), pl.ds(PADY, Y), pl.ds(PADZ, Z)],
            sems.at[slot],
        ).wait()

    def kernel(x_hbm, top_ref, bot_ref, *rest):
        if mode == "y":
            (y_ref, buf, sems) = rest
        elif mode == "y_dot":
            (y_ref, dot_ref, buf, sems) = rest
        elif mode == "pq":
            (dot_ref, buf, sems) = rest
        else:  # update
            (xv_ref, rv_ref, alpha_ref,
             xo_ref, ro_ref, rr_ref, buf, sems) = rest
        i = pl.program_id(0)

        # pipeline: plane i+2 streams in while plane i is computed
        @pl.when(i == 0)
        def _():
            issue_plane(0, x_hbm, buf, sems)
            if nt > 1:
                issue_plane(1, x_hbm, buf, sems)

        @pl.when(i + 2 < nt)
        def _():
            issue_plane(i + 2, x_hbm, buf, sems)

        @pl.when(i == 0)
        def _():
            # zero the pad margins of all slots once; DMAs only ever write
            # the [PADY:PADY+Y, PADZ:PADZ+Z] interior
            for sl in range(4):
                buf[sl, 0:PADY, :] = jnp.zeros((PADY, ZP), dtype)
                buf[sl, PADY + Y :, :] = jnp.zeros((PADY, ZP), dtype)
                buf[sl, :, 0:PADZ] = jnp.zeros((YP, PADZ), dtype)
                buf[sl, :, PADZ + Z :] = jnp.zeros((YP, PADZ), dtype)
            # halo planes: plane -1 lives in slot 3 = (-1) % 4.  Slot 3 is
            # not DMA'd until plane 3 (issued at step 1), and plane -1 is
            # only read at step 0, so there is no conflict.
            buf[3, PADY : PADY + Y, PADZ : PADZ + Z] = top_ref[:, :]
            wait_plane(0, x_hbm, buf, sems)

        @pl.when(i == nt - 1)
        def _():
            # plane nt -> slot nt % 4 (static), whose previous tenant (plane
            # nt - 4) is dead by now; the slot's last DMA (plane nt - 4) was
            # waited at step nt - 4 <= nt - 1
            buf[nt % 4, PADY : PADY + Y, PADZ : PADZ + Z] = bot_ref[:, :]

        @pl.when(i + 1 < nt)
        def _():
            wait_plane(i + 1, x_hbm, buf, sems)

        # resident planes for this step
        sm1 = (i - 1) % 4
        s0 = i % 4
        sp1 = (i + 1) % 4
        planes = {-1: buf[sm1, :, :], 0: buf[s0, :, :], 1: buf[sp1, :, :]}

        acc = apply_planes(planes, offsets, values, Y, Z, dtype)

        def accum_scalar(ref, part):
            @pl.when(i == 0)
            def _():
                ref[0, 0] = part

            @pl.when(i > 0)
            def _():
                ref[0, 0] = ref[0, 0] + part

        body = lambda: jax.lax.slice(
            planes[0], (PADY, PADZ), (PADY + Y, PADZ + Z)
        )
        if mode in ("y", "y_dot"):
            y_ref[0, :, :] = acc
        if mode in ("y_dot", "pq"):
            accum_scalar(dot_ref, jnp.sum((body() * acc).astype(jnp.float32)))
        if mode == "update":
            alpha = alpha_ref[0, 0].astype(dtype)
            xo_ref[0, :, :] = xv_ref[0, :, :] + alpha * body()
            rnew = rv_ref[0, :, :] - alpha * acc
            ro_ref[0, :, :] = rnew
            accum_scalar(rr_ref, jnp.sum((rnew * rnew).astype(jnp.float32)))

    blk = lambda: pl.BlockSpec(
        (1, Y, Z), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    smem = lambda: pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),   # x stays in HBM
        pl.BlockSpec(memory_space=pltpu.VMEM),  # halo_top plane
        pl.BlockSpec(memory_space=pltpu.VMEM),  # halo_bot plane
    ]
    out_shape, out_specs = [], []
    operands = [x, halo_top, halo_bot]
    aliases = {}
    bytes_accessed = X * Y * Z * dtype.itemsize
    if mode in ("y", "y_dot"):
        out_shape.append(jax.ShapeDtypeStruct((X, Y, Z), dtype))
        out_specs.append(blk())
        bytes_accessed += X * Y * Z * dtype.itemsize
    if mode in ("y_dot", "pq"):
        out_shape.append(jax.ShapeDtypeStruct((1, 1), jnp.float32))
        out_specs.append(smem())
    if mode == "update":
        xv, rv, alpha = extra
        operands += [xv, rv, alpha.reshape(1, 1).astype(jnp.float32)]
        in_specs += [blk(), blk(), smem()]
        out_shape += [
            jax.ShapeDtypeStruct((X, Y, Z), dtype),
            jax.ShapeDtypeStruct((X, Y, Z), dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ]
        out_specs += [blk(), blk(), smem()]
        aliases = {3: 0, 4: 1}  # x/r buffers are consumed
        bytes_accessed += 4 * X * Y * Z * dtype.itemsize

    return pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        scratch_shapes=[
            pltpu.VMEM((4, YP, ZP), dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * len(offsets) * X * Y * Z,
            bytes_accessed=bytes_accessed,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


def grid3d_stencil_matvec(
    x, halo_top, halo_bot, *, offsets, values,
    with_dot: bool = False, interpret: bool = False,
):
    """y = A @ x (and optionally <x, y>) for the 3-D stencil
    {(ox, oy, oz): v} over the local [X, Y, Z] block."""
    mode = "y_dot" if with_dot else "y"
    result = _stencil3d_call(
        x, halo_top, halo_bot, (), offsets=offsets, values=values,
        mode=mode, interpret=interpret,
    )
    if with_dot:
        y, dot = result
        return y, dot[0, 0]
    return result[0]


def supports3d_xpay_pq(Y: int, Z: int, itemsize: int = 4) -> bool:
    """VMEM check for the dual-stream xpay_pq driver: two 4-slot plane
    buffers + the combined 4-slot buffer + ~3 temporaries + the p output
    stream."""
    need = (12 + 3) * _plane_bytes(Y, Z, itemsize)
    need += 4 * Y * Z * itemsize
    return need <= _VMEM_BUDGET


@functools.partial(
    jax.jit, static_argnames=("offsets", "values", "interpret")
)
def grid3d_cg_xpay_pq(
    r: jnp.ndarray,
    p_old: jnp.ndarray,
    beta: jnp.ndarray,
    pn_top: jnp.ndarray,
    pn_bot: jnp.ndarray,
    *,
    offsets: Tuple[Tuple[int, int, int], ...],
    values: Tuple[float, ...],
    interpret: bool = False,
):
    """(p, <p, A p>) with p = r + beta * p_old formed plane-by-plane in
    VMEM (fused-CG pass 1 for 3-D; 12 B/elt).  ``pn_top``/``pn_bot`` are
    the COMBINED p halo planes (r_halo + beta * p_halo), zeros at the
    global edges; ``p_old``'s buffer is consumed."""
    X, Y, Z = r.shape
    dtype = r.dtype
    if Z % 128 != 0:
        raise ValueError(f"Z={Z} must be a multiple of 128")
    if not all(abs(o[0]) <= 1 for o in offsets):
        raise ValueError("plane-streaming kernel requires |ox| <= 1")
    nt = X
    YP, ZP = Y + 2 * PADY, Z + 2 * PADZ

    def issue(j, hbm, buf, sems):
        slot = jnp.asarray(j, jnp.int32) % 4
        pltpu.make_async_copy(
            hbm.at[pl.ds(j, 1), :, :],
            buf.at[pl.ds(slot, 1), pl.ds(PADY, Y), pl.ds(PADZ, Z)],
            sems.at[slot],
        ).start()

    def wait(j, hbm, buf, sems):
        slot = jnp.asarray(j, jnp.int32) % 4
        pltpu.make_async_copy(
            hbm.at[pl.ds(0, 1), :, :],
            buf.at[pl.ds(slot, 1), pl.ds(PADY, Y), pl.ds(PADZ, Z)],
            sems.at[slot],
        ).wait()

    def kernel(r_hbm, p_hbm, beta_ref, top_ref, bot_ref,
               po_ref, pq_ref, rbuf, pbuf, comb, rs, ps):
        i = pl.program_id(0)
        bv = beta_ref[0, 0].astype(dtype)

        @pl.when(i == 0)
        def _():
            issue(0, r_hbm, rbuf, rs)
            issue(0, p_hbm, pbuf, ps)
            if nt > 1:
                issue(1, r_hbm, rbuf, rs)
                issue(1, p_hbm, pbuf, ps)

        @pl.when(i + 2 < nt)
        def _():
            issue(i + 2, r_hbm, rbuf, rs)
            issue(i + 2, p_hbm, pbuf, ps)

        @pl.when(i == 0)
        def _():
            for buf in (rbuf, pbuf, comb):
                for sl in range(4):
                    buf[sl, 0:PADY, :] = jnp.zeros((PADY, ZP), dtype)
                    buf[sl, PADY + Y :, :] = jnp.zeros((PADY, ZP), dtype)
                    buf[sl, :, 0:PADZ] = jnp.zeros((YP, PADZ), dtype)
                    buf[sl, :, PADZ + Z :] = jnp.zeros((YP, PADZ), dtype)
            # plane -1 = the combined halo (slot 3, see _stencil3d_call)
            comb[3, PADY : PADY + Y, PADZ : PADZ + Z] = top_ref[:, :]
            wait(0, r_hbm, rbuf, rs)
            wait(0, p_hbm, pbuf, ps)
            comb[0, PADY : PADY + Y, PADZ : PADZ + Z] = (
                rbuf[0, PADY : PADY + Y, PADZ : PADZ + Z]
                + bv * pbuf[0, PADY : PADY + Y, PADZ : PADZ + Z]
            )

        @pl.when(i + 1 < nt)
        def _():
            wait(i + 1, r_hbm, rbuf, rs)
            wait(i + 1, p_hbm, pbuf, ps)
            sl = (i + 1) % 4
            comb[sl, PADY : PADY + Y, PADZ : PADZ + Z] = (
                rbuf[sl, PADY : PADY + Y, PADZ : PADZ + Z]
                + bv * pbuf[sl, PADY : PADY + Y, PADZ : PADZ + Z]
            )

        @pl.when(i == nt - 1)
        def _():
            comb[nt % 4, PADY : PADY + Y, PADZ : PADZ + Z] = bot_ref[:, :]

        sm1, s0, sp1 = (i - 1) % 4, i % 4, (i + 1) % 4
        planes = {-1: comb[sm1, :, :], 0: comb[s0, :, :],
                  1: comb[sp1, :, :]}
        acc = apply_planes(planes, offsets, values, Y, Z, dtype)
        body = jax.lax.slice(planes[0], (PADY, PADZ), (PADY + Y, PADZ + Z))
        po_ref[0, :, :] = body
        part = jnp.sum((body * acc).astype(jnp.float32))

        @pl.when(i == 0)
        def _():
            pq_ref[0, 0] = part

        @pl.when(i > 0)
        def _():
            pq_ref[0, 0] = pq_ref[0, 0] + part

    blk = pl.BlockSpec((1, Y, Z), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    po, pq = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            smem,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[blk, smem],
        out_shape=[
            jax.ShapeDtypeStruct((X, Y, Z), dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        input_output_aliases={1: 0},  # p_old buffer becomes p
        scratch_shapes=[
            pltpu.VMEM((4, YP, ZP), dtype),
            pltpu.VMEM((4, YP, ZP), dtype),
            pltpu.VMEM((4, YP, ZP), dtype),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(2 * len(offsets) + 4) * X * Y * Z,
            bytes_accessed=3 * X * Y * Z * dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(r, p_old, jnp.asarray(beta, jnp.float32).reshape(1, 1),
      pn_top, pn_bot)
    return po, pq[0, 0]


def grid3d_cg_pq(p, halo_top, halo_bot, *, offsets, values, interpret=False):
    """<p, A p> without materializing A p (fused-CG pass 1; 4 B/elt)."""
    (dot,) = _stencil3d_call(
        p, halo_top, halo_bot, (), offsets=offsets, values=values,
        mode="pq", interpret=interpret,
    )
    return dot[0, 0]


def grid3d_cg_update(
    p, x, r, alpha, halo_top, halo_bot, *, offsets, values, interpret=False
):
    """(x + alpha p, r - alpha A p, <r', r'>) with A p formed in VMEM only
    (fused-CG pass 2; 20 B/elt).  ``x``/``r`` buffers are consumed."""
    xo, ro, rr = _stencil3d_call(
        p, halo_top, halo_bot,
        (x, r, jnp.asarray(alpha, jnp.float32)),
        offsets=offsets, values=values, mode="update", interpret=interpret,
    )
    return xo, ro, rr[0, 0]
