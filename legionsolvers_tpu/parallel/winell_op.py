"""Windowed-ELL operator: the device fast path for general sparse matrices.

Round 3 left one capability hole vs the reference: explicit matrices that
fail the DIA gate (genuinely scattered sparsity) fell to an XLA-gather ELL
measured at 0.11 Gnnz/s on chip — ~480x below the DIA path, where the
reference's cuSPARSE SpMV has no cliff (reference: CSRMatrixTasks.cu:14-156,
COOMatrixTasks.cu:12-146).  This operator closes it for matrices whose rows
can be banded at build time (which `parallel/reorder.py` arranges via RCM):

* host packer (:func:`plan_winell`): ELL layout with column-sorted slots,
  one 1024-aligned x window per (row-tile, slot), window starts in a scalar
  array; eligibility = the largest (tile, slot) column span fits
  ``MAX_WINDOW_ROWS`` chunks of 128;
* device kernel (:func:`~legionsolvers_tpu.ops.pallas.winell.winell_spmv`):
  static chunk sweep of one-vreg gathers (~4*KR VPU ops/nonzero).

This operator is the single-piece form; SHARDED systems get the same
kernel through :class:`~legionsolvers_tpu.parallel.distmatrix.RowPartitionedMatrix`,
which plans per-shard windows over a banded-ordered extended (halo) buffer
(``_plan_sharded_winell``) and falls back to the XLA-gather ELL only when a
shard's spans exceed the window cap.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..options import SolverOptions, DEFAULT_OPTIONS
from ..core.partition import BlockPartition
from ..ops.pallas.winell import MAX_WINDOW_ROWS, winell_spmv

TILE_ROWS_OF_128 = 32  # Rt: output tile = Rt*128 rows


# cost-model constants for the tile-size choice, calibrated on chip
# (scripts/probe_winell.py sweep, 2026-08-21, v5e): the kernel's chunk
# sweep costs ~4*KR VPU ops per ELL slot element (measured: permlap Rt=8
# KR=24 -> 1.24 ms for N*L*(4*24+3) model ops = 1.48 ms; randband Rt=8
# 7.0 vs 7.7 ms), and window DMA issue is cheap (Rt=8's 4x DMA count beat
# Rt=32 3.6x on permlap -> t_issue << 100 ns).  Smaller tiles shrink
# per-(tile, slot) window spans (hence KR); larger tiles only win when the
# span is bandwidth-dominated (KR independent of Rt).
_VPU_OPS_PER_SEC = 1.4e12
_DMA_ISSUE_SEC = 2e-8
_RT_CANDIDATES = (8, 16, 32, 64)


def plan_winell(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    n: int,
    padded_size: int,
    dtype,
    max_window_rows: int = MAX_WINDOW_ROWS,
    tile_rows_of_128: Optional[int] = None,
    min_fill: float = 1 / 16,
    window_rows_min: int = 0,
    row_length_min: int = 0,
    n_win: Optional[int] = None,
) -> Optional[dict]:
    """Host-side windowed-ELL packing; returns None when ineligible.

    Output dict: N (device length, multiple of the tile), wstart [nt, L]
    int32, cols [nt, L, Rt, 128] int32 (window-local), vals [...] in
    ``dtype``, window_rows KR.  Duplicate (row, col) entries are summed
    (COO semantics, like the reference's reduction-accessor SpMV output,
    COOMatrixTasks.cpp:38-39).  The tile height Rt (in rows of 128) is
    chosen by a measured cost model unless forced: per-(tile, slot) window
    spans shrink with the tile (fewer gather chunks = less VPU work) while
    the window DMA count grows.
    """
    N0 = max(padded_size, 1024)
    # window (x) space may exceed the row space: sliced-ELL classes plan a
    # row RANGE whose windows still index the full x (round 5)
    N_win0 = max(n_win if n_win is not None else padded_size, N0)
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    vals = np.asarray(vals, np.float64)
    if len(rows) == 0:
        return None
    order = np.lexsort((cols, rows))
    r, c, v = rows[order], cols[order], vals[order]
    # combine duplicates (adjacent after the sort; reduceat, not ufunc.at —
    # this host pages at ~40 MB/s and ufunc.at is orders slower than the
    # vectorized reductions)
    new = np.empty(len(r), bool)
    new[0] = True
    new[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
    if not new.all():
        starts = np.flatnonzero(new)
        v = np.add.reduceat(v, starts)
        r, c = r[new], c[new]
    # slot within row (column-sorted: keeps per-(tile, slot) spans tight)
    counts = np.bincount(r, minlength=N0)
    L = int(counts.max(initial=0))
    if L == 0 or L > 128:
        return None
    L = max(L, row_length_min)  # SPMD: all shards share one static L
    if len(r) < min_fill * N0 * L:
        return None  # ELL padding blowup: a few long rows dominate
    row_start = np.concatenate([[0], np.cumsum(counts)])
    slot = np.arange(len(r)) - row_start[r]

    # ---- per-(fine-tile, slot) column extents at the FINEST tiling ------
    # (Rt = 8); coarser candidate tilings aggregate these pairwise, so the
    # expensive grouped pass over nnz runs once
    TR0 = 8 * 128
    N_f = -(-N0 // TR0) * TR0
    nt0 = N_f // TR0
    ts0 = (r // TR0) * L + slot
    gorder = np.argsort(ts0, kind="stable")
    ts_s, c_s = ts0[gorder], c[gorder]
    gnew = np.empty(len(ts_s), bool)
    gnew[0] = True
    gnew[1:] = ts_s[1:] != ts_s[:-1]
    gstarts = np.flatnonzero(gnew)
    gid = ts_s[gstarts]
    BIG = np.int64(1) << 60
    min0 = np.full(nt0 * L, BIG, np.int64)
    max0 = np.full(nt0 * L, -1, np.int64)
    min0[gid] = np.minimum.reduceat(c_s, gstarts)
    max0[gid] = np.maximum.reduceat(c_s, gstarts)
    min0 = min0.reshape(nt0, L)
    max0 = max0.reshape(nt0, L)

    def extents_for(Rt):
        f = Rt // 8
        nt = -(-nt0 // f)
        pad = nt * f - nt0
        mn = np.concatenate(
            [min0, np.full((pad, L), BIG, np.int64)]
        ).reshape(nt, f, L).min(axis=1)
        mx = np.concatenate(
            [max0, np.full((pad, L), -1, np.int64)]
        ).reshape(nt, f, L).max(axis=1)
        return nt, mn.reshape(-1), mx.reshape(-1)

    def window_geometry(Rt):
        """(nt, ws, KR) for a candidate tile height, or None if the cap is
        exceeded."""
        TR = Rt * 128
        N = -(-N0 // TR) * TR
        NR = max(N, N_win0) // 128
        if NR < 8:
            return None
        nt, mn, mx = extents_for(Rt)
        occ = mx >= 0
        ws = np.zeros(nt * L, np.int64)
        ws[occ] = (mn[occ] // 1024) * 8
        span = np.zeros(nt * L, np.int64)
        span[occ] = mx[occ] // 128 - ws[occ] + 1
        KR = int(span.max(initial=1))
        KR = -(-KR // 8) * 8
        KR = max(KR, window_rows_min)  # SPMD: shared static window depth
        if KR > min(max_window_rows, NR - (NR % 8)):
            return None
        ws = np.minimum(ws, NR - KR)
        return NR * 128, nt, ws, KR  # first entry = WINDOW (x) space

    if tile_rows_of_128 is not None:
        geo = window_geometry(tile_rows_of_128)
        if geo is None:
            return None
        Rt = tile_rows_of_128
    else:
        best = None
        for cand in _RT_CANDIDATES:
            geo_c = window_geometry(cand)
            if geo_c is None:
                continue
            N_c, nt_c, _, KR_c = geo_c
            compute = N_c * L * (4 * KR_c + 3) / _VPU_OPS_PER_SEC
            dma = nt_c * (L + 3) * _DMA_ISSUE_SEC
            cost = compute + dma
            if best is None or cost < best[0]:
                best = (cost, cand, geo_c)
        if best is None:
            return None
        Rt, geo = best[1], best[2]
    N_x, nt, ws, KR = geo
    TR = Rt * 128

    ts = (r // TR) * L + slot
    ell_cols = np.zeros((nt * L, TR), np.int32)
    ell_vals = np.zeros((nt * L, TR), dtype)
    lc = c - ws[ts] * 128
    ell_cols[ts, r % TR] = lc.astype(np.int32)
    ell_vals[ts, r % TR] = v.astype(dtype)
    ws2 = ws.reshape(nt, L).astype(np.int32)
    ntp = -(-nt // 8) * 8
    if ntp != nt:  # Mosaic SMEM blocks need 8-divisible row counts
        ws2 = np.concatenate([ws2, np.zeros((ntp - nt, L), np.int32)])
    return {
        "N": N_x,                 # x padding (window space)
        "N_rows": nt * TR,        # output rows (row space)
        "window_rows": KR,
        "wstart": ws2,
        "cols": ell_cols.reshape(nt, L, Rt, 128),
        "vals": ell_vals.reshape(nt, L, Rt, 128),
        "row_length": L,
        "tile_rows_of_128": Rt,
    }


class WinEllOperator:
    """y = A @ x on the windowed-gather kernel (single piece).

    Build via :func:`plan_winell` + constructor, or let the planner route
    here through the RCM reorder gate (``parallel/reorder.py``).
    """

    def __init__(
        self,
        matrix,
        partition: BlockPartition,
        options: SolverOptions = DEFAULT_OPTIONS,
        plan: Optional[dict] = None,
    ):
        if partition.num_pieces != 1:
            raise ValueError("WinEllOperator is single-piece only")
        if matrix.n_domain != matrix.n_range:
            raise ValueError("WinEllOperator requires a square matrix")
        self.matrix = matrix
        self.partition = partition
        self.options = options
        dtype = np.dtype(options.entry_dtype)
        if plan is None:
            # explicit construction opts out of the planner's fill-routing
            # gate (the user chose this layout; only hard limits remain)
            plan = plan_winell(
                matrix.rows, matrix.cols, np.asarray(matrix.vals),
                matrix.n_range, partition.padded_size, dtype, min_fill=0.0,
            )
        if plan is None:
            raise ValueError("matrix is not windowed-ELL eligible")
        self._N = plan["N"]
        self._KR = plan["window_rows"]
        self.wstart = jnp.asarray(plan["wstart"])
        self.ell_cols = jnp.asarray(plan["cols"])
        self.ell_vals = jnp.asarray(plan["vals"])
        self.row_length = plan["row_length"]
        self._interpret = jax.default_backend() == "cpu"
        self._transpose_op = None

    # ------------------------------------------------------------------
    @property
    def n_domain(self) -> int:
        return self.matrix.n_domain

    @property
    def n_range(self) -> int:
        return self.matrix.n_range

    def nnz(self) -> int:
        return self.matrix.n_kernel

    @property
    def supports_matvec_dot(self) -> bool:
        return False

    @property
    def uses_pallas(self) -> bool:
        return True

    # ------------------------------------------------------------------
    def device_state(self):
        return (self.wstart, self.ell_cols, self.ell_vals)

    def set_device_state(self, state) -> None:
        self.wstart, self.ell_cols, self.ell_vals = state

    # ------------------------------------------------------------------
    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        P = self.partition.padded_size
        if self._N != P:
            x = jnp.pad(x, (0, self._N - P))
        y = winell_spmv(
            x.reshape(-1, 128), self.wstart, self.ell_cols, self.ell_vals,
            window_rows=self._KR, interpret=self._interpret,
        ).reshape(-1)
        return y[:P] if self._N != P else y

    def matvec_add(self, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        return y + self.matvec(x)

    def transpose(self) -> "WinEllOperator":
        """A^T on the same kernel (fresh packing of the swapped pattern; the
        reference stubs rmatvec, COOMatrixTasks.cpp:78-83)."""
        if self._transpose_op is None:

            class _Swapped:
                def __init__(s, m):
                    s.rows, s.cols, s.vals = m.cols, m.rows, m.vals
                    s.n_domain, s.n_range = m.n_range, m.n_domain
                    s.n_kernel = m.n_kernel

            self._transpose_op = WinEllOperator(
                _Swapped(self.matrix), self.partition, self.options
            )
        return self._transpose_op

    def rmatvec(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.transpose().matvec(x)


def plan_winell_classes(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    n: int,
    padded_size: int,
    dtype,
    max_classes: int = 6,
    min_fill: float = 1 / 16,
):
    """Sliced-ELL planning (round 5, r4 verdict item 3): per-1024-row-block
    slot counts instead of one global L.

    Uniform-L ELL pays the MAX row degree for every row — the round-4
    randband row wasted 3.3x (L = 26 slots vs mean 8 nnz/row).  Windows are
    a per-tile property, so BLOCKS of 1024 rows can be reordered by degree
    without touching the window spans: blocks are packed into <= 6
    contiguous degree classes, each planned independently with its own L
    (and its own tile/window geometry) over the SAME x window space; the
    device matvec concatenates the class outputs and un-shuffles y by a
    1024-row block gather (~200 GB/s measured — one cheap pass).

    Returns None when ineligible, a plain :func:`plan_winell` dict when one
    class suffices, else {"classes": [(n_blocks_c, plan_c), ...],
    "block_src": int32[nbp] (shuffled block b reads original block
    block_src[b]), "newpos": int32[nbp] (original block b lands at
    newpos[b]), "nb": nb}."""
    N0 = max(padded_size, 1024)
    nb = -(-N0 // 1024)
    rows = np.asarray(rows, np.int64)
    counts = np.bincount(rows, minlength=nb * 1024)
    Lb = counts.reshape(nb, 1024).max(axis=1)
    order = np.argsort(-Lb, kind="stable")  # blocks by descending degree
    Ls = Lb[order]
    if Ls[0] == 0 or Ls[0] > 128:
        return None
    # greedy class boundaries: new class when the running max exceeds the
    # current block's L by > 30% (merge smallest until <= max_classes)
    bounds = [0]
    for i in range(1, nb):
        if Ls[bounds[-1]] > 1.3 * max(Ls[i], 1):
            bounds.append(i)
    bounds.append(nb)
    while len(bounds) - 1 > max_classes:
        # merge the pair of adjacent classes with the least added padding
        costs = [
            (Ls[bounds[i]] - Ls[bounds[i + 1]]) * (bounds[i + 2] - bounds[i + 1])
            for i in range(len(bounds) - 2)
        ]
        k = int(np.argmin(costs))
        del bounds[k + 1]
    slots = sum(
        int(Ls[bounds[i]]) * (bounds[i + 1] - bounds[i]) * 1024
        for i in range(len(bounds) - 1)
    )
    if len(rows) < min_fill * slots:
        return None
    if len(bounds) == 2:
        # one class: the classic uniform plan (no shuffle machinery)
        return plan_winell(rows, cols, np.asarray(vals), n, padded_size,
                           dtype, min_fill=0.0)

    newpos = np.empty(nb, np.int64)
    newpos[order] = np.arange(nb)
    new_r = newpos[rows // 1024] * 1024 + rows % 1024
    cols = np.asarray(cols, np.int64)
    vals = np.asarray(vals)
    classes = []
    for i in range(len(bounds) - 1):
        lo, hi = bounds[i] * 1024, bounds[i + 1] * 1024
        sel = (new_r >= lo) & (new_r < hi)
        plan_c = plan_winell(
            new_r[sel] - lo, cols[sel], vals[sel], hi - lo, hi - lo,
            dtype, min_fill=0.0, n_win=N0,
        )
        if plan_c is None:
            return None
        classes.append((bounds[i + 1] - bounds[i], plan_c))
    return {
        "classes": classes,
        "block_src": order.astype(np.int32),
        "newpos": newpos.astype(np.int32),
        "nb": nb,
    }


class SlicedWinEllOperator:
    """y = A @ x on per-degree-class windowed-gather plans (single piece).
    See :func:`plan_winell_classes`."""

    def __init__(
        self,
        matrix,
        partition: BlockPartition,
        options: SolverOptions = DEFAULT_OPTIONS,
        plan: Optional[dict] = None,
    ):
        if partition.num_pieces != 1:
            raise ValueError("SlicedWinEllOperator is single-piece only")
        self.matrix = matrix
        self.partition = partition
        self.options = options
        dtype = np.dtype(options.entry_dtype)
        if plan is None:
            plan = plan_winell_classes(
                matrix.rows, matrix.cols, np.asarray(matrix.vals),
                matrix.n_range, partition.padded_size, dtype,
            )
        if plan is None or "classes" not in plan:
            raise ValueError("matrix is not sliced-winell eligible")
        self._nb = plan["nb"]
        self._class_meta = tuple(
            (nb_c, p["window_rows"]) for nb_c, p in plan["classes"]
        )
        self._N = max(p["N"] for _, p in plan["classes"])
        self.class_arrays = tuple(
            (jnp.asarray(p["wstart"]), jnp.asarray(p["cols"]),
             jnp.asarray(p["vals"]))
            for _, p in plan["classes"]
        )
        self.newpos = jnp.asarray(plan["newpos"])
        self.row_length = float(
            sum(nb_c * p["row_length"] for nb_c, p in plan["classes"])
            / max(plan["nb"], 1)
        )
        self._interpret = jax.default_backend() == "cpu"
        self._transpose_op = None

    @property
    def n_domain(self) -> int:
        return self.matrix.n_domain

    @property
    def n_range(self) -> int:
        return self.matrix.n_range

    def nnz(self) -> int:
        return self.matrix.n_kernel

    @property
    def supports_matvec_dot(self) -> bool:
        return False

    @property
    def uses_pallas(self) -> bool:
        return True

    def device_state(self):
        return (self.class_arrays, self.newpos)

    def set_device_state(self, state) -> None:
        self.class_arrays, self.newpos = state

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        P = self.partition.padded_size
        xp = x.reshape(-1)
        if self._N != P:
            xp = jnp.pad(xp, (0, self._N - P))
        x2d = xp.reshape(-1, 128)
        parts = []
        for (nb_c, KR), (ws, pc, pv) in zip(self._class_meta,
                                            self.class_arrays):
            y_c = winell_spmv(
                x2d, ws, pc, pv, window_rows=KR,
                interpret=self._interpret,
            ).reshape(-1)
            parts.append(y_c[: nb_c * 1024])
        y_shuf = jnp.concatenate(parts)
        # un-shuffle the 1024-row blocks (one row-gather pass)
        y = y_shuf.reshape(self._nb, 1024)[self.newpos].reshape(-1)
        return y[:P]

    def matvec_add(self, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        return y + self.matvec(x)

    def transpose(self) -> "SlicedWinEllOperator":
        if self._transpose_op is None:

            class _Swapped:
                def __init__(s, m):
                    s.rows, s.cols, s.vals = m.cols, m.rows, m.vals
                    s.n_domain, s.n_range = m.n_range, m.n_domain
                    s.n_kernel = m.n_kernel

            self._transpose_op = SlicedWinEllOperator(
                _Swapped(self.matrix), self.partition, self.options
            )
        return self._transpose_op

    def rmatvec(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.transpose().matvec(x)
