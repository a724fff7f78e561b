"""NumPy Krylov prototypes — research sketches kept as cross-check oracles.

Functional parity with the reference's ``scripts/krylov.py`` (reference:
scripts/krylov.py:5-93): a plain CG and a fused "double CG" that advances two
CG iterations per loop trip using three matvecs (A p, A r, A q) and the
search-direction recurrence

    p_{k+1} = r_{k+1} + beta_k p_k
    => A p_{k+1} = A r_k - alpha_k A q_k + beta_k A p_k

so the second half-step needs no new sparse matvec of p.  This is the seed of
an s-step / communication-avoiding CG: per trip, the three matvecs and the
dot products can be batched, halving the number of reduction latencies per
solution update at the cost of one extra matvec per two iterations.

These run in fp64 on the host and serve as oracles for the device solvers
(tests/test_13_krylov_prototypes.py checks both reproduce the golden
residual trajectory).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def cg(A, b, x0, num_iterations: int) -> Tuple[np.ndarray, List[float]]:
    """Plain CG; returns (x, residual-norm² history including iteration 0)."""
    x = np.array(x0, dtype=np.float64)
    r = b - A @ x
    p = r.copy()
    rr = float(r @ r)
    history = [rr]
    for _ in range(num_iterations):
        q = A @ p
        alpha = rr / float(p @ q)
        x += alpha * p
        r -= alpha * q
        rr_new = float(r @ r)
        history.append(rr_new)
        p = r + (rr_new / rr) * p
        rr = rr_new
    return x, history


def double_cg(A, b, x0, num_iterations: int) -> Tuple[np.ndarray, List[float]]:
    """Two CG iterations per trip with 3 matvecs (A p, A r, A q).

    Identical iterates to :func:`cg` in exact arithmetic; in floating point
    the q-recurrence introduces O(eps) drift, which is why the reference left
    it as a sketch.  ``num_iterations`` is rounded up to even.
    """
    x = np.array(x0, dtype=np.float64)
    r = b - A @ x
    p = r.copy()
    rr = float(r @ r)
    history = [rr]
    for _ in range((num_iterations + 1) // 2):
        q = A @ p
        Ar = A @ r
        Aq = A @ q
        # first half-step
        alpha = rr / float(p @ q)
        x += alpha * p
        r -= alpha * q
        rr_new = float(r @ r)
        history.append(rr_new)
        beta = rr_new / rr
        p = r + beta * p
        # reconstruct A p_new without a fourth matvec
        q = Ar - alpha * Aq + beta * q
        # second half-step
        alpha2 = rr_new / float(p @ q)
        x += alpha2 * p
        r -= alpha2 * q
        rr2 = float(r @ r)
        history.append(rr2)
        p = r + (rr2 / rr_new) * p
        rr = rr2
    return x, history


def _demo() -> None:
    n = 100
    A = (
        2.0 * np.eye(n)
        - np.eye(n, k=1)
        - np.eye(n, k=-1)
    )
    b = np.ones(n)
    x0 = np.zeros(n)
    _, h1 = cg(A, b, x0, 10)
    _, h2 = double_cg(A, b, x0, 10)
    print("cg       :", [round(v) for v in h1])
    print("double_cg:", [round(v) for v in h2])


if __name__ == "__main__":
    _demo()
