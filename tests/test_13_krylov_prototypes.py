"""The numpy Krylov prototypes reproduce the golden CG trajectory.

Reference parity: scripts/krylov.py (cg + double_cg sketches); the golden
residual² sequence is the Test05/Test06 oracle (reference: test_all.py:130-133).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from krylov import cg, double_cg  # noqa: E402

GOLDEN = [100, 3280, 3444, 3612, 3784, 3960, 4140, 4324, 4512, 4704, 4900]
# test_all.py stores it sorted-as-strings; actual iteration order:
GOLDEN_SEQ = [100.0, 4900.0, 4704.0, 4512.0, 4324.0, 4140.0, 3960.0,
              3784.0, 3612.0, 3444.0, 3280.0]


def _laplacian(n):
    return 2.0 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)


def test_cg_golden():
    A = _laplacian(100)
    _, hist = cg(A, np.ones(100), np.zeros(100), 10)
    assert hist == GOLDEN_SEQ


def test_double_cg_matches_cg():
    A = _laplacian(100)
    x1, h1 = cg(A, np.ones(100), np.zeros(100), 10)
    x2, h2 = double_cg(A, np.ones(100), np.zeros(100), 10)
    assert np.allclose(h1, h2, rtol=1e-10)
    assert np.allclose(x1, x2, rtol=1e-10)


def test_double_cg_converges():
    rng = np.random.default_rng(0)
    n = 50
    M = rng.standard_normal((n, n))
    A = M @ M.T + n * np.eye(n)
    b = rng.standard_normal(n)
    x, hist = double_cg(A, b, np.zeros(n), 40)
    assert np.linalg.norm(A @ x - b) < 1e-8 * np.linalg.norm(b)
    assert hist[-1] < 1e-16 * hist[0]
