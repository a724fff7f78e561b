"""Distributed vector BLAS-1 algebra — analog of reference Test02
(reference: test/Test02VectorOperations.cpp:98-145, 199-214), which builds
axpy/xpay/dot combinations whose result is identically zero and asserts the
final self-dot prints 0 exactly.  We run the same style of exact-zero
identities over a 100-element vector in 4 pieces, both unsharded and sharded
over the virtual CPU mesh, including the future-ratio coefficient protocol."""

import jax.numpy as jnp
import numpy as np
import pytest

from legionsolvers_tpu import BlockPartition, PartitionedVector, Scalar


def make_vectors(mesh):
    # Small random integers: every intermediate below stays an exact integer
    # < 2^24, so all identities cancel exactly in f32 and f64 alike (the same
    # design principle as the reference's exact-zero Test02 combinations).
    part = BlockPartition(100, 4)
    rng = np.random.default_rng(42)
    u = PartitionedVector.from_array(
        "u", rng.integers(-50, 50, 100).astype(float), part, mesh=mesh
    )
    v = PartitionedVector.from_array(
        "v", rng.integers(-50, 50, 100).astype(float), part, mesh=mesh
    )
    return part, u, v


@pytest.mark.parametrize("use_mesh", [False, True])
def test_exact_zero_identity(use_mesh, mesh4):
    mesh = mesh4 if use_mesh else None
    part, u, v = make_vectors(mesh)
    w = u.copy("w")
    # w = u; w += 2v; w += -2v; w += -u  ->  exactly zero (exact fp: the
    # operations cancel term by term, as in the reference's Test02 design)
    w.axpy(2.0, v)
    w.axpy(-2.0, v)
    w.axpy(-1.0, u)
    assert w.dot(w).get_value() == 0.0


@pytest.mark.parametrize("use_mesh", [False, True])
def test_future_ratio_axpy(use_mesh, mesh4):
    mesh = mesh4 if use_mesh else None
    part, u, v = make_vectors(mesh)
    w = u.copy("w")
    num, den = Scalar(3.0), Scalar(2.0)
    w.axpy(num, den, v)            # w += 1.5 v
    w.axpy(-1.5, v)                # cancel
    w.axpy(-1.0, u)
    assert w.dot(w).get_value() == 0.0
    # 3-scalar protocol: (a*b)/c
    w2 = u.copy("w2")
    w2.axpy(Scalar(3.0), Scalar(4.0), Scalar(2.0), v)  # w2 += 6 v
    w2.axpy(-6.0, v)
    w2.axpy(-1.0, u)
    assert w2.dot(w2).get_value() == 0.0


@pytest.mark.parametrize("use_mesh", [False, True])
def test_xpay_scal(use_mesh, mesh4):
    mesh = mesh4 if use_mesh else None
    part, u, v = make_vectors(mesh)
    w = u.copy("w")
    w.xpay(2.0, v)                 # w = v + 2u
    w.axpy(-2.0, u)
    w.axpy(-1.0, v)
    assert w.dot(w).get_value() == 0.0
    z = u.copy("z")
    z.scal(4.0)
    z.axpy(-4.0, u)
    assert z.dot(z).get_value() == 0.0


@pytest.mark.parametrize("use_mesh", [False, True])
def test_fill_and_dot(use_mesh, mesh4):
    mesh = mesh4 if use_mesh else None
    part = BlockPartition(100, 4)
    v = PartitionedVector("v", part, mesh=mesh)
    v.constant_fill(1.0)
    assert v.dot(v).get_value() == 100.0  # padding must not contribute
    v.zero_fill()
    assert v.dot(v).get_value() == 0.0


def test_padding_invariant(mesh4):
    # n = 10 over 4 pieces -> block 3, padded 12; pads must stay zero.
    part = BlockPartition(10, 4)
    v = PartitionedVector("v", part, mesh=mesh4)
    v.constant_fill(2.0)
    assert v.dot(v).get_value() == 40.0
    w = v.copy("w")
    w.axpy(3.0, v)  # w = 8 everywhere real
    assert np.all(np.asarray(w.data)[10:] == 0.0)
    assert w.dot(w).get_value() == 640.0


def test_roundtrip(mesh4):
    part = BlockPartition(17, 4)
    vals = np.arange(17, dtype=np.float64)
    v = PartitionedVector.from_array(
        "v", vals, part, mesh=mesh4,
    )
    np.testing.assert_array_equal(v.to_numpy(), vals)
