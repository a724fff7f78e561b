"""Scalar (deferred future) arithmetic — analog of reference Test01
(reference: test/Test01ScalarOperations.cpp:17-32: asserts the future-algebra
identity evaluates exactly) plus the get_alpha future-ratio protocol
(reference: LegionUtilities.cpp:72-97)."""

import jax.numpy as jnp
import pytest

from legionsolvers_tpu import Scalar, alpha_from_scalars


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_scalar_identity(dtype):
    # (x + y) / (x + x) - x == 1 with x = 0.5, y = 1.5 (exact in binary fp)
    x = Scalar(jnp.asarray(0.5, dtype))
    y = Scalar(jnp.asarray(1.5, dtype))
    v = (x + y) / (x + x) - x
    assert v.get_value() == 1.5
    w = (x + y) / (x + x) - (x + x)
    assert w.get_value() == 1.0


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_scalar_ops(dtype):
    a = Scalar(jnp.asarray(9.0, dtype))
    b = Scalar(jnp.asarray(2.0, dtype))
    assert (a * b).get_value() == 18.0
    assert (a - b).get_value() == 7.0
    assert (-a).get_value() == -9.0
    assert a.sqrt().get_value() == 3.0
    assert Scalar(jnp.asarray(4.0, dtype)).rsqrt().get_value() == 0.5
    assert (1 + a).get_value() == 10.0
    assert (1 / b).get_value() == 0.5


def test_alpha_protocol():
    s = [Scalar(v) for v in (6.0, 4.0, 3.0, 2.0)]
    assert float(alpha_from_scalars([])) == 1.0
    assert float(alpha_from_scalars(s[:1])) == 6.0
    assert float(alpha_from_scalars(s[:2])) == 1.5
    assert float(alpha_from_scalars(s[:3])) == 8.0
    assert float(alpha_from_scalars(s[:4])) == 4.0
    with pytest.raises(ValueError):
        alpha_from_scalars(s + s)
