"""Distributed (block-sharded) vectors.

TPU-native analog of the reference's ``PartitionedVector<T>``
(reference: PartitionedVector.hpp:13-134, PartitionedVector.cpp).  Where the
reference owns a Legion logical region + disjoint/complete index partition and
issues index launches per op, a :class:`PartitionedVector` here owns one
padded ``jax.Array`` sharded block-wise over the solver mesh's shard axis; the
ops delegate to :mod:`legionsolvers_tpu.ops.blas1` and stay fully inside jit
traces (the analog of the reference's never-blocking future discipline).

The object is mutable in the imperative style of the reference API
(``v.axpy(alpha, x)`` rebinds ``v``'s data) *and* a registered pytree, so it
can flow through ``jax.jit`` / ``lax.scan`` as a functional value.  Solver
inner loops use the raw arrays through the planner's functional state.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..options import SHARD_AXIS, SolverOptions, DEFAULT_OPTIONS
from ..ops import blas1
from .partition import BlockPartition
from .scalar import Scalar, alpha_from_scalars

AlphaLike = Union[int, float, jnp.ndarray, Scalar]


def _resolve_alpha(args: Sequence[AlphaLike]) -> jnp.ndarray:
    """Accept either one direct coefficient or the reference's 1-4 scalar
    future-ratio protocol (reference: PartitionedVector.cpp:211-333 passes
    1/2/3 futures to the leaf; get_alpha combines them)."""
    if len(args) == 1 and not isinstance(args[0], Scalar):
        return jnp.asarray(args[0])
    return alpha_from_scalars([a if isinstance(a, Scalar) else Scalar(a) for a in args])


@jax.tree_util.register_pytree_node_class
class PartitionedVector:
    """A named, block-partitioned vector of true length ``n`` stored padded to
    ``partition.padded_size`` with zeros in the padding slots."""

    def __init__(
        self,
        name: str,
        partition: BlockPartition,
        mesh: Optional[Mesh] = None,
        data: Optional[jnp.ndarray] = None,
        options: SolverOptions = DEFAULT_OPTIONS,
    ):
        self.name = name
        self.partition = partition
        self.mesh = mesh
        self.options = options
        if data is None:
            data = jnp.zeros(partition.padded_size, dtype=options.entry_dtype)
            if mesh is not None:
                data = jax.device_put(data, NamedSharding(mesh, P(SHARD_AXIS)))
        self.data = data

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return (self.data,), (self.name, self.partition, self.mesh, self.options)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        name, partition, mesh, options = aux
        return cls(name, partition, mesh=mesh, data=leaves[0], options=options)

    # -- construction helpers ----------------------------------------------
    @property
    def n(self) -> int:
        return self.partition.n

    @property
    def sharding(self) -> Optional[NamedSharding]:
        return NamedSharding(self.mesh, P(SHARD_AXIS)) if self.mesh else None

    def like(self, name: str) -> "PartitionedVector":
        """Fresh zero vector over the same partition/mesh (the analog of
        allocating another field over the same index partition)."""
        return PartitionedVector(
            name, self.partition, mesh=self.mesh, options=self.options
        )

    @classmethod
    def from_array(
        cls,
        name: str,
        values: np.ndarray,
        partition: BlockPartition,
        mesh: Optional[Mesh] = None,
        options: SolverOptions = DEFAULT_OPTIONS,
    ) -> "PartitionedVector":
        """Build from a host array of length ``n`` (pads + shards)."""
        values = np.asarray(values)
        if values.shape != (partition.n,):
            raise ValueError(f"expected shape ({partition.n},), got {values.shape}")
        padded = np.zeros(partition.padded_size, dtype=options.entry_dtype)
        padded[: partition.n] = values
        data = jnp.asarray(padded)
        if mesh is not None:
            data = jax.device_put(data, NamedSharding(mesh, P(SHARD_AXIS)))
        return cls(name, partition, mesh=mesh, data=data, options=options)

    # -- fills (reference: PartitionedVector.cpp:151-172) -------------------
    def constant_fill(self, value) -> "PartitionedVector":
        self.data = blas1.masked_fill(self.data, value, self.n)
        return self

    def zero_fill(self) -> "PartitionedVector":
        self.data = jnp.zeros_like(self.data)
        return self

    def random_fill(self, key=None, lo=0.0, hi=1.0) -> "PartitionedVector":
        """Uniform fill (reference: RandomFillTask, UtilityTasks.cpp:128-166)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        vals = jax.random.uniform(
            key, (self.partition.padded_size,), dtype=self.data.dtype,
            minval=lo, maxval=hi,
        )
        mask = jnp.arange(vals.shape[0]) < self.n
        vals = jnp.where(mask, vals, 0)
        if self.mesh is not None:
            vals = jax.lax.with_sharding_constraint(vals, self.sharding)
        self.data = vals
        return self

    # -- copy (reference: operator=, PartitionedVector.cpp:176-191) ---------
    def assign(self, other: "PartitionedVector") -> "PartitionedVector":
        if other.partition != self.partition:
            raise ValueError("assign requires identical partitions")
        self.data = other.data
        return self

    def copy(self, name: Optional[str] = None) -> "PartitionedVector":
        return PartitionedVector(
            name or self.name,
            self.partition,
            mesh=self.mesh,
            data=self.data,
            options=self.options,
        )

    # -- BLAS-1 (reference: PartitionedVector.cpp:196-358) ------------------
    def scal(self, *alpha: AlphaLike) -> "PartitionedVector":
        self.data = blas1.scal(_resolve_alpha(alpha), self.data)
        return self

    def axpy(self, *args) -> "PartitionedVector":
        """axpy(alpha..., x): self += alpha * x, where ``alpha...`` is either a
        direct coefficient or 1-3 Scalars under the future-ratio protocol
        (reference: PartitionedVector.cpp:211-284)."""
        *alpha, x = args
        self.data = blas1.axpy(self.data, _resolve_alpha(alpha), x.data)
        return self

    def xpay(self, *args) -> "PartitionedVector":
        """xpay(alpha..., x): self = x + alpha * self
        (reference: PartitionedVector.cpp:288-333)."""
        *alpha, x = args
        self.data = blas1.xpay(self.data, _resolve_alpha(alpha), x.data)
        return self

    def dot(self, other: "PartitionedVector") -> Scalar:
        """<self, other> as a deferred Scalar (reference:
        PartitionedVector.cpp:337-358)."""
        return Scalar(blas1.dot(self.data, other.data))

    def norm2(self) -> Scalar:
        return Scalar(blas1.norm2(self.data))

    # -- materialization ----------------------------------------------------
    def to_numpy(self) -> np.ndarray:
        """Gather the true (unpadded) values to the host."""
        return np.asarray(self.data)[: self.n]

    def print(self) -> None:
        """Debug dump (reference: PrintVectorTask path)."""
        print(f"[legionsolvers] vector {self.name}: {self.to_numpy()}")

    def __repr__(self) -> str:
        return (
            f"PartitionedVector({self.name!r}, n={self.n}, "
            f"pieces={self.partition.num_pieces})"
        )
