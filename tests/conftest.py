"""Test configuration: CPU backend with 8 virtual devices + fp64.

The reference tests multi-node behavior with real ``jsrun`` launches on LLNL
machines (reference: test_all.py:136-161); our stand-in is an 8-device
virtual CPU mesh (``--xla_force_host_platform_device_count=8``), which
exercises the full SPMD sharding/ppermute code paths without TPU hardware.
fp64 is enabled because the golden CG trajectories are exact-integer doubles
(reference: test_all.py:130-133).

These env vars must be set before jax initializes its backends, hence here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Force CPU: the session environment presets JAX_PLATFORMS=axon (TPU) and a
# sitecustomize imports jax at interpreter startup, so the env var alone is
# captured too early — update the live jax config instead (legal as long as
# no backend has been initialized yet).  The golden tests need fp64 + 8
# virtual devices, which only CPU provides.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest


@pytest.fixture
def mesh4():
    """4-shard mesh — the reference tests' piece count (Test05: -vp 4)."""
    from legionsolvers_tpu.parallel.mesh import make_mesh

    return make_mesh(4)


@pytest.fixture
def mesh8():
    from legionsolvers_tpu.parallel.mesh import make_mesh

    return make_mesh(8)
