"""Test configuration: run JAX on a virtual 8-device CPU mesh with x64.

Mirrors the distributed test strategy in SURVEY §4: sharded results must
match unsharded ones without TPU hardware.

NOTE: this environment's TPU plugin registers itself at interpreter startup
and forces ``jax_platforms="axon,cpu"`` — plain ``JAX_PLATFORMS=cpu`` env
vars are overridden. Steering back to CPU must happen through
``jax.config.update`` before the first backend use, which is what we do here
(conftest runs before any test imports trigger device initialization).
"""

import os

# must precede CPU backend initialization
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# MPASSIT_TEST_TPU=1 keeps the real TPU platform so the
# hardware-only Mosaic lowering tests (skipped on CPU) can run:
#   MPASSIT_TEST_TPU=1 python -m pytest tests/test_pallas_matmul.py -k tpu
if os.environ.get("MPASSIT_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from mpassit_tpu.mesh.synthetic import synthetic_voronoi_mesh  # noqa: E402


@pytest.fixture(scope="session")
def small_mesh():
    return synthetic_voronoi_mesh(ncells=600, nz=4, nsoil=2, seed=3)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(12345)
