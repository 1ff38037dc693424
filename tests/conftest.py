"""Test config: force an 8-device CPU mesh before the CPU client initializes.

The environment may pre-register a TPU platform (and pre-import jax) via
sitecustomize, so setting JAX_PLATFORMS in the environment is not enough:
flip the platform through jax.config before any computation runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import pytest

from tests.synthetic import make_blob_container


@pytest.fixture(scope="session")
def blob_container_2d(tmp_path_factory):
    """Synthetic 2D zarr container with train/validate/gt datasets."""
    path = tmp_path_factory.mktemp("data") / "test_data.zarr"
    make_blob_container(path, num_samples=2, size=128, ndim=2, seed=7)
    return path


@pytest.fixture(scope="session")
def blob_container_3d(tmp_path_factory):
    path = tmp_path_factory.mktemp("data3d") / "test_data_3d.zarr"
    make_blob_container(path, num_samples=1, size=48, ndim=3, seed=3)
    return path
