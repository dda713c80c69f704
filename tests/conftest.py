"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The environment's sitecustomize registers a remote-TPU (axon) PJRT
plugin and forces jax_platforms via jax.config, so plain env vars are
not enough — we must override the config after import, before any
backend is initialised.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_DIR = pathlib.Path("/root/reference")
FIXTURE_DIR = REFERENCE_DIR / "src" / "test"
READS_DIR = REFERENCE_DIR / "reads"


@pytest.fixture(scope="session")
def fixture_dir():
    if not FIXTURE_DIR.is_dir():
        pytest.skip("reference fixtures not mounted")
    return FIXTURE_DIR


@pytest.fixture(scope="session")
def reads_dir():
    if not READS_DIR.is_dir():
        pytest.skip("reference reads not mounted")
    return READS_DIR
