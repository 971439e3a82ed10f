"""Test configuration: force an 8-device virtual CPU mesh before jax import.

Multi-chip sharding is validated on virtual CPU devices
(xla_force_host_platform_device_count=8) since tests must run without TPU
hardware; bench.py is the TPU entrypoint.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the image presets JAX_PLATFORMS=axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib
import sys

import numpy as np
import pytest

# persistent XLA compilation cache: repeated test runs skip recompiles
import jax

# a pytest entry-point plugin imports jax before this conftest runs, so the
# env var alone is too late; jax.config still works until a backend is used
jax.config.update("jax_platforms", "cpu")

_CACHE_DIR = "/tmp/jax_cache"
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

REFERENCE_ROOT = pathlib.Path("/root/reference")


def has_reference() -> bool:
    return REFERENCE_ROOT.exists()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(7)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "reference: tests that compare against the PyTorch reference at /root/reference",
    )
    config.addinivalue_line("markers", "slow: long-running tests")


def pytest_collection_modifyitems(config, items):
    if has_reference():
        return
    skip = pytest.mark.skip(reason="/root/reference not available")
    for item in items:
        if "reference" in item.keywords:
            item.add_marker(skip)
