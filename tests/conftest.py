"""Test configuration: run everything on a virtual 8-device CPU mesh so the
suite is hermetic (no TPU needed) and the multi-chip sharding paths are
exercised the same way the driver's dryrun does.

Note: this environment's sitecustomize registers the remote 'axon' TPU
backend at interpreter start; the env var alone doesn't stick, so we also
force the platform through jax.config before any backend is initialized.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (heavy full-pipeline shapes; the host "
             "has one CPU core, so these dominate suite wall time)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy full-pipeline test, skipped unless --runslow")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow (run with --runslow)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
