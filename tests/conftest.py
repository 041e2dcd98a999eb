"""Test harness config.

Tests run on the CPU backend with 8 virtual devices, so multi-chip sharding
logic is exercised without TPU hardware (the analog of the reference testing
dask paths on the local threaded scheduler, reference fixtures.py:8-17).
Set XHIST_TEST_PLATFORM=tpu to run the suite against real hardware.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

if os.environ.get("XHIST_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
