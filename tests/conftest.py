"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that sharding/collective code
paths are exercised without TPU hardware (Pallas kernels run in interpret
mode on CPU).  Set VST_TEST_REAL_TPU=1 to run on real devices instead.
"""
import os

if os.environ.get("VST_TEST_REAL_TPU", "0") != "1":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


@pytest.fixture
def example_prompts():
    return [
        "Hello, my name is",
        "The president of the United States is",
        "The capital of France is",
        "The future of AI is",
    ]
