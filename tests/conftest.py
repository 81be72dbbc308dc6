"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that sharding/collective code
paths are exercised without TPU hardware (Pallas kernels run in interpret
mode on CPU).  Set VST_TEST_REAL_TPU=1 to run on the real device instead.

NOTE: this machine's axon sitecustomize force-registers the TPU backend
and pins jax_platforms, so plain JAX_PLATFORMS=cpu in the env is not
enough — we must override via jax.config before any backend init.
"""
import os

import pytest

ON_REAL_TPU = os.environ.get("VST_TEST_REAL_TPU", "0") == "1"

if ON_REAL_TPU:
    # The HF-oracle tests assert fp32-tight tolerances (atol~2e-3); the
    # TPU MXU's default f32 matmul path rounds through bf16 passes and
    # misses them.  Force the 6-pass f32 emulation for the test leg —
    # correctness tests measure math, not speed.
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")

if not ON_REAL_TPU:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")


@pytest.fixture
def example_prompts():
    return [
        "Hello, my name is",
        "The president of the United States is",
        "The capital of France is",
        "The future of AI is",
    ]
