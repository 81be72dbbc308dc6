"""Spec-based KV-cache sizing (worker fallback when the backend exposes
no memory stats — the axon-tunnel path).

Regression: "TPU v5 lite" must resolve to 16 GiB, not fall through to
the "TPU v5" (v5p, 95 GiB) prefix and massively over-allocate.
"""
import types

import pytest

from vllm_splitwise_tpu.worker.worker import Worker


class _FakeDevice:
    def __init__(self, kind):
        self.device_kind = kind
        self.platform = "tpu"


class _FakeRunner:
    params = {}


def _estimate(kind, block_bytes=1 << 20, util=0.9):
    w = object.__new__(Worker)
    w.mesh = None
    w.model_runner = _FakeRunner()
    fake = _FakeDevice(kind)
    # Bypass the mesh/jax.devices() property.
    w_cls = type("W", (Worker, ), {"device": property(lambda self: fake)})
    w.__class__ = w_cls
    return w._estimate_blocks_from_specs(util, block_bytes, num_host=0)


@pytest.mark.parametrize("kind,gib", [
    ("TPU v5 lite", 16),
    ("TPU v5e", 16),
    ("TPU v5p", 95),
    ("TPU v4", 32),
    ("TPU v6 lite", 32),
])
def test_longest_prefix_wins(kind, gib):
    block_bytes = 1 << 20
    num_device, _ = _estimate(kind, block_bytes)
    total = gib * (1 << 30)
    expected = int(total * 0.9 - 0.08 * total) // block_bytes
    assert num_device == expected


def test_unknown_kind_defaults_to_16gib():
    num_device, _ = _estimate("TPU v99 mega")
    total = 16 * (1 << 30)
    assert num_device == int(total * 0.9 - 0.08 * total) // (1 << 20)
