"""RequestGate/RequestRelay unit tests (role of the reference's
tests/async_engine/test_request_tracker.py, against this build's
single-loop gate design)."""
import asyncio

import pytest

from vllm_splitwise_tpu.engine.async_llm_engine import RequestGate
from vllm_splitwise_tpu.outputs import CompletionOutput, RequestOutput


def make_output(request_id, finished=False):
    return RequestOutput(request_id, "p", [1], None, [
        CompletionOutput(0, "x", [2], 0.0, None,
                         "stop" if finished else None)
    ], finished)


def test_request_gate():
    async def scenario():
        gate = RequestGate()
        relay_1 = gate.submit("1")
        assert gate._wakeup.is_set()
        submits, cancels = gate.drain()
        assert not gate._wakeup.is_set()
        assert [s["request_id"] for s in submits] == ["1"]
        assert not cancels
        assert not relay_1.finished

        gate.submit("2")
        gate.submit("3")
        submits, cancels = gate.drain()
        assert len(submits) == 2

        with pytest.raises(KeyError):
            gate.submit("1")

        # Cancel 1 (already drained): the engine must hear about it and
        # the relay closes.
        gate.cancel("1")
        submits, cancels = gate.drain()
        assert "1" in cancels
        assert not submits
        assert relay_1.finished

        # Submitted then cancelled before any drain: vanishes entirely —
        # the engine never sees it.
        relay_4 = gate.submit("4")
        gate.cancel("4")
        submits, cancels = gate.drain()
        assert not submits
        assert not cancels
        assert relay_4.finished

        # A finished engine output closes and unregisters the relay.
        relay_5 = gate.submit("5")
        gate.drain()
        gate.deliver(make_output("5", finished=True))
        assert relay_5.finished
        assert "5" not in gate

        # Cancelling twice (or after finish) is a no-op.
        gate.cancel("5")
        submits, cancels = gate.drain()
        assert not cancels

    asyncio.run(scenario())


def test_relay_iteration():
    async def scenario():
        gate = RequestGate()
        relay = gate.submit("r")
        gate.drain()

        gate.deliver(make_output("r"))
        gate.deliver(make_output("r", finished=True))

        outs = []
        async for out in relay:
            outs.append(out)
        assert len(outs) == 2
        assert outs[-1].finished

    asyncio.run(scenario())


def test_relay_error_propagation():
    async def scenario():
        gate = RequestGate()
        relay = gate.submit("r")
        gate.drain()
        gate.fail("r", ValueError("boom"))
        with pytest.raises(ValueError):
            async for _ in relay:
                pass
        # fail_all on a fresh gate closes every live relay.
        r1, r2 = gate.submit("a"), gate.submit("b")
        gate.fail_all(RuntimeError("dead"))
        for r in (r1, r2):
            with pytest.raises(RuntimeError):
                async for _ in r:
                    pass

    asyncio.run(scenario())
