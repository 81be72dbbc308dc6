"""RequestTracker unit tests (reference pattern:
tests/async_engine/test_request_tracker.py)."""
import asyncio

import pytest

from vllm_splitwise_tpu.engine.async_llm_engine import RequestTracker
from vllm_splitwise_tpu.outputs import CompletionOutput, RequestOutput


def make_output(request_id, finished=False):
    return RequestOutput(request_id, "p", [1], None, [
        CompletionOutput(0, "x", [2], 0.0, None,
                         "stop" if finished else None)
    ], finished)


def test_request_tracker():
    async def scenario():
        tracker = RequestTracker()
        tracker.init_event()
        stream_1 = tracker.add_request("1")
        assert tracker.new_requests_event.is_set()
        new, finished = tracker.get_new_and_finished_requests()
        assert not tracker.new_requests_event.is_set()
        assert len(new) == 1
        assert new[0]["request_id"] == "1"
        assert not finished
        assert not stream_1.finished

        stream_2 = tracker.add_request("2")
        stream_3 = tracker.add_request("3")
        new, finished = tracker.get_new_and_finished_requests()
        assert len(new) == 2

        with pytest.raises(KeyError):
            tracker.add_request("1")

        # Abort 1; it should be reported finished and its stream closed.
        tracker.abort_request("1")
        new, finished = tracker.get_new_and_finished_requests()
        assert "1" in finished
        assert not new
        assert stream_1.finished

        # Request added then aborted before the engine saw it: surfaced in
        # finished and never in new.
        stream_4 = tracker.add_request("4")
        tracker.abort_request("4")
        new, finished = tracker.get_new_and_finished_requests()
        assert "4" in finished
        assert not new
        assert stream_4.finished

        # Finished engine output closes the stream.
        stream_5 = tracker.add_request("5")
        tracker.get_new_and_finished_requests()
        tracker.process_request_output(make_output("5", finished=True))
        new, finished = tracker.get_new_and_finished_requests()
        assert "5" in finished
        assert stream_5.finished

    asyncio.run(scenario())


def test_stream_iteration():
    async def scenario():
        tracker = RequestTracker()
        tracker.init_event()
        stream = tracker.add_request("r")
        tracker.get_new_and_finished_requests()

        tracker.process_request_output(make_output("r"))
        tracker.process_request_output(make_output("r", finished=True))

        outs = []
        async for out in stream:
            outs.append(out)
        assert len(outs) == 2
        assert outs[-1].finished

    asyncio.run(scenario())
