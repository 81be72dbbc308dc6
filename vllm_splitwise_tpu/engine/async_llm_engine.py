"""Async serving engine: a background pump task + per-request relays.

Role parity with the reference's ``vllm/engine/async_llm_engine.py``
(request intake, background step loop, per-token streaming, dead-engine
propagation), rebuilt around the fact that everything here runs on ONE
asyncio event loop:

* Handlers and the pump share the loop, so intake needs no cross-thread
  queues — :class:`RequestGate` is plain dicts/lists swapped under the
  loop's single-thread guarantee, with one ``asyncio.Event`` to wake an
  idle pump.
* Each request gets a :class:`RequestRelay`: a tiny output channel the
  pump pushes ``RequestOutput`` s into and the HTTP handler async-iterates.
* A request cancelled before the pump ever drained it simply vanishes —
  the engine never hears about it (the reference routes this through a
  finished-set handshake instead).

The device step itself is awaited through the executor
(``execute_model_async``), which hands XLA dispatch to a thread so the
loop stays responsive while the TPU runs.
"""
from __future__ import annotations

import asyncio
import time
from typing import (AsyncIterator, Dict, List, Optional, Set, Tuple, Type,
                    Union)

from vllm_splitwise_tpu.config import ModelConfig
from vllm_splitwise_tpu.engine.arg_utils import AsyncEngineArgs
from vllm_splitwise_tpu.engine.llm_engine import LLMEngine
from vllm_splitwise_tpu.logger import init_logger
from vllm_splitwise_tpu.outputs import RequestOutput
from vllm_splitwise_tpu.sampling_params import SamplingParams

logger = init_logger(__name__)


class AsyncEngineDeadError(RuntimeError):
    """The background pump died; every open request gets this."""


_CLOSED = object()  # relay sentinel


class RequestRelay:
    """Output channel for one request: pump writes, handler iterates."""

    __slots__ = ("request_id", "_chan", "_closed")

    def __init__(self, request_id: str) -> None:
        self.request_id = request_id
        self._chan: asyncio.Queue = asyncio.Queue()
        self._closed = False

    def push(self, out: RequestOutput) -> None:
        if not self._closed:
            self._chan.put_nowait(out)

    def fail(self, exc: BaseException) -> None:
        if not self._closed:
            self._chan.put_nowait(exc)

    def close(self) -> None:
        if not self._closed:
            self._closed = True
            self._chan.put_nowait(_CLOSED)

    @property
    def finished(self) -> bool:
        return self._closed

    def __aiter__(self) -> "RequestRelay":
        return self

    async def __anext__(self) -> RequestOutput:
        item = await self._chan.get()
        if item is _CLOSED:
            raise StopAsyncIteration
        if isinstance(item, BaseException):
            raise item
        return item


class RequestGate:
    """Intake/abort ledger between handlers and the pump.

    Not thread-safe, deliberately: every mutation happens on the event
    loop.  ``drain()`` hands the pump everything submitted or cancelled
    since the last drain; ``wait()`` parks an idle pump until there is
    work.
    """

    def __init__(self) -> None:
        self._live: Dict[str, RequestRelay] = {}
        self._submits: List[dict] = []
        self._cancels: Set[str] = set()
        self._wakeup = asyncio.Event()

    def __contains__(self, request_id: str) -> bool:
        return request_id in self._live

    # ---- handler side ----

    def submit(self, request_id: str, **engine_kwargs) -> RequestRelay:
        if request_id in self._live:
            raise KeyError(f"Request {request_id} already exists.")
        relay = RequestRelay(request_id)
        self._live[request_id] = relay
        self._submits.append({"request_id": request_id, **engine_kwargs})
        self._wakeup.set()
        return relay

    def cancel(self, request_id: str, *, verbose: bool = False) -> None:
        """Idempotent: close the relay and, if the engine already saw the
        request, schedule an engine-side abort."""
        relay = self._live.pop(request_id, None)
        if relay is None:
            return
        if verbose:
            logger.info("Aborted request %s.", request_id)
        for i, spec in enumerate(self._submits):
            if spec["request_id"] == request_id:
                # Never reached the engine; make it vanish.
                del self._submits[i]
                break
        else:
            self._cancels.add(request_id)
            self._wakeup.set()
        relay.close()

    # ---- pump side ----

    def drain(self) -> Tuple[List[dict], Set[str]]:
        submits, self._submits = self._submits, []
        cancels, self._cancels = self._cancels, set()
        self._wakeup.clear()
        return submits, cancels

    async def wait(self) -> None:
        await self._wakeup.wait()

    def deliver(self, out: RequestOutput, *, verbose: bool = False) -> None:
        relay = self._live.get(out.request_id)
        if relay is None:
            return  # cancelled mid-flight
        relay.push(out)
        if out.finished:
            if verbose:
                logger.info("Finished request %s.", out.request_id)
            del self._live[out.request_id]
            relay.close()

    def fail(self, request_id: str, exc: BaseException) -> None:
        relay = self._live.pop(request_id, None)
        if relay is not None:
            relay.fail(exc)
            relay.close()

    def fail_all(self, exc: BaseException) -> None:
        for relay in self._live.values():
            relay.fail(exc)
            relay.close()
        self._live.clear()


class _AsyncLLMEngine(LLMEngine):
    """LLMEngine whose step awaits the executor instead of blocking."""

    async def step_async(self) -> List[RequestOutput]:
        if getattr(self.executor, "execute_dual_deferred", None) \
                is not None:
            # Pipelined mixed step (--pipeline-decode): the whole
            # schedule→dispatch→reconcile cycle runs off the event loop;
            # the in-flight window overlaps it with device compute.
            return await asyncio.get_running_loop().run_in_executor(
                None, self._step_mixed_pipelined)
        if getattr(self.executor, "execute_dual", None) is not None:
            return await self._step_splitwise_async()
        metadata, plan = self.scheduler.schedule()
        if plan.is_empty():
            outputs = []
        else:
            outputs = await self.executor.execute_model_async(
                metadata,
                plan.blocks_to_swap_in,
                plan.blocks_to_swap_out,
                plan.blocks_to_copy,
                plan.blocks_to_nw,
                num_decode_steps=plan.num_decode_steps,
            )
        if plan.num_decode_steps > 1:
            return self._process_multi_step_outputs(outputs, plan)
        return self._process_model_outputs(outputs, plan)

    async def _step_splitwise_async(self) -> List[RequestOutput]:
        """Dual-pool step (see LLMEngine._step_splitwise), dispatched off
        the event loop."""
        ((decode_meta, decode_sched),
         (prompt_meta, prompt_sched)) = self.scheduler.schedule_splitwise()
        if decode_sched.is_empty() and prompt_sched.is_empty() \
                and not prompt_sched.ignored_seq_groups:
            return self._process_model_outputs([], decode_sched)
        loop = asyncio.get_running_loop()
        prompt_output, decode_output = await loop.run_in_executor(
            None, lambda: self.executor.execute_dual(
                prompt_meta, prompt_sched.blocks_to_nw,
                decode_meta, decode_sched.blocks_to_swap_in,
                decode_sched.blocks_to_swap_out,
                decode_sched.blocks_to_copy, decode_sched.blocks_to_nw,
                num_decode_steps=decode_sched.num_decode_steps))
        return self._finish_splitwise_step(decode_sched, decode_output,
                                           prompt_sched, prompt_output)

    async def add_request_async(self, request_id: str, prompt: Optional[str],
                                sampling_params: SamplingParams,
                                prompt_token_ids: Optional[List[int]] = None,
                                arrival_time: Optional[float] = None,
                                lora_request=None) -> None:
        token_ids = self.encode_request(request_id, prompt, prompt_token_ids,
                                        lora_request)
        self.add_request(request_id, prompt, sampling_params, token_ids,
                         arrival_time if arrival_time is not None
                         else time.time(), lora_request)

    async def check_health_async(self) -> None:
        await self.executor.check_health_async()


class AsyncLLMEngine:
    """The user-facing async engine; serving front ends build on this."""

    _engine_class: Type[_AsyncLLMEngine] = _AsyncLLMEngine

    def __init__(self, *args, log_requests: bool = True,
                 max_log_len: Optional[int] = None,
                 start_engine_loop: bool = True, **kwargs) -> None:
        self.log_requests = log_requests
        self.max_log_len = max_log_len
        self.start_engine_loop = start_engine_loop
        self.engine = self._init_engine(*args, **kwargs)
        self._gate: Optional[RequestGate] = None
        self._pump: Optional[asyncio.Task] = None
        self._fatal: Optional[BaseException] = None

    @classmethod
    def from_engine_args(cls, engine_args: AsyncEngineArgs,
                         start_engine_loop: bool = True) -> "AsyncLLMEngine":
        configs = engine_args.create_engine_configs()
        parallel_config = configs[2]
        if parallel_config.sep_prompt_token:
            import jax
            if jax.process_count() > 1:
                # Multi-host disaggregation: this (decode) process runs
                # the engine; prefill hosts run PrefillHostServer.
                from vllm_splitwise_tpu.executor.multihost_splitwise import \
                    MultihostSplitwiseExecutor
                executor_class = MultihostSplitwiseExecutor
            else:
                from vllm_splitwise_tpu.executor.splitwise_executor import \
                    SplitwiseExecutor
                executor_class = SplitwiseExecutor
        else:
            from vllm_splitwise_tpu.executor.tpu_executor import TPUExecutor
            executor_class = TPUExecutor
        return cls(*configs,
                   executor_class=executor_class,
                   log_stats=not engine_args.disable_log_stats,
                   log_requests=not engine_args.disable_log_requests,
                   max_log_len=engine_args.max_log_len,
                   start_engine_loop=start_engine_loop)

    def _init_engine(self, *args, **kwargs) -> _AsyncLLMEngine:
        return self._engine_class(*args, **kwargs)

    # ---- pump lifecycle ----

    @property
    def is_running(self) -> bool:
        return self._pump is not None and not self._pump.done()

    @property
    def is_stopped(self) -> bool:
        return self.errored or (self._pump is not None and self._pump.done())

    @property
    def errored(self) -> bool:
        return self._fatal is not None

    def set_errored(self, exc: BaseException) -> None:
        self._fatal = exc

    def start_background_loop(self) -> None:
        if self.errored:
            raise AsyncEngineDeadError(
                "Background loop has errored already.") from self._fatal
        if self.is_running:
            raise RuntimeError("Background loop is already running.")
        self._gate = RequestGate()
        self._pump = asyncio.get_event_loop().create_task(self._run_pump())
        self._pump.add_done_callback(self._on_pump_done)

    def _on_pump_done(self, task: asyncio.Task) -> None:
        try:
            task.result()
            exc: BaseException = AsyncEngineDeadError(
                "Engine pump exited unexpectedly.")
        except asyncio.CancelledError:
            return
        except BaseException as cause:  # noqa: BLE001
            exc = AsyncEngineDeadError(
                "Engine pump died. Inspect the traceback above for the "
                "root cause.")
            exc.__cause__ = cause
        self.set_errored(exc)
        self._gate.fail_all(exc)
        logger.error("AsyncLLMEngine pump terminated", exc_info=exc)

    async def _run_pump(self) -> None:
        busy = False
        while True:
            if not busy:
                await self._gate.wait()
            busy = await self.engine_step()
            # Yield so handlers can enqueue/consume between steps.
            await asyncio.sleep(0)

    async def engine_step(self) -> bool:
        """Drain intake, run one engine step, fan out its outputs.
        Returns whether any request remains in flight."""
        submits, cancels = self._gate.drain()
        for spec in submits:
            try:
                await self.engine.add_request_async(**spec)
            except Exception as exc:  # noqa: BLE001 - per-request fault
                self._gate.fail(spec["request_id"], exc)
                cancels.add(spec["request_id"])
        if cancels:
            self.engine.abort_request(cancels)

        outputs = await self.engine.step_async()
        for out in outputs:
            self._gate.deliver(out, verbose=self.log_requests)
        # Keep pumping while anything is queued or running: a waiting
        # request can produce zero outputs for a step (admission deferred
        # under memory pressure) yet still need future steps.
        return bool(outputs) or self.engine.has_unfinished_requests()

    # ---- request API ----

    async def add_request(self, request_id: str, prompt: Optional[str],
                          sampling_params: SamplingParams,
                          prompt_token_ids: Optional[List[int]] = None,
                          arrival_time: Optional[float] = None,
                          lora_request=None) -> RequestRelay:
        if self.log_requests:
            self._log_arrival(request_id, prompt, prompt_token_ids,
                              sampling_params)
        if not self.is_running:
            if not self.start_engine_loop:
                raise AsyncEngineDeadError(
                    "Background loop is not running. If it exited, the "
                    "traceback above holds the root cause "
                    "(AsyncEngineDeadError).")
            self.start_background_loop()
        return self._gate.submit(
            request_id, prompt=prompt, sampling_params=sampling_params,
            prompt_token_ids=prompt_token_ids, lora_request=lora_request,
            arrival_time=(arrival_time if arrival_time is not None
                          else time.time()))

    def _log_arrival(self, request_id, prompt, prompt_token_ids,
                     sampling_params) -> None:
        cap = self.max_log_len
        if cap is not None:
            prompt = prompt[:cap] if prompt is not None else None
            if prompt_token_ids is not None:
                prompt_token_ids = prompt_token_ids[:cap]
        logger.info("Received request %s: prompt: %r, params: %s, "
                    "prompt_token_ids: %s.", request_id, prompt,
                    sampling_params, prompt_token_ids)

    async def generate(self, prompt: Optional[str],
                       sampling_params: SamplingParams, request_id: str,
                       prompt_token_ids: Optional[List[int]] = None,
                       lora_request=None) -> AsyncIterator[RequestOutput]:
        """Yields RequestOutputs as they are produced for this request."""
        try:
            relay = await self.add_request(request_id, prompt,
                                           sampling_params,
                                           prompt_token_ids=prompt_token_ids,
                                           lora_request=lora_request)
            async for out in relay:
                yield out
        except (Exception, asyncio.CancelledError):
            self._abort(request_id)
            raise

    async def abort(self, request_id: str) -> None:
        if not self.is_running:
            raise AsyncEngineDeadError("Background loop is not running.")
        self._abort(request_id)

    def _abort(self, request_id: str) -> None:
        if self._gate is not None:
            self._gate.cancel(request_id, verbose=self.log_requests)

    # ---- passthroughs ----

    async def get_model_config(self) -> ModelConfig:
        return self.engine.get_model_config()

    async def check_health(self) -> None:
        started = time.perf_counter()
        if self.is_stopped:
            raise AsyncEngineDeadError("Background loop is stopped.")
        await self.engine.check_health_async()
        logger.debug("Health check took %fs",
                     time.perf_counter() - started)

    @property
    def tokenizer(self):
        return self.engine.tokenizer

    async def get_tokenizer(self):
        return self.engine.tokenizer.tokenizer
