"""Small shared utilities.

Covers the roles of the reference's ``vllm/utils.py`` (Counter, Device /
WorkerType enums, SeqToSlotMapper, coalesce_blocks, LRU cache, port
discovery) re-expressed for a JAX/TPU single-controller runtime.
"""
from __future__ import annotations

import enum
import socket
import uuid
from collections import OrderedDict
from typing import Dict, Generic, Hashable, List, Optional, Sequence, Tuple, TypeVar

T = TypeVar("T")

# Maximum number of concurrent in-flight KV migrations tracked per
# prefill/decode worker pair.  The reference bounds its per-sequence
# device semaphores the same way (vllm/utils.py:126, MAX_SLOT_IDS=256);
# here a slot indexes a per-request transfer handle rather than a CUDA
# semaphore.
MAX_SLOT_IDS = 256


class Device(enum.Enum):
    TPU = enum.auto()
    CPU = enum.auto()   # host memory (swap space)


class WorkerType(enum.Enum):
    """Role of a worker pool under phase disaggregation.

    Mirrors the reference's PROMPT/TOKEN/MIXED worker typing
    (vllm/utils.py:43): PREFILL workers run prompt phases, DECODE workers
    run token phases, MIXED runs both (no disaggregation).
    """
    PREFILL = enum.auto()
    DECODE = enum.auto()
    MIXED = enum.auto()


class Counter:
    def __init__(self, start: int = 0) -> None:
        self.counter = start

    def __next__(self) -> int:
        i = self.counter
        self.counter += 1
        return i

    def reset(self) -> None:
        self.counter = 0


class LRUCache(Generic[T]):
    """Simple LRU with an eviction hook, used by tokenizer/LoRA caches."""

    def __init__(self, capacity: int):
        self.capacity = capacity
        self.cache: "OrderedDict[Hashable, T]" = OrderedDict()

    def __contains__(self, key: Hashable) -> bool:
        return key in self.cache

    def __len__(self) -> int:
        return len(self.cache)

    def get(self, key: Hashable, default: Optional[T] = None) -> Optional[T]:
        if key in self.cache:
            self.cache.move_to_end(key)
            return self.cache[key]
        return default

    def put(self, key: Hashable, value: T) -> None:
        self.cache[key] = value
        self.cache.move_to_end(key)
        while len(self.cache) > self.capacity:
            k, v = self.cache.popitem(last=False)
            self._on_remove(k, v)

    def remove(self, key: Hashable) -> None:
        if key in self.cache:
            v = self.cache.pop(key)
            self._on_remove(key, v)

    def _on_remove(self, key: Hashable, value: T) -> None:
        pass


class SeqToSlotMapper:
    """Assigns each live sequence a small integer slot id.

    Under phase disaggregation every in-flight sequence needs a stable
    handle that both the prefill and the decode side can name its KV
    migration by (the reference used the slot to index MSCCL++ device
    semaphores, vllm/utils.py:126-161; we use it to index async transfer
    handles).  Slots are recycled on sequence completion.
    """

    def __init__(self, num_slots: int = MAX_SLOT_IDS) -> None:
        self.num_slots = num_slots
        self.free_slots: List[int] = list(range(num_slots))
        self.seq_to_slot: Dict[int, int] = {}

    def set_seq(self, seq_id: int) -> int:
        if not self.free_slots:
            raise RuntimeError(
                f"No free transfer slots (max {self.num_slots} in-flight "
                "sequences under disaggregation)")
        slot = self.free_slots.pop(0)
        self.seq_to_slot[seq_id] = slot
        return slot

    def free_seq(self, seq_id: int) -> None:
        slot = self.seq_to_slot.pop(seq_id)
        self.free_slots.append(slot)

    def get_slot_id(self, seq_id: int) -> int:
        return self.seq_to_slot[seq_id]


def coalesce_blocks(block_ids: Sequence[int]) -> List[Tuple[int, int]]:
    """Merge block ids into (start, num_blocks) runs of contiguous ids.

    KV migration moves whole cache pages; contiguous page ranges become a
    single DMA instead of many (reference: vllm/utils.py:399-412).
    The input need not be sorted; output ranges are sorted by start.
    """
    if not block_ids:
        return []
    sorted_ids = sorted(block_ids)
    ranges: List[Tuple[int, int]] = []
    start = prev = sorted_ids[0]
    for b in sorted_ids[1:]:
        if b == prev + 1:
            prev = b
            continue
        ranges.append((start, prev - start + 1))
        start = prev = b
    ranges.append((start, prev - start + 1))
    return ranges


def coalesce_blocks_by_id(
    blocks_to_nw: Dict[int, Sequence[int]],
) -> Dict[int, List[Tuple[int, int]]]:
    """Per-slot contiguous-range coalescing (reference vllm/utils.py:414-425)."""
    return {slot: coalesce_blocks(ids) for slot, ids in blocks_to_nw.items()}


def random_uuid() -> str:
    return str(uuid.uuid4().hex)


def get_open_port() -> int:
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("", 0))
        return s.getsockname()[1]


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def in_wsl() -> bool:
    return False


STR_DTYPE_TO_JAX = {
    "float32": "float32",
    "float": "float32",
    "bfloat16": "bfloat16",
    "half": "float16",
    "float16": "float16",
    "fp8_e5m2": "float8_e5m2",
    "fp8_e4m3": "float8_e4m3fn",
    "int8": "int8",
    "auto": "auto",
}


def enable_compilation_cache(path: str = "/root/.cache/jax_comp") -> None:
    """Persistent XLA compilation cache: engine restarts and repeated
    bench runs skip the multi-minute first-compile of the big jitted
    steps (especially costly through remote-compile transports)."""
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax
        pass
