"""Physical KV-cache page records.

Role parity with the reference's ``vllm/block.py``, redesigned around
integer page ids.  The reference threads ``PhysicalTokenBlock`` objects
through every table and free list; here a physical page IS its integer
index into the device cache array, and the mutable bookkeeping facts
about a page (content hash, LRU stamp, computed flag) live in one
sidecar :class:`PageMeta` record owned by the allocating
:class:`~vllm_splitwise_tpu.core.block_manager.PagePool`.  Tables of
ints are what the TPU model runner consumes directly (they become the
``block_tables`` array fed to the paged-attention kernel), so nothing
is translated at the scheduler/worker boundary — and the layout matches
the native C++ engine (csrc/block_engine.cpp), which speaks integers
across the ctypes boundary for the same reason.

Logical blocks do not exist as records at all: a sequence's block
demand is arithmetic over its token count
(:meth:`vllm_splitwise_tpu.sequence.Sequence.num_logical_blocks`).
"""
from __future__ import annotations

from dataclasses import dataclass

# A page that has never been touched by the LRU clock.
NEVER_ACCESSED = -1.0


@dataclass
class PageMeta:
    """Sidecar bookkeeping for one physical cache page (caching mode).

    ``content_hash`` identifies the token prefix the page holds so a
    later prompt with the same prefix can adopt the page instead of
    recomputing it.  Auto-assigned unique hashes mark pages whose
    content is not (yet) a reusable full-block prefix.
    """

    content_hash: int
    num_hashed_tokens: int = 0
    last_accessed: float = NEVER_ACCESSED
    computed: bool = False
