"""Attention metadata passed into the jitted model step.

Role-parity with the reference's InputMetadata
(vllm/model_executor/input_metadata.py:6), split into prefill/decode
variants because the two phases compile as separate XLA programs (the
TPU analog of the reference's eager-prefill vs CUDA-graph-decode split).
All fields are device arrays with bucket-padded static shapes.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax


class PrefillMetadata(NamedTuple):
    seq_lens: jax.Array        # [B] i32 — valid (computed) prompt lengths
    slot_mapping: jax.Array    # [B, T] i32 — flat KV slot per token, -1 pad
    # Chunked prefill / prefix caching: absolute position of q[:, 0].
    start_positions: Optional[jax.Array] = None  # [B] i32
    # Prefix caching: cached-prefix pages to attend over (None when no
    # scheduled sequence reuses a prefix).
    block_tables: Optional[jax.Array] = None     # [B, max_pages] i32
    prefix_lens: Optional[jax.Array] = None      # [B] i32


class DecodeMetadata(NamedTuple):
    block_tables: jax.Array    # [B, max_pages] i32, 0-padded
    context_lens: jax.Array    # [B] i32 (length INCLUDING the new token)
    slot_mapping: jax.Array    # [B] i32 — slot of the new token, -1 pad
