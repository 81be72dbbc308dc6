"""Multi-LoRA weight management (reference role: vllm/lora/models.py
LoRAModel/LoRAModelManager/LRUCacheLoRAModelManager + the punica BGMV
kernels' role).

TPU-native design: up to ``max_loras`` adapters live as STACKED device
arrays ``A[slots, layers, H, r_max]`` / ``B[slots, layers, r_max, out]``
per target projection, slot 0 being the zero (no-LoRA) adapter.  A batch
carries one slot index per row; the batched LoRA contribution is two
einsums over the stack (ops/lora_apply in lora/layers.py) — all-adapters
dense compute, which at r<<H costs less than the gather machinery punica
needs on GPUs.  Slots are recycled LRU.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from vllm_splitwise_tpu.logger import init_logger
from vllm_splitwise_tpu.lora.request import LoRARequest

logger = init_logger(__name__)

# Projections LoRA can target in the Llama family (the reference's
# supported_lora_modules for llama, vllm/model_executor/models/llama.py).
TARGET_MODULES = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
                  "up_proj", "down_proj")


class LoRAModel:
    """One adapter's host-resident weights, loaded from a PEFT dir."""

    def __init__(self, lora_id: int, rank: int, scaling: float,
                 tensors: Dict[str, Dict[int, Tuple[np.ndarray,
                                                    np.ndarray]]],
                 embed_ab=None, lm_head_ab=None,
                 extra_in=None, extra_out=None) -> None:
        self.id = lora_id
        self.rank = rank
        self.scaling = scaling
        # tensors[module][layer] = (A [H, r], B [r, out]); scaling folded
        # into B already.
        self.tensors = tensors
        # Embedding / LM-head adapters + added-vocab rows
        # (vllm/lora/layers.py:150,786): A/B with scaling folded into B;
        # extra_in/extra_out are [n_added, H] input/output embeddings for
        # token ids >= base vocab.
        self.embed_ab = embed_ab        # (A [V(+E), r], B [r, H])
        self.lm_head_ab = lm_head_ab    # (A [H, r], B [r, V(+E)])
        self.extra_in = extra_in
        self.extra_out = extra_out

    @classmethod
    def from_local_checkpoint(cls, path: str,
                              lora_id: int) -> "LoRAModel":
        config_path = os.path.join(path, "adapter_config.json")
        with open(config_path) as f:
            config = json.load(f)
        rank = config["r"]
        alpha = config.get("lora_alpha", rank)
        scaling = alpha / rank

        weights_path = os.path.join(path, "adapter_model.safetensors")
        if os.path.exists(weights_path):
            from safetensors.numpy import load_file
            state = load_file(weights_path)
        else:
            import torch
            state = {
                k: v.numpy()
                for k, v in torch.load(
                    os.path.join(path, "adapter_model.bin"),
                    map_location="cpu").items()
            }

        tensors: Dict[str, Dict[int, Tuple[np.ndarray, np.ndarray]]] = {}
        pending: Dict[Tuple[str, int], Dict[str, np.ndarray]] = {}
        embed_pending: Dict[str, np.ndarray] = {}
        head_pending: Dict[str, np.ndarray] = {}
        for name, w in state.items():
            # base_model.model.model.layers.{i}.self_attn.q_proj.lora_A.weight
            parts = name.split(".")
            if "embed_tokens" in parts:
                # PEFT embedding convention: lora_embedding_A [r, V],
                # lora_embedding_B [H, r].
                key = "A" if any("lora_embedding_A" in p or "lora_A" in p
                                 for p in parts) else "B"
                embed_pending[key] = np.asarray(w, dtype=np.float32)
                continue
            if "lm_head" in parts:
                key = "A" if "lora_A" in parts else "B"
                head_pending[key] = np.asarray(w, dtype=np.float32)
                continue
            if "layers" not in parts:
                continue
            li = int(parts[parts.index("layers") + 1])
            module = None
            for m in TARGET_MODULES:
                if m in parts:
                    module = m
                    break
            if module is None:
                continue
            ab = "A" if "lora_A" in parts else "B"
            pending.setdefault((module, li), {})[ab] = np.asarray(
                w, dtype=np.float32)
        for (module, li), ab in pending.items():
            if "A" not in ab or "B" not in ab:
                continue
            # torch convention: lora_A [r, H], lora_B [out, r].
            a = ab["A"].T            # [H, r]
            b = ab["B"].T * scaling  # [r, out]
            tensors.setdefault(module, {})[li] = (a, b)

        embed_ab = None
        if "A" in embed_pending and "B" in embed_pending:
            embed_ab = (embed_pending["A"].T,             # [V, r]
                        embed_pending["B"].T * scaling)   # [r, H]
        lm_head_ab = None
        if "A" in head_pending and "B" in head_pending:
            lm_head_ab = (head_pending["A"].T,            # [H, r]
                          head_pending["B"].T * scaling)  # [r, V]

        # Adapter-added vocab rows (the reference's new_embeddings
        # sidecar: vllm/lora/models.py from_local_checkpoint +
        # lora/layers.py embeddings_tensors).
        extra_in = extra_out = None
        new_path = os.path.join(path, "new_embeddings.safetensors")
        if os.path.exists(new_path):
            from safetensors.numpy import load_file
            new = load_file(new_path)
            if "input_embeddings" in new:
                extra_in = np.asarray(new["input_embeddings"], np.float32)
            if "output_embeddings" in new:
                extra_out = np.asarray(new["output_embeddings"],
                                       np.float32)
        return cls(lora_id, rank, scaling, tensors, embed_ab=embed_ab,
                   lm_head_ab=lm_head_ab, extra_in=extra_in,
                   extra_out=extra_out)


class LoRAModelManager:
    """Owns the stacked device-side adapter slots."""

    def __init__(self, num_layers: int, max_loras: int, max_rank: int,
                 module_shapes: Dict[str, Tuple[int, int]],
                 dtype=jnp.bfloat16,
                 embedding_config: Optional[Dict[str, int]] = None) -> None:
        self.num_layers = num_layers
        self.max_loras = max_loras
        self.max_rank = max_rank
        self.module_shapes = module_shapes  # module -> (in, out)
        self.dtype = dtype
        # slot 0 = no-LoRA (zeros); slots 1..max_loras hold adapters.
        self.num_slots = max_loras + 1
        self.slot_to_id: List[Optional[int]] = [None] * self.num_slots
        self.slot_to_id[0] = 0
        self._lru: List[int] = []  # slot access order (oldest first)
        self._registered: Dict[int, LoRAModel] = {}

        self.stacks: Dict[str, jnp.ndarray] = {}
        for module, (d_in, d_out) in module_shapes.items():
            self.stacks[f"{module}_A"] = jnp.zeros(
                (self.num_slots, num_layers, d_in, max_rank), dtype=dtype)
            self.stacks[f"{module}_B"] = jnp.zeros(
                (self.num_slots, num_layers, max_rank, d_out), dtype=dtype)

        # Embedding / LM-head adapters + extra vocab (GLOBAL stacks, not
        # per-layer; vllm/lora/layers.py:150,786).  ``embedding_config``:
        # {"base_vocab": V, "extra": E, "hidden": H}.
        self.embedding_config = embedding_config
        if embedding_config is not None:
            v = embedding_config["base_vocab"]
            e = embedding_config["extra"]
            h = embedding_config["hidden"]
            s = self.num_slots
            v_tot = v + e
            self.stacks["embed_A"] = jnp.zeros((s, v_tot, max_rank),
                                               dtype=dtype)
            self.stacks["embed_B"] = jnp.zeros((s, max_rank, h),
                                               dtype=dtype)
            self.stacks["extra_in"] = jnp.zeros((s, max(e, 1), h),
                                                dtype=dtype)
            self.stacks["lm_head_A"] = jnp.zeros((s, h, max_rank),
                                                 dtype=dtype)
            self.stacks["lm_head_B"] = jnp.zeros((s, max_rank, v_tot),
                                                 dtype=dtype)
            self.stacks["extra_out"] = jnp.zeros((s, max(e, 1), h),
                                                 dtype=dtype)
            self.stacks["extra_count"] = jnp.zeros((s, ), dtype=jnp.int32)

    # ---- registration / activation ----

    def add_lora(self, lora: LoRAModel) -> bool:
        if lora.id in self._registered:
            return False
        if lora.rank > self.max_rank:
            raise ValueError(
                f"LoRA rank {lora.rank} > max_lora_rank {self.max_rank}")
        self._registered[lora.id] = lora
        return True

    def remove_lora(self, lora_id: int) -> bool:
        if lora_id not in self._registered:
            return False
        del self._registered[lora_id]
        for slot, sid in enumerate(self.slot_to_id):
            if sid == lora_id:
                self.slot_to_id[slot] = None
        return True

    def list_loras(self) -> List[int]:
        return list(self._registered)

    def get_slot(self, lora_id: int) -> int:
        """Slot of an ACTIVE adapter (activate first)."""
        return self.slot_to_id.index(lora_id)

    def activate(self, lora_id: int) -> int:
        """Ensure the adapter occupies a device slot; returns the slot."""
        if lora_id == 0:
            return 0
        if lora_id in self.slot_to_id:
            slot = self.slot_to_id.index(lora_id)
            self._touch(slot)
            return slot
        lora = self._registered.get(lora_id)
        if lora is None:
            raise ValueError(f"LoRA {lora_id} is not registered.")
        slot = self._free_slot()
        self._write_slot(slot, lora)
        self.slot_to_id[slot] = lora_id
        self._touch(slot)
        return slot

    def _touch(self, slot: int) -> None:
        if slot in self._lru:
            self._lru.remove(slot)
        self._lru.append(slot)

    def _free_slot(self) -> int:
        for slot in range(1, self.num_slots):
            if self.slot_to_id[slot] is None:
                return slot
        # Evict LRU (reference LRUCacheLoRAModelManager role).
        slot = self._lru.pop(0)
        logger.info("Evicting LoRA %s from slot %d",
                    self.slot_to_id[slot], slot)
        self.slot_to_id[slot] = None
        return slot

    def _write_slot(self, slot: int, lora: LoRAModel) -> None:
        if self.embedding_config is not None:
            self._write_embedding_slot(slot, lora)
        for module in self.module_shapes:
            a_stack = self.stacks[f"{module}_A"]
            b_stack = self.stacks[f"{module}_B"]
            d_in, d_out = self.module_shapes[module]
            a_new = np.zeros((self.num_layers, d_in, self.max_rank),
                             dtype=np.float32)
            b_new = np.zeros((self.num_layers, self.max_rank, d_out),
                             dtype=np.float32)
            for li, (a, b) in lora.tensors.get(module, {}).items():
                r = a.shape[1]
                a_new[li, :, :r] = a
                b_new[li, :r, :] = b
            self.stacks[f"{module}_A"] = a_stack.at[slot].set(
                jnp.asarray(a_new, dtype=self.dtype))
            self.stacks[f"{module}_B"] = b_stack.at[slot].set(
                jnp.asarray(b_new, dtype=self.dtype))

    def _write_embedding_slot(self, slot: int, lora: LoRAModel) -> None:
        cfg = self.embedding_config
        v, e, h = cfg["base_vocab"], cfg["extra"], cfg["hidden"]
        r_max = self.max_rank

        def fill(name, shape, src):
            new = np.zeros(shape, dtype=np.float32)
            if src is not None:
                sl = tuple(slice(0, min(a, b))
                           for a, b in zip(shape, src.shape))
                new[sl] = src[sl]
            self.stacks[name] = self.stacks[name].at[slot].set(
                jnp.asarray(new, dtype=self.dtype))

        ea, eb = lora.embed_ab if lora.embed_ab is not None else (None,
                                                                  None)
        fill("embed_A", (v + e, r_max), ea)
        fill("embed_B", (r_max, h), eb)
        fill("extra_in", (max(e, 1), h), lora.extra_in)
        ha, hb = lora.lm_head_ab if lora.lm_head_ab is not None else (
            None, None)
        fill("lm_head_A", (h, r_max), ha)
        fill("lm_head_B", (r_max, v + e), hb)
        fill("extra_out", (max(e, 1), h), lora.extra_out)
        n_extra = 0 if lora.extra_out is None else min(
            lora.extra_out.shape[0], e)
        self.stacks["extra_count"] = self.stacks["extra_count"].at[
            slot].set(n_extra)
