"""Worker-side LoRA lifecycle (reference role:
vllm/lora/worker_manager.py LRUCacheWorkerLoRAManager): load adapters
from disk on demand, keep the hottest ones resident in device slots,
hand the model runner the stacked tensors + per-row slot indices."""
from __future__ import annotations

from typing import Dict, List, Optional, Set

from vllm_splitwise_tpu.config import LoRAConfig, ModelConfig
from vllm_splitwise_tpu.logger import init_logger
from vllm_splitwise_tpu.lora.models import (TARGET_MODULES, LoRAModel,
                                            LoRAModelManager)
from vllm_splitwise_tpu.lora.request import LoRARequest

logger = init_logger(__name__)


class WorkerLoRAManager:

    def __init__(self, model_config: ModelConfig, lora_config: LoRAConfig,
                 model) -> None:
        self.lora_config = lora_config
        hidden = model.hidden_size
        kv_dim = model.num_kv_heads * model.head_dim \
            if hasattr(model, "num_kv_heads") else hidden
        q_dim = model.num_heads * model.head_dim
        inter = getattr(model, "intermediate_size",
                        getattr(model, "inner", 4 * hidden))
        module_shapes = {
            "q_proj": (hidden, q_dim),
            "k_proj": (hidden, kv_dim),
            "v_proj": (hidden, kv_dim),
            "o_proj": (q_dim, hidden),
            "gate_proj": (hidden, inter),
            "up_proj": (hidden, inter),
            "down_proj": (inter, hidden),
        }
        # Embedding / LM-head adapters + extra vocab (reference
        # models/llama.py:292-304 wires these whenever LoRA is enabled).
        embedding_config = None
        if hasattr(model, "vocab_size"):
            embedding_config = {
                "base_vocab": model.vocab_size,
                "extra": lora_config.lora_extra_vocab_size,
                "hidden": hidden,
            }
        self.manager = LoRAModelManager(
            num_layers=model.num_layers,
            max_loras=lora_config.max_loras,
            max_rank=lora_config.max_lora_rank,
            module_shapes=module_shapes,
            dtype=model_config.dtype,
            embedding_config=embedding_config,
        )
        self._loaded_paths: Dict[int, str] = {}

    def add_lora(self, lora_request: LoRARequest) -> bool:
        if lora_request.lora_int_id in self.manager.list_loras():
            return False
        lora = LoRAModel.from_local_checkpoint(
            lora_request.lora_local_path, lora_request.lora_int_id)
        self.manager.add_lora(lora)
        self._loaded_paths[lora_request.lora_int_id] = \
            lora_request.lora_local_path
        return True

    def remove_lora(self, lora_id: int) -> bool:
        self._loaded_paths.pop(lora_id, None)
        return self.manager.remove_lora(lora_id)

    def list_loras(self) -> Set[int]:
        return set(self.manager.list_loras())

    def set_active_loras(
            self, lora_requests: List[Optional[LoRARequest]]
    ) -> Dict[int, int]:
        """Ensure every referenced adapter is resident; returns
        lora_int_id -> slot."""
        mapping = {0: 0}
        for req in lora_requests:
            if req is None:
                continue
            if req.lora_int_id not in self.manager.list_loras():
                self.add_lora(req)
            mapping[req.lora_int_id] = self.manager.activate(
                req.lora_int_id)
        return mapping

    @property
    def stacks(self):
        return self.manager.stacks
