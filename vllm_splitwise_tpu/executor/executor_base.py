"""Abstract executor interface (reference role:
vllm/executor/executor_base.py:10-57)."""
from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Dict, List, Optional

from vllm_splitwise_tpu.sequence import SamplerOutput, SequenceGroupMetadata


class ExecutorBase(ABC):
    """Dispatches a scheduled step to the device worker(s)."""

    @abstractmethod
    def execute_model(
        self,
        seq_group_metadata_list: List[SequenceGroupMetadata],
        blocks_to_swap_in: Dict[int, int],
        blocks_to_swap_out: Dict[int, int],
        blocks_to_copy: Dict[int, List[int]],
        blocks_to_nw: Optional[Dict[int, List[int]]] = None,
        num_decode_steps: int = 1,
    ) -> SamplerOutput:
        ...

    @abstractmethod
    def check_health(self) -> None:
        """Raise if the executor is unhealthy and the engine must die."""
        ...

    async def execute_model_async(
        self,
        seq_group_metadata_list: List[SequenceGroupMetadata],
        blocks_to_swap_in: Dict[int, int],
        blocks_to_swap_out: Dict[int, int],
        blocks_to_copy: Dict[int, List[int]],
        blocks_to_nw: Optional[Dict[int, List[int]]] = None,
        num_decode_steps: int = 1,
    ) -> SamplerOutput:
        """Default async path: run the sync step in a thread so the event
        loop stays responsive while XLA executes."""
        import asyncio
        return await asyncio.get_running_loop().run_in_executor(
            None, lambda: self.execute_model(
                seq_group_metadata_list, blocks_to_swap_in,
                blocks_to_swap_out, blocks_to_copy, blocks_to_nw,
                num_decode_steps=num_decode_steps))

    async def check_health_async(self) -> None:
        self.check_health()
