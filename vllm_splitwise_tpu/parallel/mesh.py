"""Device meshes and parallel state.

The TPU-native replacement for the reference's NCCL rank-group machinery
(vllm/model_executor/parallel_utils/parallel_state.py): parallelism is a
``jax.sharding.Mesh`` and GSPMD inserts collectives.  The Splitwise
stage split (prompt pool / token pool, reference parallel_state.py:92-103)
becomes TWO disjoint meshes over one device set — a prefill mesh and a
decode mesh — plus host-coordinated KV migration between them.

Axis conventions:
  "data"  — batch/data parallel (replicated weights)
  "model" — tensor parallel (sharded heads / ffn / vocab)
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

MODEL_AXIS = "model"
DATA_AXIS = "data"


@dataclass
class ParallelState:
    """All meshes of one engine instance."""
    mesh: Mesh                       # the (only/prefill-side) compute mesh
    decode_mesh: Optional[Mesh]      # decode-pool mesh under disaggregation
    sep_prompt_token: bool

    @property
    def prefill_mesh(self) -> Mesh:
        return self.mesh

    def mesh_for_phase(self, is_prompt: bool) -> Mesh:
        if not self.sep_prompt_token or self.decode_mesh is None:
            return self.mesh
        return self.mesh if is_prompt else self.decode_mesh


def build_parallel_state(
    tensor_parallel_size: int,
    data_parallel_size: int = 1,
    sep_prompt_token: bool = False,
    devices: Optional[Sequence[jax.Device]] = None,
) -> ParallelState:
    """Carve the device set into mesh(es).

    Under ``sep_prompt_token`` the first tp*dp devices form the prefill
    mesh and the next tp*dp the decode mesh (total chips double — the
    reference's 2x world size, vllm/config.py:434-438).
    """
    if devices is None:
        devices = jax.devices()
    per_pool = tensor_parallel_size * data_parallel_size
    needed = per_pool * (2 if sep_prompt_token else 1)
    if len(devices) < needed:
        raise ValueError(
            f"Need {needed} devices (tp={tensor_parallel_size} x "
            f"dp={data_parallel_size}"
            f"{' x 2 pools' if sep_prompt_token else ''}), "
            f"have {len(devices)}.")

    def make_mesh(devs) -> Mesh:
        arr = np.asarray(devs).reshape(data_parallel_size,
                                       tensor_parallel_size)
        return Mesh(arr, (DATA_AXIS, MODEL_AXIS))

    prefill = make_mesh(devices[:per_pool])
    decode = make_mesh(devices[per_pool:2 * per_pool]) if sep_prompt_token \
        else None
    return ParallelState(mesh=prefill, decode_mesh=decode,
                         sep_prompt_token=sep_prompt_token)


def shard_pytree(tree, spec_tree, mesh: Mesh):
    """device_put every leaf with its NamedSharding(mesh, spec)."""
    def place(x, spec):
        if spec is None:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, tree, spec_tree,
                                  is_leaf=lambda x: x is None)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def kv_cache_spec() -> P:
    """KV pages shard over KV heads on the model axis:
    [num_kv_heads, num_pages, page_size, head_dim]."""
    return P(MODEL_AXIS, None, None, None)
