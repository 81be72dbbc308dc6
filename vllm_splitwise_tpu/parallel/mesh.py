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
    """device_put every leaf with its NamedSharding(mesh, spec).

    Structure-tolerant: where the spec tree has a single PartitionSpec but
    the param tree has a dict (a quantized weight — qweight/scales/zeros
    share the dense weight's sharding), the spec is broadcast into the
    dict; axes whose size does not divide the mesh axis fall back to
    replication (e.g. int8 per-channel scales of shape [1, N] under
    row-parallel sharding).
    """
    def is_spec(s) -> bool:
        return s is None or isinstance(s, P)

    def fit(x, spec: P) -> P:
        dims = list(spec) + [None] * (x.ndim - len(spec))
        fixed = []
        for i in range(x.ndim):
            d = dims[i]
            if d is None:
                fixed.append(None)
                continue
            axes = (d, ) if isinstance(d, str) else tuple(d)
            size = int(np.prod([mesh.shape[a] for a in axes]))
            fixed.append(d if x.shape[i] % size == 0 else None)
        return P(*fixed)

    def place(x, spec):
        if spec is None:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, fit(x, spec)))

    def rec(p, s):
        if isinstance(p, dict) and is_spec(s):
            # Quantized leaf: activation permutations replicate; the
            # packed weight + scales/zeros inherit the dense spec.
            return {
                k: place(v, P() if k == "act_perm" else s)
                for k, v in p.items()
            }
        if isinstance(p, dict):
            return {k: rec(v, s.get(k, P())) for k, v in p.items()}
        if isinstance(p, (list, tuple)):
            return type(p)(rec(pp, ss) for pp, ss in zip(p, s))
        return place(p, s)

    return rec(tree, spec_tree)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def kv_cache_spec() -> P:
    """KV pages shard over KV heads on the model axis (head-major page
    layout [num_pages, num_kv_heads, page_size, head_dim])."""
    return P(None, MODEL_AXIS, None, None)
