"""Cross-host KV-page transport: the DCN leg of disaggregated serving.

Role parity with the reference's MSCCL++ InfiniBand proxy channels
(vllm/worker/comm_utils.py:150-223, csrc/kv_comm_kernels.cu), rebuilt on
JAX's cross-host device transfer: a ``jax.device_put`` whose source
sharding lives on the prefill host's devices and whose destination
sharding lives on the decode host's routes device-to-device over the
socket/DCN transport (``jax_cross_host_transfer_socket_address``), no
host staging.

Multi-controller protocol: BOTH processes call :meth:`transfer` with
matching pytrees in matching order — the sender passes its real page
arrays, the receiver passes shape/dtype templates
(``jax.ShapeDtypeStruct``, e.g. from ``jax.eval_shape`` over its own
cache gather).  The runtime pairs the two calls; ordering is guaranteed
by the single prefill<->decode control channel that triggers every
transfer.

Zero-copy at both ends: the sender rewraps its local shards into the
global-mesh view (`make_array_from_single_device_arrays`), and the
receiver rewraps the landed shards into its local mesh for the cache
scatter.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from vllm_splitwise_tpu.logger import init_logger
from vllm_splitwise_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

logger = init_logger(__name__)


class CrossHostKVMover:
    """Moves KV page pytrees between two disjoint per-host meshes."""

    def __init__(
        self,
        src_devices: Sequence[jax.Device],
        dst_devices: Sequence[jax.Device],
        tensor_parallel_size: int,
        data_parallel_size: int = 1,
        local_mesh: Optional[Mesh] = None,
    ) -> None:
        """``local_mesh`` is this process's compute mesh (its devices must
        equal the src or dst devices it owns); pass the prefill worker's
        mesh on the prefill host and the decode worker's on the decode
        host."""

        def pool_mesh(devs) -> Mesh:
            arr = np.asarray(list(devs)).reshape(data_parallel_size,
                                                 tensor_parallel_size)
            return Mesh(arr, (DATA_AXIS, MODEL_AXIS))

        self.src_mesh = pool_mesh(src_devices)
        self.dst_mesh = pool_mesh(dst_devices)
        self.local_mesh = local_mesh
        pid = jax.process_index()
        self.owns_src = any(d.process_index == pid for d in src_devices)
        self.owns_dst = any(d.process_index == pid for d in dst_devices)
        self.bytes_moved = 0
        self.num_transfers = 0

    # -- sharding helpers ----------------------------------------------

    @staticmethod
    def _fit(spec: P, ndim: int) -> P:
        return P(*tuple(spec)[:ndim])

    def transfer(self, tree, spec_for_leaf):
        """Ship one pytree src->dst.

        ``tree``: real arrays on the sender, ShapeDtypeStructs on the
        receiver.  ``spec_for_leaf(leaf) -> PartitionSpec`` gives each
        leaf's page sharding (same on both meshes).

        Returns the received pytree on this process's LOCAL mesh when it
        owns destination devices, else None.
        """

        def one(leaf):
            spec = self._fit(spec_for_leaf(leaf), leaf.ndim)
            src_sh = NamedSharding(self.src_mesh, spec)
            dst_sh = NamedSharding(self.dst_mesh, spec)
            if self.owns_src:
                # Zero-copy: reinterpret local shards under the global
                # source mesh.
                shards = [s.data for s in leaf.addressable_shards]
                src = jax.make_array_from_single_device_arrays(
                    leaf.shape, src_sh, shards)
            else:
                # No local part of the source: a shell array.
                src = jax.make_array_from_callback(
                    leaf.shape, src_sh, lambda idx: None, dtype=leaf.dtype)
            out = jax.device_put(src, dst_sh)
            if not self.owns_dst:
                return None
            if self.local_mesh is None:
                return out
            # Rewrap the landed shards onto the local compute mesh.
            local_sh = NamedSharding(self.local_mesh, spec)
            return jax.make_array_from_single_device_arrays(
                leaf.shape, local_sh,
                [s.data for s in out.addressable_shards])

        result = jax.tree.map(one, tree)
        self.num_transfers += 1
        self.bytes_moved += sum(
            int(np.prod(l.shape)) * l.dtype.itemsize
            for l in jax.tree.leaves(tree))
        return result if self.owns_dst else None
