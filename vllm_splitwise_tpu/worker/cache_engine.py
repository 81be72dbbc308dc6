"""Paged KV-cache allocation + swap/copy execution.

Role-parity with the reference's ``vllm/worker/cache_engine.py``: allocate
per-layer K/V page arrays on device plus host swap space, execute the
scheduler's swap-in/swap-out/copy plans each step.  The layout is the
TPU-native ``[num_pages, num_kv_heads, page_size, head_dim]`` — one page
is one contiguous head-major block, so the Pallas paged-attention kernel
issues a single DMA per page that lands relayout-free in VMEM — instead
of the reference's x-packed GPU layout (cache_engine.py:60-93).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vllm_splitwise_tpu.config import (CacheConfig, ModelConfig,
                                       ParallelConfig)
from vllm_splitwise_tpu.logger import init_logger
from vllm_splitwise_tpu.ops.kv_cache import (QuantPages, copy_blocks,
                                             fused_page_ids,
                                             swap_in_blocks,
                                             swap_out_blocks)

logger = init_logger(__name__)

KVCache = Tuple[jax.Array, jax.Array]


class CacheEngine:
    """Owns the device KV pages and the pinned-host swap pages."""

    def __init__(
        self,
        cache_config: CacheConfig,
        model_config: ModelConfig,
        parallel_config: ParallelConfig,
        mesh=None,
        stacked: bool = False,
    ) -> None:
        self.cache_config = cache_config
        self.model_config = model_config
        self.parallel_config = parallel_config
        self.mesh = mesh
        # Stacked layout [L, pages, kvh, ps, hd] feeds lax.scan models
        # (one array pair instead of a per-layer list; swap/copy plans
        # apply across all layers in one op).
        self.stacked = stacked

        self.num_layers = model_config.get_num_layers(parallel_config)
        # Full (unsharded) KV head count: the mesh shards the head axis.
        self.num_kv_heads = model_config.get_total_num_kv_heads()
        self.head_dim = model_config.get_head_size()
        self.page_size = cache_config.block_size
        self.num_device_pages = cache_config.num_device_blocks
        self.num_host_pages = cache_config.num_host_blocks

        # "int4" caches are nibble-packed QuantPages (int8 data holding
        # two signed int4s per byte + bf16 per-token scales); every other
        # dtype is a plain page array.
        self.int4 = cache_config.cache_dtype == "int4"
        self.dtype = (jnp.int8 if self.int4 else
                      _cache_dtype(cache_config, model_config))

        # Fused layout: ONE interleaved array (K of logical block b at
        # physical page 2b, V at 2b+1) instead of a (K, V) pair — the
        # attention kernel then issues one DMA per logical page.  Total
        # bytes are identical; the cache pytree becomes (kv_all, None).
        self.fused = getattr(cache_config, "kv_layout", "split") == "fused"
        if self.fused and not stacked:
            logger.warning("kv_layout=fused requires a stacked-KV model; "
                           "falling back to the split layout.")
            self.fused = False

        self.device_cache = self._allocate_device_cache()
        self.host_cache = self._allocate_host_cache()

    def _page_shape(self, num_pages: int) -> Tuple[int, int, int, int]:
        # Page-major, head-major interior: one page = one contiguous
        # [kvh, ps, hd] block (see ops/paged_attention.py).  int4 packs
        # token PAIRS per byte row: [kvh, ps//2, hd].
        ps = self.page_size // 2 if self.int4 else self.page_size
        return (num_pages, self.num_kv_heads, ps, self.head_dim)

    def _scale_shape(self, num_pages: int) -> Tuple[int, int, int]:
        return (num_pages, self.num_kv_heads, self.page_size)

    def _allocate_device_cache(self):
        pages = self.num_device_pages * 2 if self.fused \
            else self.num_device_pages
        shape = self._page_shape(pages)
        scale_shape = self._scale_shape(pages)
        if self.stacked:
            shape = (self.num_layers, ) + shape
            scale_shape = (self.num_layers, ) + scale_shape
        sharding = scale_sharding = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P
            from vllm_splitwise_tpu.parallel.mesh import kv_cache_spec
            spec = kv_cache_spec()
            if self.num_kv_heads % self.mesh.shape.get("model", 1) != 0:
                spec = P()  # replicate when KV heads don't divide TP
            elif self.stacked:
                spec = P(None, *tuple(spec))
            sharding = NamedSharding(self.mesh, spec)
            scale_sharding = NamedSharding(
                self.mesh, P(*tuple(spec)[:len(scale_shape)]))

        def alloc():
            z = jnp.zeros(shape, dtype=self.dtype)
            z = jax.device_put(z, sharding) if sharding is not None else z
            if not self.int4:
                return z
            s = jnp.zeros(scale_shape, dtype=jnp.bfloat16)
            if scale_sharding is not None:
                s = jax.device_put(s, scale_sharding)
            return QuantPages(z, s)

        if self.fused:
            return (alloc(), None)
        if self.stacked:
            return (alloc(), alloc())
        return [(alloc(), alloc()) for _ in range(self.num_layers)]

    def _allocate_host_cache(self) -> List[Tuple[np.ndarray, np.ndarray]]:
        if not self.num_host_pages:
            return []
        pages = self.num_host_pages * 2 if self.fused \
            else self.num_host_pages
        shape = self._page_shape(pages)
        scale_shape = self._scale_shape(pages)
        if self.stacked:
            shape = (self.num_layers, ) + shape
            scale_shape = (self.num_layers, ) + scale_shape
        import ml_dtypes
        np_dtype = np.dtype(jnp.dtype(self.dtype).name) \
            if jnp.dtype(self.dtype) != jnp.bfloat16 \
            else np.dtype(ml_dtypes.bfloat16)

        def alloc():
            z = np.zeros(shape, dtype=np_dtype)
            if not self.int4:
                return z
            return QuantPages(
                z, np.zeros(scale_shape, dtype=np.dtype(ml_dtypes.bfloat16)))

        if self.fused:
            return (alloc(), None)
        if self.stacked:
            return (alloc(), alloc())
        return [(alloc(), alloc()) for _ in range(self.num_layers)]

    # ---- per-step plans ----

    def swap_in(self, mapping: Dict[int, int]) -> None:
        if self.stacked:
            if not mapping:
                return
            src = sorted(mapping.keys())
            dst_ids = [mapping[s] for s in src]
            if self.fused:
                src = fused_page_ids(src)
                dst_ids = fused_page_ids(dst_ids)
            dst = jnp.asarray(dst_ids, dtype=jnp.int32)

            def leaf_in(dev, host):
                vals = jnp.asarray(np.ascontiguousarray(host[:, src]))
                return dev.at[:, dst].set(vals.astype(dev.dtype),
                                          mode="drop")

            self.device_cache = tuple(
                jax.tree.map(leaf_in, dev, host) for dev, host in zip(
                    self.device_cache, self.host_cache))
            return
        for i in range(self.num_layers):
            k_pages, v_pages = self.device_cache[i]
            k_host, v_host = self.host_cache[i]
            self.device_cache[i] = swap_in_blocks(k_pages, v_pages, k_host,
                                                  v_host, mapping)

    def swap_out(self, mapping: Dict[int, int]) -> None:
        if self.stacked:
            if not mapping:
                return
            src = sorted(mapping.keys())
            dst_ids = [mapping[s] for s in src]
            if self.fused:
                src = fused_page_ids(src)
                dst_ids = fused_page_ids(dst_ids)
            idx = jnp.asarray(src, dtype=jnp.int32)

            def leaf_out(dev, host):
                gathered = np.asarray(jnp.take(dev, idx, axis=1,
                                               mode="clip"))
                for j, hp in enumerate(dst_ids):
                    host[:, hp] = gathered[:, j]

            for dev, host in zip(self.device_cache, self.host_cache):
                jax.tree.map(leaf_out, dev, host)
            return
        for i in range(self.num_layers):
            k_pages, v_pages = self.device_cache[i]
            k_host, v_host = self.host_cache[i]
            swap_out_blocks(k_pages, v_pages, k_host, v_host, mapping)

    def copy(self, src_to_dsts: Dict[int, List[int]]) -> None:
        if not src_to_dsts:
            return
        srcs: List[int] = []
        dsts: List[int] = []
        for src, dst_list in src_to_dsts.items():
            for dst in dst_list:
                srcs.append(src)
                dsts.append(dst)
        if self.fused:
            srcs = fused_page_ids(srcs)
            dsts = fused_page_ids(dsts)
        src_arr = jnp.asarray(srcs, dtype=jnp.int32)
        dst_arr = jnp.asarray(dsts, dtype=jnp.int32)
        if self.stacked:

            def leaf_copy(a):
                vals = jnp.take(a, src_arr, axis=1, mode="clip")
                return a.at[:, dst_arr].set(vals, mode="drop")

            self.device_cache = tuple(
                jax.tree.map(leaf_copy, side) for side in self.device_cache)
            return
        for i in range(self.num_layers):
            k_pages, v_pages = self.device_cache[i]
            self.device_cache[i] = copy_blocks(k_pages, v_pages, src_arr,
                                               dst_arr)

    @staticmethod
    def get_cache_block_size(
        cache_config: CacheConfig,
        model_config: ModelConfig,
        parallel_config: ParallelConfig,
    ) -> int:
        """Bytes per KV page across all layers (reference
        cache_engine.py:155-174)."""
        num_layers = model_config.get_num_layers(parallel_config)
        num_kv_heads = model_config.get_total_num_kv_heads()
        head_dim = model_config.get_head_size()
        if cache_config.cache_dtype == "int4":
            # nibble-packed data + bf16 per-token scale
            per_page = cache_config.block_size * num_kv_heads * (
                head_dim // 2 + 2)
            return 2 * num_layers * per_page
        dtype = _cache_dtype(cache_config, model_config)
        itemsize = jnp.dtype(dtype).itemsize
        per_page = cache_config.block_size * num_kv_heads * head_dim
        return 2 * num_layers * per_page * itemsize


def _cache_dtype(cache_config: CacheConfig, model_config: ModelConfig):
    if cache_config.cache_dtype == "auto":
        return model_config.dtype
    from vllm_splitwise_tpu.utils import STR_DTYPE_TO_JAX
    return jnp.dtype(STR_DTYPE_TO_JAX[cache_config.cache_dtype])
