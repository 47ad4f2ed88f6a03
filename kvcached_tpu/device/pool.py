"""HBM page pool: the TPU replacement for the CUDA VMM stack.

The reference backs one virtual tensor with physical pages via
``cuMemCreate``/``cuMemMap`` (csrc/ftensor.cpp:100-118).  TPUs have no
user-visible memory remapping, so physical backing is a **preallocated pool
tensor** and all indirection lives in int32 page tables consumed by the
Pallas paged-attention kernels (ops/paged_attention.py).

Pool layout (one array per K and V):

    [num_layers, num_pages, num_kv_heads, page_tokens, head_dim]

- One *physical page id* indexes dim 1 and is valid across **all layers**:
  a single metadata "map" backs a token-range in every layer at once (the
  contiguous layout's one-call map, reference csrc/allocator.cpp:138-148)
  while each (layer, page, head) slab is a dense ``[page_tokens, head_dim]``
  chunk — the per-layer locality that the reference's contiguous layout lost
  (−31% e2e, benchmarks/bench_layout) and we keep.
- ``num_kv_heads`` (dim 2) is the TP sharding axis: shard with
  ``PartitionSpec(None, None, "tp")`` and every chip holds the same page
  ids for its head shard — the all-ranks-identical-mapping invariant of the
  reference's TP broadcast holds by construction.
- Physical page 0 is the zero page (never allocated; page-table entries of
  unmapped virtual pages point at it, so reads are defined).

The pool is functional state: write ops return a new array and are run
under ``jit`` with the pool **donated**, which XLA turns into an in-place
scatter — no copy of the arena ever happens.
"""

from __future__ import annotations

import math
import threading
from collections import deque
from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import KVConfig
from ..logging_utils import get_kvcached_logger

logger = get_kvcached_logger(__name__)


def hbm_free_bytes(device=None) -> int | None:
    """Live HBM headroom — the ``cudaMemGetInfo`` stand-in
    (reference csrc/page_allocator.cpp:442-455 uses mem_get_info ×
    GPU_UTILIZATION).  Returns None when the backend exposes no stats
    (e.g. CPU), in which case callers fall back to explicit sizing."""
    device = device or jax.local_devices()[0]
    try:
        stats = device.memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    limit = stats.get("bytes_limit")
    in_use = stats.get("bytes_in_use")
    if limit is None or in_use is None:
        return None
    return int(limit) - int(in_use)


class PoolArrays:
    """Shared holder for the pool device buffers.

    Colocated engines donate the pool to their jitted steps; because they
    all mutate THE SAME arena, the live array reference must be owned in one
    place — an engine holding a stale (donated-away) jax.Array would crash.
    All engines step on one runner thread, so plain attributes suffice.
    """

    __slots__ = ("k_pools", "v_pools")

    def __init__(self, k_pools, v_pools=None):
        self.k_pools = k_pools
        self.v_pools = v_pools


@dataclass(frozen=True)
class PoolSpec:
    """Concrete device-pool geometry derived from a model's KVConfig."""

    num_layers: int
    num_pages: int  # physical pages incl. the zero page (id 0)
    num_kv_heads: int
    page_tokens: int
    head_dim: int
    dtype: jnp.dtype
    num_kv_buffers: int = 2

    @property
    def page_bytes(self) -> int:
        """Bytes one physical page consumes across all layers and buffers."""
        itemsize = jnp.dtype(self.dtype).itemsize
        return (
            self.num_layers
            * self.num_kv_buffers
            * self.num_kv_heads
            * self.page_tokens
            * self.head_dim
            * itemsize
        )

    @property
    def kv_shape(self) -> tuple[int, ...]:
        return (
            self.num_layers,
            self.num_pages,
            self.num_kv_heads,
            self.page_tokens,
            self.head_dim,
        )

    @classmethod
    def from_config(
        cls,
        cfg: KVConfig,
        *,
        num_pages: int | None = None,
        hbm_budget_bytes: int | None = None,
    ) -> "PoolSpec":
        if num_pages is None:
            assert hbm_budget_bytes is not None, "need num_pages or hbm budget"
            probe = cls(
                num_layers=cfg.num_layers,
                num_pages=1,
                num_kv_heads=cfg.num_kv_heads,
                page_tokens=cfg.page_tokens,
                head_dim=cfg.head_dim,
                dtype=jnp.dtype(cfg.kv_dtype),
                num_kv_buffers=cfg.num_kv_buffers,
            )
            num_pages = max(2, hbm_budget_bytes // probe.page_bytes)
        return cls(
            num_layers=cfg.num_layers,
            num_pages=num_pages,
            num_kv_heads=cfg.num_kv_heads,
            page_tokens=cfg.page_tokens,
            head_dim=cfg.head_dim,
            dtype=jnp.dtype(cfg.kv_dtype),
            num_kv_buffers=cfg.num_kv_buffers,
        )


class DevicePagePool:
    """Physical-page arena + free-list (implements ``PhysicalBackend``).

    Host-side bookkeeping is a deque of free physical page ids (the
    ``GPUPage`` role); the device arrays are created zero-filled so the
    zero page yields defined reads.  The arrays themselves are owned by the
    engine's jitted step (functional state); this object only arbitrates
    *which page ids are live* — exactly the metadata/compute split that
    keeps map/unmap off the device critical path.
    """

    def __init__(self, spec: PoolSpec, *, sharding=None):
        self.spec = spec
        self.sharding = sharding
        # free-list backend: native C++ when built (shared with the native
        # block manager), else a Python deque
        self.native_pool = None
        from ..core import native_available

        if native_available():
            from ..core.native import NativePagePool

            self.native_pool = NativePagePool(spec.num_pages)
            self._free = None
        else:
            self._free = deque(range(1, spec.num_pages))
        self._lock = threading.Lock()

    # -- PhysicalBackend protocol -------------------------------------------

    @property
    def capacity(self) -> int:
        return self.spec.num_pages

    def acquire(self, n: int) -> list[int] | None:
        if self.native_pool is not None:
            return self.native_pool.acquire(n)
        with self._lock:
            if len(self._free) < n:
                return None
            return [self._free.popleft() for _ in range(n)]

    def release(self, page_ids: Sequence[int]) -> None:
        if self.native_pool is not None:
            return self.native_pool.release(page_ids)
        with self._lock:
            for p in page_ids:
                assert p != 0, "cannot release the zero page"
                self._free.append(p)

    def avail_physical_pages(self) -> int:
        if self.native_pool is not None:
            return self.native_pool.avail_physical_pages()
        with self._lock:
            return len(self._free)

    # -- device arrays ------------------------------------------------------

    def allocate_arrays(self) -> tuple[jax.Array, jax.Array | None]:
        """Create the K (and V) pool arrays, optionally sharded."""
        shape = self.spec.kv_shape
        k = jnp.zeros(shape, dtype=self.spec.dtype)
        v = jnp.zeros(shape, dtype=self.spec.dtype) if self.spec.num_kv_buffers == 2 else None
        if self.sharding is not None:
            k = jax.device_put(k, self.sharding)
            if v is not None:
                v = jax.device_put(v, self.sharding)
        logger.info(
            "allocated KV pool: %s pages × %d B/page = %.2f GB (%s)",
            self.spec.num_pages,
            self.spec.page_bytes,
            self.spec.num_pages * self.spec.page_bytes / 1e9,
            self.spec.dtype,
        )
        return k, v


def write_kv_pages(
    k_pool: jax.Array,
    v_pool: jax.Array,
    layer: int,
    k_new: jax.Array,
    v_new: jax.Array,
    pages: jax.Array,
    slots: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Scatter new KV for T tokens into their (page, slot) positions.

    k_new/v_new: [T, num_kv_heads, head_dim]; pages/slots: [T] int32.
    Run inside jit with pools donated → in-place XLA scatter.  This is the
    TPU write path that replaces the engine writing through the FTensor's
    virtual addresses.
    """
    k_pool = k_pool.at[layer, pages, :, slots, :].set(
        k_new.astype(k_pool.dtype), mode="drop"
    )
    v_pool = v_pool.at[layer, pages, :, slots, :].set(
        v_new.astype(v_pool.dtype), mode="drop"
    )
    return k_pool, v_pool
