"""Native-core KVCacheManager: same public API, C++ hot paths.

When ``libkvcached_core.so`` is built, ``create_kv_cache_manager`` returns
this class — the whole decode-path state machine (block alloc/free,
availability, deferred shrink, prealloc thread, shm resize watcher) runs in
C++ (csrc/kvcached_core.cpp), mirroring the reference's split where every
measured hot path lives in native code (reference benchmarks/bench_alloc:
available_size 12.5×, group_indices_by_page 3×, 8-thread alloc/free 5.7×).
"""

from __future__ import annotations

from typing import Sequence

from .config import KVConfig
from .core.native import NativeBlockManager, NativePagePool
from .logging_utils import get_kvcached_logger
from . import shm as shm_mod

logger = get_kvcached_logger(__name__)


class NativeKVCacheManager:
    def __init__(
        self,
        cfg: KVConfig,
        backend: NativePagePool,
        *,
        virtual_blocks: int | None = None,
        ipc_name: str | None = None,
        async_sched: bool = False,  # C++ core is always thread-safe
        reserve_null_block: bool = True,
        map_hook=None,
        unmap_hook=None,
        enable_prealloc: bool = True,
    ):
        self.cfg = cfg
        self.blocks_per_page = cfg.blocks_per_page
        if virtual_blocks is None:
            virtual_blocks = backend.capacity * cfg.blocks_per_page
        virtual_pages = -(-virtual_blocks // cfg.blocks_per_page)
        self.num_blocks = virtual_pages * cfg.blocks_per_page

        suffix = f"_g{cfg.group_id}" if cfg.group_id else ""
        self._ipc_name = (ipc_name + suffix) if ipc_name else None
        shm_path = shm_mod.shm_path(self._ipc_name) if self._ipc_name else None

        self._mgr = NativeBlockManager(
            backend,
            virtual_pages=virtual_pages,
            blocks_per_page=cfg.blocks_per_page,
            page_bytes=cfg.page_bytes,
            shm_path=shm_path,
            map_hook=map_hook,
            unmap_hook=unmap_hook,
            enable_prealloc=enable_prealloc,
        )
        self.page_allocator = self._mgr  # API-compatible surface
        self.null_block: int | None = None
        if reserve_null_block:
            blocks = self.alloc(1)
            assert blocks is not None and blocks[0] == 0
            self.null_block = blocks[0]

    # -- delegated API -------------------------------------------------------

    def alloc(self, need: int) -> list[int] | None:
        return self._mgr.alloc(need)

    def free(self, block_ids: Sequence[int]) -> None:
        self._mgr.free(list(block_ids))

    def available_size(self) -> int:
        return self._mgr.available_size()

    def resize(self, new_bytes: int) -> bool:
        return self._mgr.resize(new_bytes)

    def trim(self) -> None:
        self._mgr.trim()

    def try_to_reserve(self, need: int) -> bool:
        return self._mgr.try_to_reserve(need)

    def free_reserved(self) -> None:
        self._mgr.free_reserved()

    def get_mapped_memory_size(self) -> int:
        return self._mgr.get_mapped_bytes()

    @property
    def in_shrink(self) -> bool:
        return self._mgr.in_shrink

    def clear(self) -> None:
        self._mgr.free_reserved()
        used = self._mgr.used_blocks()
        self._mgr.free(used)
        self._mgr.reset()
        if self.null_block is not None:
            blocks = self.alloc(1)
            assert blocks is not None and blocks[0] == 0
            self.null_block = blocks[0]

    def shutdown(self) -> None:
        self._mgr.shutdown()


def create_kv_cache_manager(cfg: KVConfig, backend, **kw):
    """Factory: native manager when the backend is native and the core is
    built; pure-Python otherwise."""
    from .core import native_available
    from .kv_cache_manager import KVCacheManager

    native_backend = None
    if isinstance(backend, NativePagePool):
        native_backend = backend
    elif getattr(backend, "native_pool", None) is not None:
        native_backend = backend.native_pool
    if native_available() and native_backend is not None:
        kw.pop("async_sched", None)
        kw.pop("page_table", None)
        return NativeKVCacheManager(cfg, native_backend, **kw)
    return KVCacheManager(cfg, backend, **kw)
