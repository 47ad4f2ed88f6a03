"""ctypes bindings to the native core (csrc/libkvcached_core.so).

pybind11 isn't part of this stack; the C ABI + ctypes keeps the boundary
thin and dependency-free.  The page table is a numpy int32 array whose
buffer is shared with C++ (zero-copy): the C++ allocator writes mappings,
Python/the engine reads them when building per-step physical page tables.
"""

from __future__ import annotations

import ctypes as C
import os
import subprocess
import threading
from typing import Sequence

import numpy as np

from ..config import MAX_RESERVED_PAGES, MIN_RESERVED_PAGES, RESIZE_POLL_MS
from ..logging_utils import get_kvcached_logger

logger = get_kvcached_logger(__name__)

_SO_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                        "libkvcached_core.so")
_lib = None
_lib_lock = threading.Lock()

_MAP_CB = C.CFUNCTYPE(None, C.POINTER(C.c_int32), C.POINTER(C.c_int32),
                      C.c_int64, C.c_void_p)


def _try_build() -> bool:
    csrc = os.path.dirname(os.path.abspath(_SO_PATH))
    try:
        subprocess.run(["make", "-C", csrc], check=True, capture_output=True,
                       timeout=120)
        return os.path.exists(_SO_PATH)
    except Exception as e:
        logger.debug("native core build failed: %s", e)
        return False


def _stale(path: str) -> bool:
    """True if the .so predates its sources (rebuild before loading)."""
    csrc = os.path.dirname(path)
    try:
        so_mtime = os.path.getmtime(path)
        return any(
            os.path.getmtime(os.path.join(csrc, src)) > so_mtime
            for src in ("kvcached_core.cpp", "Makefile")
            if os.path.exists(os.path.join(csrc, src))
        )
    except OSError:
        return True


def _load():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        path = os.path.abspath(_SO_PATH)
        if (not os.path.exists(path) or _stale(path)) and not _try_build():
            if not os.path.exists(path):
                raise OSError("libkvcached_core.so not built")
            logger.warning("using possibly-stale libkvcached_core.so "
                           "(rebuild failed)")
        lib = C.CDLL(path)
        # signatures
        lib.kvc_pool_create.restype = C.c_void_p
        lib.kvc_pool_create.argtypes = [C.c_int64]
        lib.kvc_pool_destroy.argtypes = [C.c_void_p]
        lib.kvc_pool_avail.restype = C.c_int64
        lib.kvc_pool_avail.argtypes = [C.c_void_p]
        lib.kvc_pool_capacity.restype = C.c_int64
        lib.kvc_pool_capacity.argtypes = [C.c_void_p]
        lib.kvc_pool_acquire.restype = C.c_int
        lib.kvc_pool_acquire.argtypes = [C.c_void_p, C.c_int64,
                                         C.POINTER(C.c_int32)]
        lib.kvc_pool_release.argtypes = [C.c_void_p, C.POINTER(C.c_int32),
                                         C.c_int64]
        lib.kvc_alloc_create.restype = C.c_void_p
        lib.kvc_alloc_create.argtypes = [
            C.c_void_p, C.c_int64, C.c_int64, C.c_int64,
            C.POINTER(C.c_int32), C.c_char_p, C.c_int64,
            C.c_int, C.c_int, C.c_int, C.c_int,
        ]
        lib.kvc_alloc_destroy.argtypes = [C.c_void_p]
        lib.kvc_set_hooks.argtypes = [C.c_void_p, _MAP_CB, _MAP_CB, C.c_void_p]
        for name in ("kvc_available_blocks", "kvc_mapped_bytes",
                     "kvc_in_use_pages", "kvc_peak_in_use_pages",
                     "kvc_reserved_pages",
                     "kvc_limit_pages", "kvc_num_reserved_blocks"):
            fn = getattr(lib, name)
            fn.restype = C.c_int64
            fn.argtypes = [C.c_void_p]
        lib.kvc_in_shrink.restype = C.c_int
        lib.kvc_in_shrink.argtypes = [C.c_void_p]
        lib.kvc_resize.restype = C.c_int
        lib.kvc_resize.argtypes = [C.c_void_p, C.c_int64]
        lib.kvc_trim.argtypes = [C.c_void_p]
        lib.kvc_reset.argtypes = [C.c_void_p]
        lib.kvc_alloc_blocks.restype = C.c_int64
        lib.kvc_alloc_blocks.argtypes = [C.c_void_p, C.c_int64,
                                         C.POINTER(C.c_int64)]
        lib.kvc_free_blocks.argtypes = [C.c_void_p, C.POINTER(C.c_int64),
                                        C.c_int64]
        lib.kvc_try_to_reserve.restype = C.c_int
        lib.kvc_try_to_reserve.argtypes = [C.c_void_p, C.c_int64]
        lib.kvc_take_reserved_blocks.restype = C.c_int64
        lib.kvc_take_reserved_blocks.argtypes = [C.c_void_p,
                                                 C.POINTER(C.c_int64), C.c_int64]
        lib.kvc_used_blocks.restype = C.c_int64
        lib.kvc_used_blocks.argtypes = [C.c_void_p, C.POINTER(C.c_int64),
                                        C.c_int64]
        lib.kvc_reset_peak_in_use.argtypes = [C.c_void_p]
        lib.kvc_publish_resize_target.argtypes = [C.c_void_p, C.c_int64]
        lib.kvc_version.restype = C.c_int64
        _lib = lib
        return lib


def is_loaded() -> bool:
    try:
        return _load().kvc_version() == 1
    except OSError:
        return False


class NativePagePool:
    """C++ physical free-list (PhysicalBackend protocol).  Page 0 = zero page."""

    def __init__(self, capacity: int):
        self._lib = _load()
        self._h = self._lib.kvc_pool_create(capacity)
        self._capacity = capacity

    @property
    def capacity(self) -> int:
        return self._capacity

    @property
    def handle(self):
        return self._h

    def acquire(self, n: int) -> list[int] | None:
        out = (C.c_int32 * n)()
        if not self._lib.kvc_pool_acquire(self._h, n, out):
            return None
        return list(out)

    def release(self, page_ids: Sequence[int]) -> None:
        n = len(page_ids)
        arr = (C.c_int32 * n)(*page_ids)
        self._lib.kvc_pool_release(self._h, arr, n)

    def avail_physical_pages(self) -> int:
        return self._lib.kvc_pool_avail(self._h)

    def close(self) -> None:
        if self._h:
            self._lib.kvc_pool_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeBlockManager:
    """Full native block-level manager: the C++ fast path for the
    KVCacheManager API (alloc/free/available_size/resize/trim/reserve)."""

    def __init__(
        self,
        pool: NativePagePool,
        *,
        virtual_pages: int,
        blocks_per_page: int,
        page_bytes: int,
        shm_path: str | None = None,
        map_hook=None,
        unmap_hook=None,
        enable_prealloc: bool = True,
        min_reserved: int = MIN_RESERVED_PAGES,
        max_reserved: int = MAX_RESERVED_PAGES,
        poll_ms: int = RESIZE_POLL_MS,
    ):
        self._lib = _load()
        self.pool = pool
        self.virtual_pages = virtual_pages
        self.blocks_per_page = blocks_per_page
        self.page_bytes = page_bytes
        self.page_table = np.zeros(virtual_pages, dtype=np.int32)
        pt_ptr = self.page_table.ctypes.data_as(C.POINTER(C.c_int32))
        total = virtual_pages * page_bytes
        self._h = self._lib.kvc_alloc_create(
            pool.handle, virtual_pages, blocks_per_page, page_bytes, pt_ptr,
            (shm_path or "").encode(), total,
            1 if enable_prealloc else 0, min_reserved, max_reserved, poll_ms,
        )
        # keep callback objects alive for the allocator's lifetime
        self._cb_refs = []
        if map_hook or unmap_hook:
            def wrap(h):
                def cb(vp, pp, n, _user):
                    if h:
                        h(list(vp[0:n]), list(pp[0:n]))
                return _MAP_CB(cb)
            mcb = wrap(map_hook)
            ucb = wrap(unmap_hook)
            self._cb_refs += [mcb, ucb]
            self._lib.kvc_set_hooks(self._h, mcb, ucb, None)

    # -- block-level API (KVCacheManager semantics) --------------------------

    def alloc(self, n: int) -> list[int] | None:
        if n == 0:
            # still apply pending resize targets
            out = (C.c_int64 * 1)()
            got = self._lib.kvc_alloc_blocks(self._h, 0, out)
            return [] if got >= 0 else []
        out = (C.c_int64 * n)()
        got = self._lib.kvc_alloc_blocks(self._h, n, out)
        if got < 0:
            return None
        return list(out[0:got])

    def free(self, block_ids: Sequence[int]) -> None:
        n = len(block_ids)
        if n == 0:
            return
        arr = np.ascontiguousarray(block_ids, dtype=np.int64)
        self._lib.kvc_free_blocks(
            self._h, arr.ctypes.data_as(C.POINTER(C.c_int64)), n
        )

    def available_size(self) -> int:
        return self._lib.kvc_available_blocks(self._h)

    def resize(self, new_bytes: int) -> bool:
        return bool(self._lib.kvc_resize(self._h, new_bytes))

    def trim(self) -> None:
        self._lib.kvc_trim(self._h)

    def reset(self) -> None:
        self._lib.kvc_reset(self._h)

    def try_to_reserve(self, n: int) -> bool:
        return bool(self._lib.kvc_try_to_reserve(self._h, n))

    def free_reserved(self) -> None:
        cap = self._lib.kvc_num_reserved_blocks(self._h)
        if cap <= 0:
            return
        out = (C.c_int64 * cap)()
        n = self._lib.kvc_take_reserved_blocks(self._h, out, cap)
        self.free(list(out[0:n]))

    def used_blocks(self) -> list[int]:
        cap = self.virtual_pages * self.blocks_per_page
        out = (C.c_int64 * cap)()
        n = self._lib.kvc_used_blocks(self._h, out, cap)
        return list(out[0:n])

    def publish_resize_target(self, nbytes: int) -> None:
        self._lib.kvc_publish_resize_target(self._h, nbytes)

    # -- accounting ----------------------------------------------------------

    @property
    def in_shrink(self) -> bool:
        return bool(self._lib.kvc_in_shrink(self._h))

    @property
    def num_in_use(self) -> int:
        return self._lib.kvc_in_use_pages(self._h)

    @property
    def peak_in_use(self) -> int:
        """High-water in_use mark (exact; survives frees/preemptions)."""
        return self._lib.kvc_peak_in_use_pages(self._h)

    def reset_peak_in_use(self) -> None:
        self._lib.kvc_reset_peak_in_use(self._h)

    @property
    def num_reserved(self) -> int:
        return self._lib.kvc_reserved_pages(self._h)

    @property
    def limit_pages(self) -> int:
        return self._lib.kvc_limit_pages(self._h)

    def get_mapped_bytes(self) -> int:
        return self._lib.kvc_mapped_bytes(self._h)

    def shutdown(self) -> None:
        if self._h:
            self._lib.kvc_alloc_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.shutdown()
        except Exception:
            pass
