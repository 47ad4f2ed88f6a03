"""Allocator core: page bookkeeping, prealloc + resize-watcher threads.

Two interchangeable implementations of the same API:

- :mod:`kvcached_tpu.core.page_allocator_py` — pure Python, always available.
- :mod:`kvcached_tpu.core.native` — ctypes bindings to ``libkvcached_core.so``
  (C++, built from ``csrc/``), the fast path mirroring the reference's C++
  ``PageAllocator``/``InternalPage`` (csrc/page_allocator.cpp).

``get_page_allocator_cls()`` picks native when built unless
``KVCACHED_FORCE_PYTHON_CORE`` is set.
"""

from __future__ import annotations

from ..config import FORCE_PYTHON_CORE
from .page_allocator_py import (
    HostPagePool,
    PageAllocator,
    PageState,
    group_blocks_by_page,
)

__all__ = [
    "PageAllocator",
    "PageState",
    "HostPagePool",
    "group_blocks_by_page",
    "get_page_allocator_cls",
    "native_available",
]


def native_available() -> bool:
    if FORCE_PYTHON_CORE:
        return False
    try:
        from . import native  # noqa: F401

        return native.is_loaded()
    except Exception:
        return False


def get_page_allocator_cls():
    # The Python KVCacheManager always pairs with the Python PageAllocator;
    # the native C++ path replaces the whole manager (see
    # kv_cache_manager_native.create_kv_cache_manager), not just this layer.
    return PageAllocator
