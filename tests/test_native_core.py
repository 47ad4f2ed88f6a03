"""Native C++ core: API parity with the Python reference implementation,
plus native-only concerns (thread-safety, hook delivery, shm watcher).
"""

import threading
import time
import uuid

import numpy as np
import pytest

from kvcached_tpu import shm
from kvcached_tpu.config import KVConfig
from kvcached_tpu.core import native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="libkvcached_core.so not built"
)


def make_native(capacity_pages=64, prealloc=False, ipc_name=None, **kw):
    from kvcached_tpu.core.native import NativePagePool
    from kvcached_tpu.kv_cache_manager_native import NativeKVCacheManager

    cfg = KVConfig(
        num_layers=4, num_kv_heads=2, head_dim=64, block_tokens=16, page_tokens=64
    )
    pool = NativePagePool(capacity_pages + 1)
    mgr = NativeKVCacheManager(
        cfg, pool, enable_prealloc=prealloc, ipc_name=ipc_name, **kw
    )
    return mgr, cfg, pool


class TestParity:
    """Same semantic checks the Python backend passes (test_kv_cache_manager)."""

    def test_null_block_and_conservation(self):
        mgr, cfg, _ = make_native(8)
        assert mgr.null_block == 0
        avail0 = mgr.available_size()
        blocks = mgr.alloc(10)
        assert blocks is not None and len(set(blocks)) == 10
        assert mgr.available_size() == avail0 - 10
        mgr.free(blocks)
        assert mgr.available_size() == avail0
        mgr.shutdown()

    def test_over_allocation(self):
        mgr, cfg, _ = make_native(4)
        avail = mgr.available_size()
        assert mgr.alloc(avail + 1) is None
        assert mgr.available_size() == avail
        got = mgr.alloc(avail)
        assert got is not None and len(got) == avail
        mgr.free(got)
        mgr.shutdown()

    def test_trim_and_reserved_pages(self):
        mgr, cfg, _ = make_native(16)
        blocks = mgr.alloc(cfg.blocks_per_page * 4)
        mgr.free(blocks)
        assert mgr.page_allocator.num_reserved > 0
        before = mgr.get_mapped_memory_size()
        mgr.trim()
        assert mgr.page_allocator.num_reserved == 0
        assert mgr.get_mapped_memory_size() < before
        mgr.shutdown()

    def test_reserve_roundtrip(self):
        mgr, cfg, _ = make_native(8)
        avail = mgr.available_size()
        assert mgr.try_to_reserve(6)
        assert mgr.available_size() == avail
        mgr.free_reserved()
        assert mgr.available_size() == avail
        mgr.shutdown()

    def test_deferred_shrink(self):
        mgr, cfg, _ = make_native(16)
        bpp = cfg.blocks_per_page
        blocks = mgr.alloc(8 * bpp - 1)
        ok = mgr.resize(4 * cfg.page_bytes)
        assert not ok and mgr.in_shrink
        assert mgr.available_size() == 0
        mgr.free(blocks[: 5 * bpp - 1])
        assert not mgr.in_shrink
        assert mgr.page_allocator.num_in_use <= 4
        mgr.shutdown()

    def test_clear_restores_null_block(self):
        mgr, cfg, _ = make_native(8)
        mgr.alloc(13)
        mgr.clear()
        assert mgr.null_block == 0
        b = mgr.alloc(5)
        assert b is not None and 0 not in b
        mgr.shutdown()

    def test_page_table_shared_with_numpy(self):
        mgr, cfg, _ = make_native(16)
        pt = mgr.page_allocator.page_table
        blocks = mgr.alloc(cfg.blocks_per_page * 2)
        vps = sorted({b // cfg.blocks_per_page for b in blocks})
        for vp in vps:
            assert pt[vp] != 0  # C++ wrote through the shared numpy buffer
        mgr.free(blocks)
        mgr.trim()
        for vp in vps:
            if vp != 0:
                assert pt[vp] == 0
        mgr.shutdown()

    def test_hooks_fire_outside_lock(self):
        events = []

        def on_map(v, p):
            events.append(("map", len(v)))

        def on_unmap(v, p):
            events.append(("unmap", len(v)))

        from kvcached_tpu.core.native import NativePagePool
        from kvcached_tpu.kv_cache_manager_native import NativeKVCacheManager

        cfg = KVConfig(num_layers=2, num_kv_heads=2, head_dim=64,
                       block_tokens=16, page_tokens=64)
        pool = NativePagePool(17)
        mgr = NativeKVCacheManager(cfg, pool, enable_prealloc=False,
                                   map_hook=on_map, unmap_hook=on_unmap)
        blocks = mgr.alloc(cfg.blocks_per_page * 3)
        mgr.free(blocks)
        mgr.trim()
        n_map = sum(n for e, n in events if e == "map")
        n_unmap = sum(n for e, n in events if e == "unmap")
        assert n_map == n_unmap + mgr.page_allocator.num_in_use
        mgr.shutdown()


class TestNativeOnly:
    def test_multithreaded_alloc_free(self):
        """The reference's 8-thread alloc/free stress (bench_alloc §4) as a
        correctness check: conservation must hold under contention."""
        mgr, cfg, _ = make_native(256, prealloc=True)
        avail0 = mgr.available_size()
        errors = []

        def worker(seed):
            rng = np.random.default_rng(seed)
            held = []
            try:
                for _ in range(300):
                    if held and rng.random() < 0.5:
                        mgr.free(held.pop())
                    else:
                        b = mgr.alloc(int(rng.integers(1, 8)))
                        if b is not None:
                            held.append(b)
                for h in held:
                    mgr.free(h)
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors
        assert mgr.available_size() == avail0
        mgr.shutdown()

    def test_shm_watcher_applies_operator_limit(self):
        name = f"kvcached_nat_{uuid.uuid4().hex[:6]}"
        mgr, cfg, _ = make_native(32, ipc_name=name)
        try:
            full = mgr.available_size()
            shm.update_kv_cache_limit(name, 4 * cfg.page_bytes)
            deadline = time.time() + 5
            while time.time() < deadline:
                mgr.alloc(0)  # applies pending resize target
                if mgr.available_size() < full:
                    break
                time.sleep(0.05)
            assert mgr.available_size() <= 4 * cfg.blocks_per_page
        finally:
            mgr.shutdown()
        assert shm.get_kv_cache_info(name) is None  # segment cleaned up

    def test_two_groups_share_physical_pool(self):
        from kvcached_tpu.core.native import NativePagePool
        from kvcached_tpu.kv_cache_manager_native import NativeKVCacheManager

        cfg = KVConfig(num_layers=2, num_kv_heads=2, head_dim=64,
                       block_tokens=16, page_tokens=64)
        pool = NativePagePool(9)
        a = NativeKVCacheManager(cfg, pool, enable_prealloc=False)
        b = NativeKVCacheManager(cfg, pool, enable_prealloc=False)
        bpp = cfg.blocks_per_page
        got = a.alloc(5 * bpp)
        assert got is not None
        assert b.available_size() == 1 * bpp + (bpp - 1)
        a.free(got)
        a.shutdown()
        b.shutdown()


def test_peak_in_use_high_water():
    """peak_in_use survives frees (exact high-water, not sampled)."""
    from kvcached_tpu import KVConfig
    from kvcached_tpu.kv_cache_manager_native import create_kv_cache_manager
    from kvcached_tpu.core.native import NativePagePool

    cfg = KVConfig(num_layers=2, num_kv_heads=2, head_dim=64,
                   block_tokens=16, page_tokens=16)
    mgr = create_kv_cache_manager(cfg, NativePagePool(32),
                                  reserve_null_block=False,
                                  enable_prealloc=False)
    try:
        pa = mgr.page_allocator
        a = mgr.alloc(8)
        assert pa.peak_in_use == 8
        mgr.free(a)
        assert pa.num_in_use == 0
        assert pa.peak_in_use == 8  # survives the free
        b = mgr.alloc(3)
        assert pa.peak_in_use == 8
        pa.reset_peak_in_use()
        assert pa.peak_in_use == 3
        mgr.free(b)
    finally:
        mgr.shutdown()
