"""Allocator-core unit tests (device-free).

Ports the *semantics* of the reference's Tier-1/Tier-2 tests
(tests/test_kvcache_manager.py: conservation, over-allocation → None, trim,
reserve/free_reserved; plus deferred-shrink and elastic resize) against the
host-memory backend — the role the reference's CPUPage plays.
"""

import threading

import pytest

from kvcached_tpu import KVCacheManager, KVConfig, KVCachedConfigError
from kvcached_tpu.core import HostPagePool, group_blocks_by_page
from kvcached_tpu.core.page_allocator_py import ZERO_PAGE, PageAllocator, PageState


def make_cfg(**kw):
    base = dict(
        num_layers=4, num_kv_heads=2, head_dim=64, block_tokens=16, page_tokens=64
    )
    base.update(kw)
    return KVConfig(**base)


def make_mgr(capacity_pages=64, prealloc=False, **kw):
    cfg = make_cfg()
    pool = HostPagePool(capacity_pages + 1)  # +1 for the zero page
    mgr = KVCacheManager(cfg, pool, enable_prealloc=prealloc, **kw)
    return mgr, cfg, pool


class TestConfig:
    def test_geometry_validation(self):
        with pytest.raises(KVCachedConfigError):
            make_cfg(page_tokens=60)  # not multiple of block_tokens=16
        with pytest.raises(KVCachedConfigError):
            make_cfg(block_tokens=0)
        with pytest.raises(KVCachedConfigError):
            KVConfig(num_layers=0, num_kv_heads=2, head_dim=64)

    def test_sizes(self):
        cfg = make_cfg()
        assert cfg.blocks_per_page == 4
        assert cfg.cell_bytes == 2 * 64 * 2  # heads*dim*bf16
        assert cfg.page_bytes == 64 * cfg.cell_bytes * 4 * 2


class TestPageState:
    def test_alloc_free_roundtrip(self):
        p = PageState(vpage=3, blocks_per_page=4)
        ids = p.alloc(4)
        assert ids == [12, 13, 14, 15]
        assert p.full and not p.empty
        p.free_batch([13, 14])
        assert p.num_free == 2
        assert sorted(p.used_blocks()) == [12, 15]
        p.free_batch([12, 15])
        assert p.empty

    def test_partial_alloc(self):
        p = PageState(0, 4)
        assert p.alloc(10) == [0, 1, 2, 3]  # clamped to capacity


class TestGrouping:
    def test_group_blocks_by_page(self):
        g = group_blocks_by_page([0, 1, 5, 4, 9], 4)
        assert g == {0: [0, 1], 1: [5, 4], 2: [9]}


class TestKVCacheManager:
    def test_null_block_is_zero(self):
        mgr, _, _ = make_mgr()
        assert mgr.null_block == 0
        mgr.shutdown()

    def test_alloc_free_conservation(self):
        mgr, cfg, _ = make_mgr(capacity_pages=8)
        avail0 = mgr.available_size()
        blocks = mgr.alloc(10)
        assert blocks is not None and len(blocks) == 10
        assert len(set(blocks)) == 10
        assert mgr.available_size() == avail0 - 10
        mgr.free(blocks)
        assert mgr.available_size() == avail0
        mgr.shutdown()

    def test_over_allocation_returns_none(self):
        mgr, cfg, _ = make_mgr(capacity_pages=4)
        avail = mgr.available_size()
        assert mgr.alloc(avail + 1) is None
        # and a failed alloc must not leak capacity
        assert mgr.available_size() == avail
        got = mgr.alloc(avail)
        assert got is not None and len(got) == avail
        assert mgr.alloc(1) is None
        mgr.free(got)
        mgr.shutdown()

    def test_physical_pressure_two_groups(self):
        """Two managers sharing one physical pool: allocation in one shrinks
        availability in the other (the colocated-models arbitration)."""
        cfg_a = make_cfg(group_id=0)
        cfg_b = make_cfg(group_id=1)
        pool = HostPagePool(9)  # 8 usable pages
        a = KVCacheManager(cfg_a, pool, enable_prealloc=False)
        b = KVCacheManager(cfg_b, pool, enable_prealloc=False)
        bpp = cfg_a.blocks_per_page
        # null blocks each consumed one page
        assert a.available_size() == 6 * bpp + (bpp - 1)
        got = a.alloc(5 * bpp)
        assert got is not None
        assert b.available_size() == 1 * bpp + (bpp - 1)
        a.free(got)
        a.shutdown()
        b.shutdown()

    def test_trim_releases_reserved_pages(self):
        mgr, cfg, pool = make_mgr(capacity_pages=16)
        blocks = mgr.alloc(cfg.blocks_per_page * 4)
        mgr.free(blocks)
        # empty pages parked as reserved (mapped)
        assert mgr.page_allocator.num_reserved > 0
        mapped_before = mgr.get_mapped_memory_size()
        mgr.trim()
        assert mgr.page_allocator.num_reserved == 0
        assert mgr.get_mapped_memory_size() < mapped_before
        mgr.shutdown()

    def test_reserve_and_free_reserved(self):
        mgr, cfg, _ = make_mgr(capacity_pages=8)
        avail = mgr.available_size()
        assert mgr.try_to_reserve(6)
        assert mgr.available_size() == avail  # reserved still counted available
        blocks = mgr.alloc(6)
        assert blocks is not None
        mgr.free(blocks)
        assert mgr.try_to_reserve(4)
        mgr.free_reserved()
        assert mgr.available_size() == avail
        mgr.shutdown()

    def test_resize_shrink_deferred(self):
        mgr, cfg, _ = make_mgr(capacity_pages=16)
        bpp = cfg.blocks_per_page
        blocks = mgr.alloc(8 * bpp - 1)  # 8 pages in use (incl null page)
        assert blocks is not None
        # shrink to 4 pages: cannot revoke in-use pages → deferred
        ok = mgr.resize(4 * cfg.page_bytes)
        assert not ok and mgr.in_shrink
        assert mgr.available_size() == 0
        # free 5 pages' worth → usage 3 pages ≤ target 4 → shrink completes
        mgr.free(blocks[: 5 * bpp - 1])
        assert not mgr.in_shrink
        assert mgr.page_allocator.num_in_use <= 4
        mgr.free(blocks[5 * bpp - 1 :])
        mgr.shutdown()

    def test_resize_grow_restores_capacity(self):
        mgr, cfg, _ = make_mgr(capacity_pages=16)
        assert mgr.resize(4 * cfg.page_bytes) in (True, False)
        small = mgr.available_size()
        assert mgr.resize(16 * cfg.page_bytes)
        assert mgr.available_size() > small
        mgr.shutdown()

    def test_clear_restores_null_block(self):
        mgr, cfg, _ = make_mgr(capacity_pages=8)
        blocks = mgr.alloc(13)
        assert blocks is not None
        mgr.clear()
        assert mgr.null_block == 0
        b2 = mgr.alloc(5)
        assert b2 is not None and 0 not in b2
        mgr.shutdown()

    def test_prealloc_thread_keeps_reserved_pages(self):
        mgr, cfg, _ = make_mgr(capacity_pages=64, prealloc=True)
        deadline = threading.Event()
        for _ in range(100):
            if mgr.page_allocator.num_reserved >= 5:
                break
            deadline.wait(0.02)
        assert mgr.page_allocator.num_reserved >= 5
        # alloc_page should now hit the fast path (reserved pool)
        blocks = mgr.alloc(cfg.blocks_per_page)
        assert blocks is not None
        mgr.free(blocks)
        mgr.shutdown()


class TestZeroPageSemantics:
    def test_unmapped_vpages_point_at_zero_page(self):
        mgr, cfg, _ = make_mgr(capacity_pages=8)
        pt = mgr.page_allocator.page_table
        blocks = mgr.alloc(cfg.blocks_per_page * 2)
        mapped = {b // cfg.blocks_per_page for b in blocks}
        for vp in range(mgr.page_allocator.virtual_pages):
            if vp in mapped or vp == 0:  # 0 = null block's page
                assert pt[vp] != ZERO_PAGE
        mgr.trim()
        mgr.free(blocks)
        mgr.trim()
        for b in blocks:
            vp = b // cfg.blocks_per_page
            if vp == 0:
                continue  # null block keeps page 0 mapped
            assert pt[vp] == ZERO_PAGE
        mgr.shutdown()

    def test_mapped_pages_are_distinct_physical(self):
        mgr, cfg, _ = make_mgr(capacity_pages=32)
        blocks = mgr.alloc(cfg.blocks_per_page * 8)
        pt = mgr.page_allocator.page_table
        ppages = [int(pt[b // cfg.blocks_per_page]) for b in blocks]
        mapped = {b // cfg.blocks_per_page: int(pt[b // cfg.blocks_per_page]) for b in blocks}
        assert len(set(mapped.values())) == len(mapped)  # no aliasing of live pages
        assert all(p != ZERO_PAGE for p in ppages)
        mgr.shutdown()


class TestMapHooks:
    def test_hooks_see_every_transition(self):
        events = []
        cfg = make_cfg()
        pool = HostPagePool(16)
        mgr = KVCacheManager(
            cfg,
            pool,
            enable_prealloc=False,
            map_hook=lambda v, p: events.append(("map", tuple(v), tuple(p))),
            unmap_hook=lambda v, p: events.append(("unmap", tuple(v), tuple(p))),
        )
        blocks = mgr.alloc(cfg.blocks_per_page * 3)
        mgr.free(blocks)
        mgr.trim()
        maps = [e for e in events if e[0] == "map"]
        unmaps = [e for e in events if e[0] == "unmap"]
        n_mapped = sum(len(e[1]) for e in maps)
        n_unmapped = sum(len(e[1]) for e in unmaps)
        assert n_mapped == n_unmapped + mgr.page_allocator.num_in_use + mgr.page_allocator.num_reserved
        mgr.shutdown()
