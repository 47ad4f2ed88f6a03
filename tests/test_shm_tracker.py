"""shm control-plane tests.

Ports the reference's multi-process no-lost-updates test
(tests/test_shm_info_tracker.py:136-169): N processes do locked
read-modify-write on one segment; every update must land.
"""

import multiprocessing as mp
import os
import struct
import uuid

import pytest

from kvcached_tpu import shm
from kvcached_tpu.mem_info_tracker import MemInfoTracker


@pytest.fixture
def seg():
    name = f"kvcached_test_{uuid.uuid4().hex[:8]}"
    yield name
    shm.delete_kv_cache_segment(name)


class TestShmBasics:
    def test_init_get_update(self, seg):
        shm.init_kv_cache_limit(seg, 1 << 30)
        info = shm.get_kv_cache_info(seg)
        assert info.total_size == 1 << 30 and info.used_size == 0
        shm.update_memory_usage(seg, 123, 45)
        shm.update_kv_cache_limit(seg, 2 << 30)
        info = shm.get_kv_cache_info(seg)
        assert (info.total_size, info.used_size, info.prealloc_size) == (2 << 30, 123, 45)

    def test_missing_segment_returns_none(self):
        assert shm.get_kv_cache_info("kvcached_definitely_missing") is None

    def test_delete(self, seg):
        shm.init_kv_cache_limit(seg, 1)
        assert shm.delete_kv_cache_segment(seg)
        assert not shm.delete_kv_cache_segment(seg)

    def test_list_segments_by_size(self, seg):
        shm.init_kv_cache_limit(seg, 1)
        assert seg in shm.list_segments()
        # wrong-size files are not detected as segments
        bogus = os.path.join(shm.SHM_DIR, "kvcached_bogus_size")
        with open(bogus, "wb") as f:
            f.write(b"x" * 7)
        try:
            assert "kvcached_bogus_size" not in shm.list_segments()
        finally:
            os.unlink(bogus)


def _hammer(name: str, iters: int, barrier):
    barrier.wait()
    for _ in range(iters):
        with shm.RwLockedShm(name, shm.RwLockedShm.WLOCK) as mm:
            info = shm.MemInfo.unpack(mm[: shm.SHM_SIZE])
            info.used_size += 1
            mm[: shm.SHM_SIZE] = info.pack()


class TestConcurrency:
    def test_no_lost_updates_across_processes(self, seg):
        shm.init_kv_cache_limit(seg, 0)
        nproc, iters = 5, 200
        barrier = mp.Barrier(nproc)
        procs = [
            mp.Process(target=_hammer, args=(seg, iters, barrier)) for _ in range(nproc)
        ]
        for p in procs:
            p.start()
        for p in procs:
            p.join(timeout=60)
            assert p.exitcode == 0
        assert shm.get_kv_cache_info(seg).used_size == nproc * iters


class TestTracker:
    def test_tracker_lifecycle_and_resize_target(self):
        t = MemInfoTracker(f"kvcached_trk_{uuid.uuid4().hex[:6]}", total_size=4096)
        try:
            assert t.get_total_limit() == 4096
            # operator writes a new limit out-of-band (what kvctl does)
            shm.update_kv_cache_limit(t.ipc_name, 8192)
            per_layer = t.check_and_get_resize_target(num_layers=4, num_kv_buffers=2)
            assert per_layer == 8192 // 8
            t.update_memory_usage(100, 10)
            info = shm.get_kv_cache_info(t.ipc_name)
            assert (info.used_size, info.prealloc_size) == (100, 10)
        finally:
            t.close()
        assert shm.get_kv_cache_info(t.ipc_name) is None

    def test_group_suffix(self):
        t = MemInfoTracker(f"kvcached_trk_{uuid.uuid4().hex[:6]}", group_id=2, total_size=1)
        try:
            assert t.ipc_name.endswith("_g2")
        finally:
            t.close()


class TestOperatorResizeLoop:
    def test_kvctl_limit_reaches_manager(self):
        """End-to-end control loop: operator writes shm limit → resize
        watcher picks it up → next alloc applies it (reference call stack
        §3.4)."""
        import time

        from kvcached_tpu import KVCacheManager, KVConfig
        from kvcached_tpu.core import HostPagePool

        cfg = KVConfig(num_layers=2, num_kv_heads=2, head_dim=64,
                       block_tokens=16, page_tokens=64)
        pool = HostPagePool(33)
        name = f"kvcached_e2e_{uuid.uuid4().hex[:6]}"
        mgr = KVCacheManager(cfg, pool, ipc_name=name, enable_prealloc=False)
        try:
            full = mgr.available_size()
            # operator cuts the limit to 4 pages
            shm.update_kv_cache_limit(mgr._tracker.ipc_name, 4 * cfg.page_bytes)
            deadline = time.time() + 5
            while time.time() < deadline:
                mgr.alloc(0)  # triggers resize-target check
                if mgr.available_size() < full:
                    break
                time.sleep(0.05)
            assert mgr.available_size() <= 4 * cfg.blocks_per_page
        finally:
            mgr.shutdown()
