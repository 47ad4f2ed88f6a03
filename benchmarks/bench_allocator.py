"""Allocator micro-benchmarks — the reference's bench_alloc + bench_vmm analogue.

Reference numbers to beat (GB10 / A100, BASELINE.md):
  available_size:      6.52 µs (py) → 0.52 µs (C++)
  group_indices 1024:  52.6 µs → 16.8 µs
  8-thread alloc/free: 9.1 → 51.5 Kops/s
  VMM map (cuMemCreate+Map+SetAccess): ~230 µs/page  ← on TPU this is a
  page-table write: the entire point of the redesign.

Run: python benchmarks/bench_allocator.py
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from kvcached_tpu.config import KVConfig
from kvcached_tpu.core import HostPagePool, group_blocks_by_page, native_available
from kvcached_tpu.kv_cache_manager import KVCacheManager


def timeit(fn, n=10000):
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1e6  # µs


def make_py(pages=4096):
    cfg = KVConfig(num_layers=8, num_kv_heads=8, head_dim=128,
                   block_tokens=64, page_tokens=64)
    return KVCacheManager(cfg, HostPagePool(pages + 1), enable_prealloc=False), cfg


def make_native(pages=4096):
    from kvcached_tpu.core.native import NativePagePool
    from kvcached_tpu.kv_cache_manager_native import NativeKVCacheManager

    cfg = KVConfig(num_layers=8, num_kv_heads=8, head_dim=128,
                   block_tokens=64, page_tokens=64)
    return NativeKVCacheManager(cfg, NativePagePool(pages + 1),
                                enable_prealloc=False), cfg


def bench_available_size(mk, label):
    mgr, _ = mk()
    blocks = mgr.alloc(1000)
    us = timeit(mgr.available_size)
    print(f"available_size      [{label:>6}]: {us:8.2f} us")
    mgr.free(blocks)
    mgr.shutdown()
    return us


def bench_alloc_free(mk, label, batch=64):
    mgr, _ = mk()

    def op():
        b = mgr.alloc(batch)
        mgr.free(b)

    us = timeit(op, n=2000)
    print(f"alloc+free batch={batch} [{label:>6}]: {us:8.2f} us ({batch * 2 / us:.2f} Mops/s)")
    mgr.shutdown()
    return us

def bench_group_by_page(n=1024):
    ids = np.random.default_rng(0).integers(0, 4096, n).tolist()
    us = timeit(lambda: group_blocks_by_page(ids, 1), n=2000)
    print(f"group_by_page n={n} [python]: {us:8.2f} us")
    return us


def bench_multithread(mk, label, threads=8, iters=2000):
    mgr, _ = mk()
    ops = [0] * threads

    def worker(i):
        rng = np.random.default_rng(i)
        held = []
        for _ in range(iters):
            if held and rng.random() < 0.5:
                mgr.free(held.pop())
            else:
                b = mgr.alloc(int(rng.integers(1, 8)))
                if b is not None:
                    held.append(b)
            ops[i] += 1
        for h in held:
            mgr.free(h)

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(threads)]
    t0 = time.perf_counter()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    dt = time.perf_counter() - t0
    kops = sum(ops) / dt / 1e3
    print(f"{threads}-thread alloc/free [{label:>6}]: {kops:8.1f} Kops/s")
    mgr.shutdown()
    return kops


def bench_map_latency():
    """TPU 'map' = acquire physical page + write page-table entry.  The
    reference's cuMemCreate+cuMemMap+cuMemSetAccess totals ~230 µs/page."""
    from kvcached_tpu.core.page_allocator_py import PageAllocator

    pool = HostPagePool(4097)
    pa = PageAllocator(virtual_pages=4096, blocks_per_page=1, page_bytes=1 << 20,
                       backend=pool, enable_prealloc=False)
    pages = []

    def map_one():
        pages.append(pa.alloc_page())

    us = timeit(map_one, n=4000)
    print(f"map (page-table write) [python]: {us:8.3f} us   (reference VMM: ~230 us)")
    pa.free_pages([p.vpage for p in pages])
    pa.shutdown()
    return us


def main():
    print("== kvcached-tpu allocator benchmarks ==")
    bench_map_latency()
    bench_group_by_page()
    results = {}
    for mk, label in [(make_py, "python")] + (
        [(make_native, "native")] if native_available() else []
    ):
        results[label] = {
            "available_size_us": bench_available_size(mk, label),
            "alloc_free_us": bench_alloc_free(mk, label),
            "multithread_kops": bench_multithread(mk, label),
        }
    if "native" in results:
        p, n = results["python"], results["native"]
        print(f"\nspeedups (native vs python): "
              f"available_size {p['available_size_us']/n['available_size_us']:.1f}x, "
              f"alloc/free {p['alloc_free_us']/n['alloc_free_us']:.1f}x, "
              f"8-thread {n['multithread_kops']/p['multithread_kops']:.1f}x")


if __name__ == "__main__":
    main()
