"""Page-table broadcast latency — the reference's bench_tp_ipc analogue.

Reference (4×L40S, TP=4): ~2.10 ms per page map broadcast (async fan-out),
because every rank re-executes the driver VMM calls.  On TPU the broadcast
carries 16 bytes of metadata per page and workers just write an int32, so
the target is 2-3 orders of magnitude lower.

Run: python benchmarks/bench_broadcast.py
"""

import os
import sys
import time
import uuid

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from kvcached_tpu.parallel.ipc import PageTableBroadcaster, WorkerListener


def bench(world_size: int, pages_per_msg: int, iters: int = 2000,
          tcp: bool = False):
    ipc = f"bench{uuid.uuid4().hex[:6]}"
    tables = [np.zeros(65536, np.int32) for _ in range(world_size)]
    workers = [
        WorkerListener(ipc, r, tables[r], tcp=tcp) for r in range(world_size)
    ]
    bc = PageTableBroadcaster(ipc, world_size)
    try:
        vp = list(range(pages_per_msg))
        pp = list(range(1, pages_per_msg + 1))
        bc.broadcast_map(vp, pp)  # warm connections
        t0 = time.perf_counter()
        for _ in range(iters):
            bc.broadcast_map(vp, pp)
        dt = (time.perf_counter() - t0) / iters
        print(f"{'tcp' if tcp else 'uds'} TP={world_size} "
              f"pages/msg={pages_per_msg:4d}: "
              f"{dt * 1e6:8.1f} us/broadcast  "
              f"({dt / pages_per_msg * 1e6:6.2f} us/page)")
        return dt
    finally:
        bc.close()
        for w in workers:
            w.close()


def bench_mirrored_serving(world_size: int = 2):
    """Amortization of the broadcast on a CONSUMING-mirror engine: the
    prealloc thread maps pages (and pays the all-ranks ack round-trip)
    ahead of demand, so the scheduler thread should pay the broadcast only
    on cold spikes — the reference's map-off-critical-path mechanism
    (prealloc keeps 5-10 pages warm).  Reports hook time split by thread.
    """
    import threading

    import jax

    jax.config.update("jax_platforms", "cpu")
    from kvcached_tpu.engine import EngineConfig, LLMEngine, SamplingParams
    from kvcached_tpu.models.llama import LlamaConfig, init_llama_params

    ipc = f"mirr{uuid.uuid4().hex[:6]}"
    mirrors = [np.zeros(4096, np.int32) for _ in range(world_size)]
    workers = [
        WorkerListener(ipc, r, mirrors[r]) for r in range(world_size)
    ]
    bc = PageTableBroadcaster(ipc, world_size)
    sched_thread = threading.current_thread()
    stats = {"sched_s": 0.0, "sched_n": 0, "bg_s": 0.0, "bg_n": 0}

    def timed_map(vp, pp):
        t0 = time.perf_counter()
        bc.broadcast_map(vp, pp)
        dt = time.perf_counter() - t0
        key = "sched" if threading.current_thread() is sched_thread else "bg"
        stats[key + "_s"] += dt
        stats[key + "_n"] += 1

    cfg = LlamaConfig.toy()
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    eng = LLMEngine(
        cfg,
        EngineConfig(max_batch=4, max_model_len=256, page_tokens=16,
                     decode_horizon=4, prefill_buckets=(64,), num_pages=256,
                     interpret=True, enable_prefix_caching=False),
        params=params,
        map_hook=timed_map, unmap_hook=bc.broadcast_unmap,
        table_mirror=mirrors[0],
    )
    try:
        prompts = [[i + 2] * 48 for i in range(8)]
        t0 = time.perf_counter()
        eng.generate(prompts, SamplingParams(max_new_tokens=64))
        wall = time.perf_counter() - t0
    finally:
        eng.shutdown()
        bc.close()
        for w in workers:
            w.close()
    print(
        f"mirrored serving (world={world_size}): wall {wall:.2f} s; "
        f"broadcast on scheduler thread {stats['sched_s'] * 1e3:.1f} ms "
        f"over {stats['sched_n']} calls "
        f"({stats['sched_s'] / wall * 100:.2f}% of wall), "
        f"amortized to prealloc thread {stats['bg_s'] * 1e3:.1f} ms "
        f"over {stats['bg_n']} calls"
    )


def main():
    print("== page-table broadcast latency (reference: ~2100 us/page at TP=4) ==")
    for world in (1, 2, 4, 8):
        bench(world, 1)
    print("-- batched --")
    for n in (8, 64, 512):
        bench(4, n, iters=500)
    print("-- tcp loopback (multi-host plane; real DCN adds wire RTT) --")
    for world in (1, 4):
        bench(world, 1, tcp=True)
    bench(4, 64, iters=500, tcp=True)
    print("-- consuming-mirror serving: broadcast amortization --")
    bench_mirrored_serving(2)


if __name__ == "__main__":
    main()
