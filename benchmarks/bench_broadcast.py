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


if __name__ == "__main__":
    main()
