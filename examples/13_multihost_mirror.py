"""Example 13: multi-host page-table mirroring — the consuming engine.

The reference broadcasts every page map/unmap to all TP-rank processes
over unix sockets, and hands out block ids only after every rank acked
(tp_ipc_util.py:173-246).  Here the same plane mirrors virtual→physical
mappings to worker processes on THIS or OTHER hosts (TCP), and the
engine can run as a CONSUMING mirror: its dispatch-time translation
reads only the broadcast-fed copy — so correct serving proves the plane
delivered every mapping in time.

This script: a second process hosts a TCP mirror (stand-in for host 2),
the local engine serves through its own broadcast-fed mirror, and at the
end both mirrors match the allocator's table byte-for-byte.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/13_multihost_mirror.py
"""

import multiprocessing as mp
import os
import sys
import uuid

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def remote_host(ipc: str, q, done) -> None:
    """Second-host stand-in: a TCP WorkerListener whose mirror is updated
    only by the broadcast plane."""
    from kvcached_tpu.parallel.ipc import WorkerListener

    table = np.zeros(4096, np.int32)
    w = WorkerListener(ipc, 1, table, tcp=True)
    try:
        w.set_ready()
        q.put("bound")
        done.wait(timeout=120)
        q.put(table.tolist())
    finally:
        w.close()


def main() -> None:
    import jax

    from kvcached_tpu.engine import EngineConfig, LLMEngine, SamplingParams
    from kvcached_tpu.models.llama import LlamaConfig, init_llama_params
    from kvcached_tpu.parallel.ipc import PageTableBroadcaster, WorkerListener

    ipc = f"ex13-{uuid.uuid4().hex[:6]}"
    ctx = mp.get_context("spawn")
    q, done = ctx.Queue(), ctx.Event()
    proc = ctx.Process(target=remote_host, args=(ipc, q, done), daemon=True)
    proc.start()
    assert q.get(timeout=60) == "bound"
    print("host 2 mirror online (TCP)")

    # host 1: local mirror + the broadcaster the allocator hooks into
    mirror = np.zeros(4096, np.int32)
    local = WorkerListener(ipc, 0, mirror)
    bc = PageTableBroadcaster(ipc, 2)

    cfg = LlamaConfig.toy(dtype="float32")
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    eng = LLMEngine(
        cfg,
        EngineConfig(max_batch=2, max_model_len=128, page_tokens=16,
                     decode_horizon=4, prefill_buckets=(16, 32),
                     num_pages=48, kv_dtype="float32",
                     interpret=jax.devices()[0].platform != "tpu"),
        params=params,
        map_hook=bc.broadcast_map,      # every mapping fans out + acks
        unmap_hook=bc.broadcast_unmap,  # before block ids are handed out
        table_mirror=mirror,            # serve THROUGH the mirror
    )
    try:
        outs = eng.generate([[1, 2, 3, 4, 5], [9, 8, 7]],
                            SamplingParams(max_new_tokens=12))
        print("served", [len(o.output_tokens) for o in outs],
              "tokens through the broadcast-fed mirror")
        alloc_pt = np.array(eng.manager.page_allocator.page_table)
        assert np.array_equal(mirror[: len(alloc_pt)], alloc_pt)
        done.set()
        remote = np.asarray(q.get(timeout=60), np.int32)
        assert np.array_equal(remote[: len(alloc_pt)], alloc_pt)
        print("local and remote mirrors byte-identical to the allocator "
              "table — the all-ranks-atomic invariant held end to end")
    finally:
        eng.shutdown()
        done.set()
        proc.join(timeout=30)
        bc.close()
        local.close()


if __name__ == "__main__":
    main()
