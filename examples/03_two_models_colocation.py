"""Example 3: two models colocated on one chip's HBM pool (the headline
kvcached story — reference examples/01_simple_two_models).

Both engines draw physical pages from ONE DevicePagePool; when model B is
idle, model A's burst grows into B's unused memory, and vice versa.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/03_two_models_colocation.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

ON_TPU = jax.devices()[0].platform == "tpu"

from kvcached_tpu.engine import EngineConfig, LLMEngine, SamplingParams
from kvcached_tpu.models.llama import LlamaConfig


def main():
    cfg = LlamaConfig.toy() if not ON_TPU else LlamaConfig(
        hidden_size=1024, num_layers=8, num_heads=8, num_kv_heads=4,
        intermediate_size=2816)
    ecfg = dict(
        max_batch=4, max_model_len=256, page_tokens=16 if not ON_TPU else 64,
        prefill_buckets=(32, 64), num_pages=96, interpret=not ON_TPU,
    )
    a = LLMEngine(cfg, EngineConfig(ipc_name="demo_model_a", **ecfg))
    b = LLMEngine(
        cfg, EngineConfig(ipc_name="demo_model_b", **ecfg),
        params=a.params, shared_pool=a.pool, pool_arrays=a.arrays,
    )
    total = a.pool.capacity - 1

    def phys_free():
        return a.pool.avail_physical_pages()

    print(f"shared pool: {total} pages")
    # phase 1: A bursts while B idles — A can use nearly everything
    outs = a.generate(
        [[i + 1 for i in range(24)] for _ in range(4)],
        SamplingParams(max_new_tokens=48),
    )
    print(f"A burst: {sum(len(o.output_tokens) for o in outs)} tokens, "
          f"A in_use={a.manager.page_allocator.num_in_use} "
          f"free={phys_free()}")
    a.manager.trim()

    # phase 2: B bursts into the space A released
    outs = b.generate(
        [[i + 3 for i in range(24)] for _ in range(4)],
        SamplingParams(max_new_tokens=48),
    )
    print(f"B burst: {sum(len(o.output_tokens) for o in outs)} tokens, "
          f"B in_use={b.manager.page_allocator.num_in_use} "
          f"free={phys_free()}")
    b.manager.trim()
    print(f"drained: free={phys_free()} (pages are fungible between models)")
    a.shutdown()
    b.shutdown()


if __name__ == "__main__":
    main()
