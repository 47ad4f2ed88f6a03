"""Example 9: prefix caching — content-addressed KV page reuse (reference
examples/09_prefix_caching).

The second request with the same long prefix skips recomputation: cached
pages are shared by page-table reference, bit-identical to recompute, and
the evictable pool returns them under memory pressure.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/09_prefix_caching.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

ON_TPU = jax.devices()[0].platform == "tpu"

from kvcached_tpu.engine import EngineConfig, LLMEngine, SamplingParams
from kvcached_tpu.models.llama import LlamaConfig

PREFIX = [((i * 29) % 400) + 1 for i in range(128)]


def main():
    cfg = LlamaConfig.toy()
    eng = LLMEngine(cfg, EngineConfig(
        max_batch=2, max_model_len=512, page_tokens=16,
        prefill_buckets=(16, 32, 64, 128), num_pages=128,
        interpret=not ON_TPU,
    ))
    sp = SamplingParams(max_new_tokens=8)

    t0 = time.time()
    a = eng.generate([PREFIX + [900 % cfg.vocab_size]], sp)
    cold = time.time() - t0

    t0 = time.time()
    b = eng.generate([PREFIX + [901 % cfg.vocab_size]], sp)
    warm = time.time() - t0

    usage = eng.prefix_cache.get_usage()
    print(f"cold TTFT+gen: {cold:.3f}s   warm (cached prefix): {warm:.3f}s "
          f"({cold / max(warm, 1e-9):.1f}x)")
    print(f"prefix cache: {usage}")

    # determinism: a third identical request must match the first exactly
    c = eng.generate([PREFIX + [900 % cfg.vocab_size]], sp)
    assert c[0].output_tokens == a[0].output_tokens, "cache must be exact"
    print("cache-hit output is bit-identical to recompute ✓")
    eng.shutdown()


if __name__ == "__main__":
    main()
