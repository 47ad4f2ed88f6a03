"""Example 5: multi-agent serving over one elastic engine (reference
examples/05_multi_agents).

N agents share one long system prompt; the prefix cache turns every agent's
prefill into a page-table lookup, and the elastic pool absorbs the bursty,
overlapping agent turns.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/05_multi_agents.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

ON_TPU = jax.devices()[0].platform == "tpu"

from kvcached_tpu.engine import EngineConfig, LLMEngine, SamplingParams
from kvcached_tpu.models.llama import LlamaConfig

SYSTEM_PROMPT = [((i * 17) % 400) + 1 for i in range(64)]  # shared prefix


def main():
    cfg = LlamaConfig.toy()
    eng = LLMEngine(cfg, EngineConfig(
        max_batch=4, max_model_len=256, page_tokens=16,
        prefill_buckets=(16, 32, 64), num_pages=128, interpret=not ON_TPU,
    ))

    agents = [[500 + a, 400 + a, 300 + a] for a in range(6)]
    t0 = time.time()
    outs = eng.generate(
        [SYSTEM_PROMPT + turn for turn in agents],
        SamplingParams(max_new_tokens=16),
    )
    dt = time.time() - t0
    usage = eng.prefix_cache.get_usage()
    print(f"6 agents, shared 64-token system prompt: {dt:.2f}s")
    print(f"prefix cache: hit_rate={usage['hit_rate']:.2f} "
          f"(hits={usage['hits']} misses={usage['misses']})")
    for a, o in enumerate(outs):
        print(f"  agent {a}: {o.output_tokens[:6]}…")
    eng.shutdown()


if __name__ == "__main__":
    main()
