"""Example 8: hybrid model families over grouped elastic pools (reference
examples/08_hybrid_attention_models).

Two hybrid families:
- full-attention + sliding-window layer groups (gpt-oss pattern): one
  manager per group over a shared arena; the SW group's pages recycle
  mid-sequence,
- attention + mamba (Jamba pattern): KV pages for attention layers plus an
  elastic per-sequence state-slot pool for the mamba layers.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/08_hybrid_models.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

ON_TPU = jax.devices()[0].platform == "tpu"

from kvcached_tpu.engine import EngineConfig, LLMEngine, SamplingParams
from kvcached_tpu.models.hybrid import HybridConfig
from kvcached_tpu.models.mamba import HybridLinearConfig


def main():
    ecfg = dict(max_batch=2, max_model_len=160, page_tokens=16,
                prefill_buckets=(16, 32), num_pages=64,
                interpret=not ON_TPU)

    print("== hybrid attention (full + sliding-window groups) ==")
    eng = LLMEngine(HybridConfig.toy(num_layers=4, window=32),
                    EngineConfig(**ecfg))
    outs = eng.generate([[7] * 16], SamplingParams(max_new_tokens=96))
    m = eng.kv_metrics()
    for g in m["groups"]:
        kind = "full-attn" if g["window"] is None else f"SW({g['window']})"
        print(f"  group {kind}: peak in_use={g['in_use_pages']} pages")
    print(f"  {len(outs[0].output_tokens)} tokens; SW group stayed bounded "
          f"while full-attn accumulated")
    eng.shutdown()

    print("== hybrid linear (attention + mamba state slots) ==")
    eng = LLMEngine(HybridLinearConfig.toy(num_layers=4),
                    EngineConfig(**ecfg))
    outs = eng.generate(
        [[1, 2, 3, 4], [5, 6, 7]], SamplingParams(max_new_tokens=24))
    m = eng.kv_metrics()
    print(f"  state pool: {m['state_pool']}")
    print(f"  generated {sum(len(o.output_tokens) for o in outs)} tokens")
    eng.shutdown()


if __name__ == "__main__":
    main()
