"""Example 1: one model with an elastic KV pool under operator control.

Run:            python examples/01_elastic_single_model.py
In another shell: python -m kvcached_tpu.cli.kvctl list
                  python -m kvcached_tpu.cli.kvctl limit kvcached_tpu_demo 2M
Watch the engine shrink its pool live while continuing to serve.
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

ON_TPU = jax.devices()[0].platform == "tpu"

from kvcached_tpu.engine import EngineConfig, LLMEngine, SamplingParams
from kvcached_tpu.models.llama import LlamaConfig


def main():
    cfg = LlamaConfig.toy() if not ON_TPU else LlamaConfig(
        hidden_size=1024, num_layers=8, num_heads=8, num_kv_heads=4,
        intermediate_size=2816,
    )
    eng = LLMEngine(cfg, EngineConfig(
        max_batch=4, max_model_len=512, page_tokens=16 if not ON_TPU else 64,
        prefill_buckets=(64, 128), num_pages=256,
        interpret=not ON_TPU, ipc_name="kvcached_tpu_demo",
    ))
    print("engine up — control me with: kvctl limit kvcached_tpu_demo <size>")
    for round_ in range(20):
        outs = eng.generate(
            [[round_ * 7 + i + 1 for i in range(16)] for _ in range(3)],
            SamplingParams(max_new_tokens=32),
        )
        m = eng.kv_metrics()
        print(f"round {round_}: mapped={m['mapped_bytes']/1e6:.2f}MB "
              f"avail_blocks={m['available_blocks']} "
              f"preempt={m['preemptions']}")
    eng.shutdown()


if __name__ == "__main__":
    main()
