"""Example 2: serverless cold-start — sleep/wake with elastic HBM handoff.

The reference's examples/06_serverless_serving story: an idle model's
weights offload to host RAM and its KV pages return to the shared pool, so
a colocated busy model can grow into the freed memory; the first request to
the sleeping model wakes it transparently.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/02_serverless_coldstart.py
(or on TPU: python examples/02_serverless_coldstart.py)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

ON_TPU = jax.devices()[0].platform == "tpu"

from kvcached_tpu.engine import EngineConfig, LLMEngine, SamplingParams
from kvcached_tpu.models.llama import LlamaConfig, init_llama_params
from kvcached_tpu.server import AsyncEngineRunner, ModelHandle


def main():
    cfg = LlamaConfig.toy() if not ON_TPU else LlamaConfig(
        hidden_size=1024, num_layers=8, num_heads=8, num_kv_heads=4,
        intermediate_size=2816)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    ec = dict(max_batch=4, max_model_len=256,
              page_tokens=16 if not ON_TPU else 64,
              prefill_buckets=(64,), num_pages=128, interpret=not ON_TPU)

    hot = LLMEngine(cfg, EngineConfig(**ec), params=params)
    cold = LLMEngine(cfg, EngineConfig(**ec), params=params,
                     shared_pool=hot.pool, pool_arrays=hot.arrays)
    handle_cold = ModelHandle("cold-model", cold)

    def pool_free():
        return hot.pool.avail_physical_pages()

    print(f"boot: {pool_free()} free pages in the shared pool")

    # cold model serves one request, building up a KV working set
    cold.generate([[7] * 60], SamplingParams(max_new_tokens=40))
    print(f"after cold-model traffic: {pool_free()} free pages "
          f"(cold holds {cold.manager.page_allocator.num_in_use + cold.manager.page_allocator.num_reserved})")

    # idle detector would do this automatically (controller.sleep_manager)
    t0 = time.perf_counter()
    handle_cold.sleep()
    print(f"cold model slept in {(time.perf_counter()-t0)*1e3:.1f} ms → "
          f"{pool_free()} free pages (weights offloaded to host RAM)")

    # the hot model can now use the whole pool
    outs = hot.generate([[i + 1] * 60 for i in range(4)],
                        SamplingParams(max_new_tokens=60))
    print(f"hot model burst served; {pool_free()} free pages remain")

    # cold start: first request wakes the model
    t0 = time.perf_counter()
    handle_cold.wake_up()
    out = cold.generate([[9, 8, 7]], SamplingParams(max_new_tokens=8))
    print(f"cold start (wake + first request): {(time.perf_counter()-t0)*1e3:.1f} ms, "
          f"tokens={out[0].output_tokens}")

    hot.shutdown()
    cold.shutdown()

    # ---- sleep level 2: discard weights, wake reloads from disk --------
    # (the reference's SGLang shape: release memory occupation, then
    # /update_weights_from_disk on resume).  Needs a checkpoint-backed
    # model; uses the committed trained tinyadd checkpoint.
    ckpt = os.path.join(os.path.dirname(__file__), "..",
                        "benchmarks", "assets", "tinyadd")
    from kvcached_tpu.models.hf_loader import engine_from_checkpoint

    eng = engine_from_checkpoint(ckpt, EngineConfig(
        max_batch=2, max_model_len=64, page_tokens=16,
        prefill_buckets=(16,), num_pages=32, interpret=not ON_TPU,
        kv_dtype="float32"), dtype="float32")
    h = ModelHandle("tinyadd", eng, ckpt_dir=ckpt)
    prompt = eng.tokenizer.encode("47+38=")
    before = eng.generate([prompt], SamplingParams(max_new_tokens=6))[0]
    h.sleep(level=2)
    print(f"level-2 sleep: weights discarded entirely "
          f"(host copy: {h._host_params})")
    t0 = time.perf_counter()
    h.wake_up()
    after = eng.generate([prompt], SamplingParams(max_new_tokens=6))[0]
    assert after.output_tokens == before.output_tokens
    print(f"level-2 cold start (reload from disk + request): "
          f"{(time.perf_counter()-t0)*1e3:.1f} ms, output unchanged")
    eng.shutdown()


if __name__ == "__main__":
    main()
