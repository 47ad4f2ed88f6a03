"""Example 6: the controller plane — router + traffic monitor + sleep
manager over two colocated models (reference examples/03_model_router_sleep).

Requests route by model name through an OpenAI-compatible frontend; the
idle model is auto-slept (weights → host RAM, pages → shared pool) and
woken transparently by its next request.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/06_router_sleep.py
"""

import asyncio
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

ON_TPU = jax.devices()[0].platform == "tpu"

from kvcached_tpu.controller.frontend import MultiLLMFrontend
from kvcached_tpu.controller.sleep_manager import SleepConfig
from kvcached_tpu.engine import EngineConfig, LLMEngine
from kvcached_tpu.models.llama import LlamaConfig
from kvcached_tpu.server import AsyncEngineRunner


async def run():
    from aiohttp.test_utils import TestClient, TestServer

    cfg = LlamaConfig.toy(vocab_size=300)
    ecfg = dict(max_batch=2, max_model_len=128, page_tokens=16,
                prefill_buckets=(32, 64), num_pages=64,
                interpret=not ON_TPU)
    runner = AsyncEngineRunner()
    a = LLMEngine(cfg, EngineConfig(**ecfg))
    b = LLMEngine(cfg, EngineConfig(**ecfg), params=a.params,
                  shared_pool=a.pool, pool_arrays=a.arrays)
    runner.add_model("chat", a)
    runner.add_model("code", b)

    frontend = MultiLLMFrontend(
        runner, SleepConfig(idle_threshold_s=2.0, check_interval_s=1.0,
                            min_sleep_duration_s=0.0),
    )
    client = TestClient(TestServer(frontend.build_app()))
    await client.start_server()
    try:
        for model in ("chat", "code"):
            r = await client.post("/v1/completions", json={
                "model": model, "prompt": f"hello {model}", "max_tokens": 8})
            print(model, "->", (await r.json())["choices"][0]["text"][:20])

        # let the sleep manager observe idleness and sleep both
        await asyncio.sleep(3.5)
        status = await (await client.get("/sleep/status")).json()
        print("sleep status:", {m: s["sleeping"] for m, s in status.items()})

        # a request wakes the sleeping model transparently
        r = await client.post("/v1/completions", json={
            "model": "chat", "prompt": "wake up", "max_tokens": 4})
        print("after wake:", r.status,
              (await (await client.get("/models")).json()))
    finally:
        await client.close()
        runner.stop()
        a.shutdown()
        b.shutdown()


if __name__ == "__main__":
    asyncio.run(run())
