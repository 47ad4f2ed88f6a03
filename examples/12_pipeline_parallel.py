"""Example 12: pipeline stage placement — a model bigger than one chip.

`PPLlamaAdapter` + a mesh with a `pp` axis places the layer stages on
DISJOINT devices: each stage holds only its layers' weights and its own
elastic KV pool in its own HBM, activations hop stage→stage over ICI
(`lax.ppermute`), and the decode batch runs GPipe-style microbatches so
stages stay busy.  Each stage keeps an independent shm segment, so
`kvctl limit <ipc>_g1 2G` squeezes ONE stage — the reference's per-stage
elasticity (vllm/patches.py:654-664), but with the stages actually
placed.  Adding a `tp` mesh axis additionally shards each stage's heads
and pool Megatron-style (pp×tp).

Outputs are token-exact vs the single-device engine.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/12_pipeline_parallel.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# must run before any jax op initializes the backend
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
from jax.sharding import Mesh

from kvcached_tpu.engine import EngineConfig, LLMEngine, SamplingParams
from kvcached_tpu.models.llama import LlamaConfig, init_llama_params
from kvcached_tpu.parallel.pp import PPLlamaAdapter

cfg = LlamaConfig.toy(num_layers=4, num_heads=4, num_kv_heads=2,
                      vocab_size=512, dtype="float32")
params = init_llama_params(cfg, jax.random.PRNGKey(0))
ecfg = EngineConfig(
    max_batch=4, max_model_len=96, page_tokens=16, decode_horizon=4,
    prefill_buckets=(16, 32), num_pages=32, kv_dtype="float32",
    interpret=jax.devices()[0].platform != "tpu",
    pp_microbatches=2,  # pipeline overlap: 2 microbatches in flight
)
prompts = [[1, 2, 3, 4, 5], list(range(7, 27)), [9, 9, 9], [4, 5]]
sp = SamplingParams(max_new_tokens=10)

single = LLMEngine(cfg, ecfg, params=params)
want = [o.output_tokens for o in single.generate(prompts, sp)]
single.shutdown()

if len(jax.devices()) >= 2:
    mesh = Mesh(np.array(jax.devices()[:2]), ("pp",))
    eng = LLMEngine(PPLlamaAdapter(cfg, num_stages=2), ecfg,
                    params=params, mesh=mesh)
    got = [o.output_tokens for o in eng.generate(prompts, sp)]
    devs = sorted({str(s.device) for s in eng.k_pools.addressable_shards})
    print(f"2-stage pipeline over devices {devs}")
    print("token-exact vs single device:", got == want)
    # per-stage elastic accounting: each stage has its own manager/segment
    for g, m in enumerate(eng.managers):
        print(f"  stage {g}: {m.page_allocator.num_in_use} pages in use "
              f"(independent kvctl limit via _g{g} suffix)" if g else
              f"  stage {g}: {m.page_allocator.num_in_use} pages in use")
    eng.shutdown()

if len(jax.devices()) >= 4:
    # pp×tp: 2 stages × 2-way tensor parallel inside each stage
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("pp", "tp"))
    eng = LLMEngine(PPLlamaAdapter(cfg, num_stages=2), ecfg,
                    params=params, mesh=mesh)
    got = [o.output_tokens for o in eng.generate(prompts, sp)]
    print(f"pp=2 × tp=2: pools sharded {eng.k_pools.sharding.spec}, "
          f"token-exact: {got == want}")
    eng.shutdown()
