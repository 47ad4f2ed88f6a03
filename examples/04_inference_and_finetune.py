"""Example 4: inference colocated with a finetuning loop (reference
examples/04_inference_and_finetune).

The serving engine's KV pool is elastic, so a training job on the same chip
can claim HBM: the operator (or the trainer itself) cuts the serving pool's
limit via the shm control plane, serving shrinks on drain, training
allocates its optimizer state, and the limit is raised back afterwards.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/04_inference_and_finetune.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

ON_TPU = jax.devices()[0].platform == "tpu"

from kvcached_tpu import shm
from kvcached_tpu.engine import EngineConfig, LLMEngine, SamplingParams
from kvcached_tpu.models.llama import LlamaConfig, init_llama_params

IPC = "demo_infer_ft"


def finetune_steps(cfg, params, steps=3):
    """A few real gradient steps on the toy llama (dense causal LM loss)."""
    from kvcached_tpu.models.llama import rms_norm

    def loss_fn(p, tokens):
        x = p["embed"][tokens[:-1]]
        # single dense layer-0 pass is enough to demo HBM pressure
        h = rms_norm(x, p["layers"]["attn_norm"][0], cfg.rms_eps)
        logits = (h @ p["lm_head"]).astype(jnp.float32)
        targets = tokens[1:]
        return -jnp.mean(
            jax.nn.log_softmax(logits)[jnp.arange(targets.size), targets]
        )

    grad_fn = jax.jit(jax.grad(loss_fn))
    tokens = jnp.arange(32) % cfg.vocab_size
    for s in range(steps):
        grads = grad_fn(params, tokens)
        params = jax.tree.map(lambda w, g: w - 1e-4 * g.astype(w.dtype),
                              params, grads)
    return params


def main():
    cfg = LlamaConfig.toy()
    eng = LLMEngine(cfg, EngineConfig(
        max_batch=4, max_model_len=256, page_tokens=16,
        prefill_buckets=(32, 64), num_pages=96, interpret=not ON_TPU,
        ipc_name=IPC,
    ))
    pb = eng.kv_cfg.page_bytes

    # serve a warmup burst
    eng.generate([[i + 1 for i in range(16)] for _ in range(4)],
                 SamplingParams(max_new_tokens=32))
    print(f"serving: mapped={eng.manager.get_mapped_memory_size()//pb} pages")

    # trainer claims memory: cut the serving pool to 8 pages
    shm.update_kv_cache_limit(IPC, 8 * pb)
    eng.manager.alloc(0)  # pick up the resize target
    eng.manager.trim()
    print(f"limit cut for training: mapped="
          f"{eng.manager.get_mapped_memory_size()//pb} pages")

    params = finetune_steps(cfg, eng.params)
    print("finetune: 3 gradient steps done")

    # training done: raise the limit, hot-swap the tuned weights, serve on
    shm.update_kv_cache_limit(IPC, 96 * pb)
    eng.manager.alloc(0)
    eng.params = params
    outs = eng.generate([[5, 6, 7, 8]], SamplingParams(max_new_tokens=16))
    print(f"serving resumed on tuned weights: {outs[0].output_tokens[:8]}…")
    eng.shutdown()


if __name__ == "__main__":
    main()
