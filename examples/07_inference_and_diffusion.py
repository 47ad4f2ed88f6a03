"""Example 7: LLM serving colocated with a diffusion-style workload
(reference examples/07_inference_and_diffusion).

A denoising loop (iterative jitted compute with its own big activation
buffers) shares the chip with an elastic LLM engine: before the diffusion
burst the engine trims its KV pool; afterwards serving reclaims the pages.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/07_inference_and_diffusion.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

ON_TPU = jax.devices()[0].platform == "tpu"

from kvcached_tpu.engine import EngineConfig, LLMEngine, SamplingParams
from kvcached_tpu.models.llama import LlamaConfig


@jax.jit
def denoise(x, w):
    """Toy UNet stand-in: a few conv-ish mixing steps."""
    def body(i, x):
        x = jnp.tanh(x @ w)
        return x - 0.1 * x**3
    return jax.lax.fori_loop(0, 8, body, x)


def main():
    cfg = LlamaConfig.toy()
    eng = LLMEngine(cfg, EngineConfig(
        max_batch=4, max_model_len=256, page_tokens=16,
        prefill_buckets=(32, 64), num_pages=96, interpret=not ON_TPU,
    ))
    pb = eng.kv_cfg.page_bytes

    eng.generate([[i + 1 for i in range(16)] for _ in range(4)],
                 SamplingParams(max_new_tokens=24))
    print(f"LLM served a burst: mapped={eng.manager.get_mapped_memory_size()//pb} pages")

    # diffusion burst: trim serving KV first so the denoiser's buffers fit
    eng.manager.trim()
    print(f"trimmed for diffusion: mapped={eng.manager.get_mapped_memory_size()//pb} pages")
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (256, 512), jnp.float32)
    w = jax.random.normal(key, (512, 512), jnp.float32) / 22.6
    for step in range(3):
        x = denoise(x, w)
    print(f"diffusion: 3 bursts done, output norm={float(jnp.linalg.norm(x)):.1f}")

    # serving resumes and re-grows elastically
    outs = eng.generate([[9, 8, 7, 6]], SamplingParams(max_new_tokens=16))
    print(f"LLM resumed: {len(outs[0].output_tokens)} tokens, "
          f"mapped={eng.manager.get_mapped_memory_size()//pb} pages")
    eng.shutdown()


if __name__ == "__main__":
    main()
