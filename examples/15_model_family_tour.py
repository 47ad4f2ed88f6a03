"""Example 15: model-family tour — Qwen2, Qwen3, Gemma2, and Gemma3
checkpoints served colocated from one runtime.

The reference serves whatever vLLM/SGLang load; owning the engine means
owning the architecture mapping.  This example writes tiny random HF
checkpoints with transformers itself (Qwen2 = Llama + qkv biases, Qwen3 =
Llama + per-head q/k norms, Gemma2 = the hybrid sliding/full family +
geglu/post-norms/soft-capping, Gemma3 = UNEQUAL 5:1 layer groups with
per-group arenas + q/k norms + split local/global rope), loads them
through the HF loader, and serves all four from one AsyncEngineRunner —
different architectures, one machine, shared HBM accounting.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/15_model_family_tour.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

ON_TPU = jax.devices()[0].platform == "tpu"

from kvcached_tpu.engine import EngineConfig, SamplingParams
from kvcached_tpu.models.hf_loader import config_from_hf, engine_from_checkpoint
from kvcached_tpu.server import AsyncEngineRunner


def _write_ckpts(root: str) -> dict:
    import torch
    from transformers import (
        Gemma2Config, Gemma2ForCausalLM,
        Gemma3ForCausalLM, Gemma3TextConfig,
        Qwen2Config, Qwen2ForCausalLM,
        Qwen3Config, Qwen3ForCausalLM,
    )

    torch.manual_seed(0)
    common = dict(
        vocab_size=128, hidden_size=256, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=128, rope_theta=10000.0,
    )
    out = {}
    for name, Cfg, Model, extra in [
        ("qwen2", Qwen2Config, Qwen2ForCausalLM,
         dict(use_sliding_window=False)),
        ("qwen3", Qwen3Config, Qwen3ForCausalLM,
         dict(use_sliding_window=False)),
        ("gemma2", Gemma2Config, Gemma2ForCausalLM,
         dict(sliding_window=16, query_pre_attn_scalar=256,
              attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
              attn_implementation="eager")),
        ("gemma3", Gemma3TextConfig, Gemma3ForCausalLM,
         dict(num_hidden_layers=6,  # 5 sliding : 1 full (unequal groups)
              sliding_window=16, query_pre_attn_scalar=256,
              rope_local_base_freq=10_000.0,
              attn_implementation="eager")),
    ]:
        if name == "gemma3":  # num_hidden_layers comes from extra
            common = {k: v for k, v in common.items()}
        d = os.path.join(root, name)
        kw = {**common, **extra}
        Model(Cfg(**kw)).save_pretrained(d, safe_serialization=True)
        out[name] = d
    return out


def main():
    ec = EngineConfig(
        max_batch=2, max_model_len=64, page_tokens=16,
        prefill_buckets=(16, 32), num_pages=48, interpret=not ON_TPU,
        kv_dtype="float32",
    )
    with tempfile.TemporaryDirectory() as root:
        ckpts = _write_ckpts(root)
        runner = AsyncEngineRunner()
        engines = {}
        for name, d in ckpts.items():
            cfg = config_from_hf(d)
            print(f"{name}: {type(cfg).__name__}"
                  f" bias={getattr(cfg, 'attention_bias', False)}"
                  f" qk_norm={getattr(cfg, 'qk_norm', False)}"
                  f" windows={getattr(cfg, 'layer_windows', None)}"
                  f" softcap={getattr(cfg, 'attn_softcap', None)}")
            eng = engine_from_checkpoint(d, ec, dtype="float32")
            engines[name] = eng
            runner.add_model(name, eng, ckpt_dir=d)

        prompt = [1, 9, 17, 33, 5, 64]
        for name, eng in engines.items():
            out = eng.generate([prompt], SamplingParams(max_new_tokens=8))[0]
            assert len(out.output_tokens) == 8
            print(f"{name} serves: {out.output_tokens}")

        # the gemma3 engine runs per-GROUP arenas (unequal layer groups)
        assert isinstance(engines["gemma3"].k_pools, tuple)
        print("gemma3 per-group arenas:",
              [kp.shape for kp in engines["gemma3"].k_pools])

        # level-2 sleep works for every checkpoint-backed family
        h = runner.models["gemma2"]
        before = engines["gemma2"].generate(
            [prompt], SamplingParams(max_new_tokens=6))[0].output_tokens
        h.sleep(level=2)
        h.wake_up()
        after = engines["gemma2"].generate(
            [prompt], SamplingParams(max_new_tokens=6))[0].output_tokens
        assert after == before
        print("gemma2 level-2 sleep/wake round-trip: output unchanged")

        for eng in engines.values():
            eng.shutdown()


if __name__ == "__main__":
    main()
