"""HF checkpoint loading tests: safetensors roundtrip, weight mapping
validated against transformers' own Llama forward pass, end-to-end engine
serving from a checkpoint directory.
"""

import numpy as np
import pytest

from kvcached_tpu.models.hf_loader import (
    read_safetensors,
    write_safetensors,
)


class TestSafetensorsIO:
    def test_roundtrip(self, tmp_path):
        import ml_dtypes

        tensors = {
            "a": np.arange(12, dtype=np.float32).reshape(3, 4),
            "b": np.ones((2, 2), dtype=ml_dtypes.bfloat16),
            "c": np.array([1, 2, 3], dtype=np.int64),
        }
        p = str(tmp_path / "t.safetensors")
        write_safetensors(tensors, p)
        back = read_safetensors(p)
        for k, v in tensors.items():
            np.testing.assert_array_equal(np.asarray(back[k]), np.asarray(v))

    def test_reads_official_format(self, tmp_path):
        """Cross-check the minimal reader against the safetensors package."""
        st = pytest.importorskip("safetensors.numpy")
        tensors = {"x": np.random.default_rng(0).normal(size=(4, 8)).astype(np.float32)}
        p = str(tmp_path / "o.safetensors")
        st.save_file(tensors, p)
        back = read_safetensors(p)
        np.testing.assert_array_equal(back["x"], tensors["x"])


@pytest.fixture(scope="module")
def hf_ckpt(tmp_path_factory):
    """Tiny real HF Llama checkpoint written by transformers itself."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM

    hc = HFConfig(
        vocab_size=128,
        hidden_size=512,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(hc).eval()
    d = tmp_path_factory.mktemp("ckpt")
    model.save_pretrained(str(d), safe_serialization=True)
    return str(d), model


class TestWeightMapping:
    def test_logits_match_transformers(self, hf_ckpt):
        """The loaded stacked params, run through OUR paged prefill, must
        reproduce transformers' forward logits — validates every transpose
        and the RoPE convention."""
        import jax.numpy as jnp
        import torch

        from kvcached_tpu.models.hf_loader import params_from_hf
        from kvcached_tpu.models.llama import llama_prefill_step

        ckpt_dir, hf_model = hf_ckpt
        cfg, params = params_from_hf(ckpt_dir, dtype="float32")
        assert cfg.num_layers == 2 and cfg.num_kv_heads == 2
        assert cfg.head_dim == 128

        prompt = [1, 17, 42, 99, 5, 64, 101, 7]
        with torch.no_grad():
            want = hf_model(torch.tensor([prompt])).logits[0, -1].numpy()

        P = 16
        T = 16
        L, KH, D = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
        k_pools = jnp.zeros((L, 8, KH, P, D), jnp.float32)
        v_pools = jnp.zeros_like(k_pools)
        tokens = np.zeros(T, np.int32)
        tokens[: len(prompt)] = prompt
        page_table = np.zeros(4, np.int32)
        page_table[0] = 1
        logits, _, _ = llama_prefill_step(
            params, cfg, jnp.asarray(tokens),
            jnp.arange(T, dtype=jnp.int32), k_pools, v_pools,
            jnp.asarray([1], jnp.int32), jnp.asarray(page_table),
            jnp.asarray(0, jnp.int32), jnp.asarray(len(prompt), jnp.int32),
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(logits), want, atol=2e-2, rtol=2e-2
        )

    def test_greedy_generation_matches_transformers(self, hf_ckpt):
        import torch

        from kvcached_tpu.engine import EngineConfig, SamplingParams
        from kvcached_tpu.models.hf_loader import engine_from_checkpoint

        ckpt_dir, hf_model = hf_ckpt
        prompt = [1, 17, 42, 99, 5, 64, 101, 7]
        with torch.no_grad():
            want = hf_model.generate(
                torch.tensor([prompt]), max_new_tokens=8, do_sample=False
            )[0][len(prompt):].tolist()

        eng = engine_from_checkpoint(
            ckpt_dir,
            EngineConfig(
                max_batch=2, max_model_len=64, page_tokens=16,
                decode_horizon=2, prefill_buckets=(16, 32), num_pages=32,
                interpret=True, kv_dtype="float32",
            ),
            dtype="float32",  # exactness vs the fp32 torch reference
        )
        try:
            got = eng.generate([prompt], SamplingParams(max_new_tokens=8))
            assert got[0].output_tokens == want
        finally:
            eng.shutdown()
