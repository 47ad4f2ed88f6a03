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


@pytest.fixture(scope="module")
def qwen2_ckpt(tmp_path_factory):
    """Tiny real HF Qwen2 checkpoint (qkv biases, tied embeddings) written
    by transformers itself."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config as HFConfig
    from transformers import Qwen2ForCausalLM

    hc = HFConfig(
        vocab_size=128,
        hidden_size=512,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=True,
        # transformers' Qwen2 applies sliding window only when explicitly
        # enabled; keep full attention for the parity check
        use_sliding_window=False,
    )
    torch.manual_seed(0)
    model = Qwen2ForCausalLM(hc).eval()
    d = tmp_path_factory.mktemp("qwen2_ckpt")
    model.save_pretrained(str(d), safe_serialization=True)
    return str(d), model


class TestQwen2:
    """Qwen2-class checkpoints: the additive qkv biases are the only
    architectural delta from Llama (the reference serves Qwen2 through its
    host engines; owning the engine means owning this mapping)."""

    def test_config_detects_bias(self, qwen2_ckpt):
        from kvcached_tpu.models.hf_loader import config_from_hf

        cfg = config_from_hf(qwen2_ckpt[0])
        assert cfg.attention_bias
        assert cfg.num_kv_heads == 2
        # Qwen2 RECORDS sliding_window (4096 default) but gates it behind
        # use_sliding_window=False — must not be applied
        assert cfg.sliding_window is None

    def test_greedy_generation_matches_transformers(self, qwen2_ckpt):
        import torch

        from kvcached_tpu.engine import EngineConfig, SamplingParams
        from kvcached_tpu.models.hf_loader import engine_from_checkpoint

        ckpt_dir, hf_model = qwen2_ckpt
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
            dtype="float32",
        )
        try:
            assert eng.model_cfg.attention_bias
            assert "bq" in eng.params["layers"]
            got = eng.generate([prompt], SamplingParams(max_new_tokens=8))
            assert got[0].output_tokens == want
        finally:
            eng.shutdown()

    def test_max_window_layers_semantics(self, tmp_path):
        """Review fix: HF applies the sliding window only to layers AT OR
        ABOVE max_window_layers — mwl >= num_layers means NO sliding (the
        old code applied the window to every layer)."""
        import json as _json

        from kvcached_tpu.models.hf_loader import config_from_hf

        base = {
            "architectures": ["Qwen2ForCausalLM"], "vocab_size": 64,
            "hidden_size": 64, "num_hidden_layers": 4,
            "num_attention_heads": 2, "intermediate_size": 64,
            "sliding_window": 8, "use_sliding_window": True,
        }

        def cfg_for(**kw):
            (tmp_path / "config.json").write_text(_json.dumps({**base, **kw}))
            return config_from_hf(str(tmp_path))

        assert cfg_for(max_window_layers=4).sliding_window is None
        assert cfg_for(max_window_layers=0).sliding_window == 8
        # absent key with use_sliding_window=true: LOUD error (transformers
        # would default to 28 — silently full attention on deep models)
        with pytest.raises(ValueError, match="max_window_layers"):
            cfg_for()
        with pytest.raises(ValueError, match="max_window_layers"):
            cfg_for(max_window_layers=2)  # mixed layers need hybrid
        assert cfg_for(use_sliding_window=False,
                       max_window_layers=0).sliding_window is None

    def test_qk_norm_config_without_tensors_rejected(self, hf_ckpt):
        """Review fix: qk_norm=True on a checkpoint without q_norm tensors
        used to silently skip the norm (and break mesh spec matching)."""
        import dataclasses

        from kvcached_tpu.models.hf_loader import config_from_hf, params_from_hf

        ckpt_dir, _ = hf_ckpt
        cfg = dataclasses.replace(
            config_from_hf(ckpt_dir, dtype="float32"), qk_norm=True)
        with pytest.raises(ValueError, match="q_norm"):
            params_from_hf(ckpt_dir, cfg=cfg, dtype="float32")

    def test_unsupported_arch_rejected(self, tmp_path):
        import json as _json

        from kvcached_tpu.models.hf_loader import config_from_hf

        (tmp_path / "config.json").write_text(_json.dumps({
            "architectures": ["Phi3ForCausalLM"], "vocab_size": 64,
            "hidden_size": 64, "num_hidden_layers": 2,
            "num_attention_heads": 2, "intermediate_size": 64,
        }))
        with pytest.raises(ValueError, match="unsupported HF architecture"):
            config_from_hf(str(tmp_path))


class TestQwen3:
    """Qwen3-class checkpoints: per-head q/k RMSNorm before rope (no qkv
    biases) — the second Qwen-family delta the loader maps onto the
    Llama-shaped layout."""

    @pytest.fixture(scope="class")
    def qwen3_ckpt(self, tmp_path_factory):
        torch = pytest.importorskip("torch")
        from transformers import Qwen3Config as HFConfig
        from transformers import Qwen3ForCausalLM

        hc = HFConfig(
            vocab_size=128,
            hidden_size=512,
            intermediate_size=256,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=128,
            rms_norm_eps=1e-5,
            rope_theta=10000.0,
            tie_word_embeddings=False,
            use_sliding_window=False,
        )
        torch.manual_seed(0)
        model = Qwen3ForCausalLM(hc).eval()
        d = tmp_path_factory.mktemp("qwen3_ckpt")
        model.save_pretrained(str(d), safe_serialization=True)
        return str(d), model

    def test_config_detects_qk_norm(self, qwen3_ckpt):
        from kvcached_tpu.models.hf_loader import config_from_hf

        cfg = config_from_hf(qwen3_ckpt[0])
        assert cfg.qk_norm and not cfg.attention_bias

    def test_greedy_generation_matches_transformers(self, qwen3_ckpt):
        import torch

        from kvcached_tpu.engine import EngineConfig, SamplingParams
        from kvcached_tpu.models.hf_loader import engine_from_checkpoint

        ckpt_dir, hf_model = qwen3_ckpt
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
            dtype="float32",
        )
        try:
            assert "q_norm" in eng.params["layers"]
            got = eng.generate([prompt], SamplingParams(max_new_tokens=8))
            assert got[0].output_tokens == want
        finally:
            eng.shutdown()


class TestRopeScaling:
    """Llama-3.1-style rope_scaling: checkpoints are TRAINED with the
    scaled frequencies, so the loader must reproduce transformers'
    _compute_llama3_parameters exactly (and refuse unknown kinds instead
    of silently loading unscaled)."""

    SCALING = {
        "rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
        "high_freq_factor": 4.0,
        # tiny so the scaling actually bites at test positions
        "original_max_position_embeddings": 32,
    }

    @pytest.fixture(scope="class")
    def llama31_ckpt(self, tmp_path_factory):
        torch = pytest.importorskip("torch")
        from transformers import LlamaConfig as HFConfig
        from transformers import LlamaForCausalLM

        hc = HFConfig(
            vocab_size=128, hidden_size=512, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, rms_norm_eps=1e-5, rope_theta=10000.0,
            tie_word_embeddings=False, rope_scaling=dict(self.SCALING),
            max_position_embeddings=256,
        )
        torch.manual_seed(0)
        model = LlamaForCausalLM(hc).eval()
        d = tmp_path_factory.mktemp("llama31_ckpt")
        model.save_pretrained(str(d), safe_serialization=True)
        return str(d), model

    def test_config_parses_scaling(self, llama31_ckpt):
        from kvcached_tpu.models.hf_loader import config_from_hf

        cfg = config_from_hf(llama31_ckpt[0])
        assert cfg.rope_scaling == ("llama3", 8.0, 1.0, 4.0, 32.0)

    def test_inv_freqs_match_transformers(self, llama31_ckpt):
        import numpy as np

        from kvcached_tpu.models.llama import rope_inv_freqs

        _, hf_model = llama31_ckpt
        want = hf_model.model.rotary_emb.inv_freq.numpy()
        got = np.asarray(rope_inv_freqs(
            128, 10000.0, ("llama3", 8.0, 1.0, 4.0, 32.0)))
        np.testing.assert_allclose(got, want, rtol=1e-6)
        # the scaling must actually change something at this orig_max
        plain = np.asarray(rope_inv_freqs(128, 10000.0, None))
        assert np.abs(got - plain).max() > 1e-6

    def test_greedy_generation_matches_transformers(self, llama31_ckpt):
        import torch

        from kvcached_tpu.engine import EngineConfig, SamplingParams
        from kvcached_tpu.models.hf_loader import engine_from_checkpoint

        ckpt_dir, hf_model = llama31_ckpt
        import numpy as np

        # prompt long enough that scaled long-wavelength channels matter
        prompt = list(range(1, 41))
        with torch.no_grad():
            want = hf_model.generate(
                torch.tensor([prompt]), max_new_tokens=8, do_sample=False
            )[0][len(prompt):].tolist()
            want_logits = hf_model(
                torch.tensor([prompt])).logits[0, -1].numpy()

        eng = engine_from_checkpoint(
            ckpt_dir,
            EngineConfig(
                max_batch=2, max_model_len=128, page_tokens=16,
                decode_horizon=2, prefill_buckets=(16, 64), num_pages=32,
                interpret=True, kv_dtype="float32",
            ),
            dtype="float32",
        )
        try:
            # strong gate: full 40-token logits parity (the scaling bites
            # well before position 40 with orig_max=32)
            from kvcached_tpu.models.llama import (
                llama_prefill_step,
            )
            import jax.numpy as jnp

            cfg = eng.model_cfg
            L, KH, D = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
            kp = jnp.zeros((L, 8, KH, 16, D), jnp.float32)
            toks = np.zeros(48, np.int32)
            toks[:40] = prompt
            pt = np.zeros(4, np.int32)
            pt[:3] = [1, 2, 3]
            logits, _, _ = llama_prefill_step(
                eng.params, cfg, jnp.asarray(toks),
                jnp.arange(48, dtype=jnp.int32), kp, jnp.zeros_like(kp),
                jnp.asarray([1, 2, 3], jnp.int32), jnp.asarray(pt),
                jnp.asarray(0, jnp.int32), jnp.asarray(40, jnp.int32),
                interpret=True,
            )
            np.testing.assert_allclose(
                np.asarray(logits), want_logits, atol=2e-2, rtol=2e-2)

            # generation with SYMMETRIC eos semantics (this random model
            # emits the default eos=2 immediately; transformers stops on
            # it, so must we — the engine includes the stop token)
            got = eng.generate(
                [prompt],
                SamplingParams(max_new_tokens=8, stop_token_ids=(2,)),
            )
            assert got[0].output_tokens == want
        finally:
            eng.shutdown()

    def test_unknown_scaling_kind_rejected(self, tmp_path):
        import json as _json

        from kvcached_tpu.models.hf_loader import config_from_hf

        (tmp_path / "config.json").write_text(_json.dumps({
            "architectures": ["LlamaForCausalLM"], "vocab_size": 64,
            "hidden_size": 64, "num_hidden_layers": 2,
            "num_attention_heads": 2, "intermediate_size": 64,
            "rope_scaling": {"rope_type": "yarn", "factor": 4.0},
        }))
        with pytest.raises(ValueError, match="rope_scaling"):
            config_from_hf(str(tmp_path))


class TestGemma2:
    """Gemma2-class checkpoints map onto the HYBRID family: alternating
    sliding/full layer groups + geglu-tanh MLP, (1+w) norms, sandwich
    post-norms, sqrt(E) embedding scale, attention/final logit
    soft-capping, and query_pre_attn_scalar softmax scaling."""

    @pytest.fixture(scope="class")
    def gemma2_ckpt(self, tmp_path_factory):
        torch = pytest.importorskip("torch")
        from transformers import Gemma2Config as HFConfig
        from transformers import Gemma2ForCausalLM

        hc = HFConfig(
            vocab_size=128,
            hidden_size=512,
            intermediate_size=256,
            num_hidden_layers=2,  # layer 0 sliding, layer 1 full
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=128,
            rms_norm_eps=1e-6,
            rope_theta=10000.0,
            sliding_window=8,  # small enough to bite in the test prompt
            query_pre_attn_scalar=256,
            attn_logit_softcapping=50.0,
            final_logit_softcapping=30.0,
            # sdpa silently skips attention soft-capping — eager is the
            # semantics our kernels implement
            attn_implementation="eager",
        )
        torch.manual_seed(0)
        model = Gemma2ForCausalLM(hc).eval()
        d = tmp_path_factory.mktemp("gemma2_ckpt")
        model.save_pretrained(str(d), safe_serialization=True)
        return str(d), model

    def test_config_maps_to_hybrid(self, gemma2_ckpt):
        from kvcached_tpu.models.hf_loader import config_from_hf
        from kvcached_tpu.models.hybrid import HybridConfig

        cfg = config_from_hf(gemma2_ckpt[0])
        assert isinstance(cfg, HybridConfig)
        assert cfg.layer_windows == (8, None)
        assert cfg.act == "gelu_tanh" and cfg.norm_offset
        assert cfg.embed_scale and cfg.post_norms
        assert cfg.attn_softcap == 50.0 and cfg.final_softcap == 30.0
        assert cfg.query_scale == 256.0

    def test_greedy_generation_matches_transformers(self, gemma2_ckpt):
        import torch

        from kvcached_tpu.engine import EngineConfig, SamplingParams
        from kvcached_tpu.models.hf_loader import engine_from_checkpoint

        ckpt_dir, hf_model = gemma2_ckpt
        # long enough that the sliding window (8) truncates attention
        prompt = [1, 17, 42, 99, 5, 64, 101, 7, 9, 33, 2, 58]
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
            dtype="float32",
        )
        try:
            assert "post_attn_norm" in eng.params["layers"]
            got = eng.generate([prompt], SamplingParams(max_new_tokens=8))
            assert got[0].output_tokens == want
        finally:
            eng.shutdown()


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


class TestGemma3:
    """Gemma3ForCausalLM maps onto the hybrid family with UNEQUAL layer
    groups (the 5:1 local:global pattern → per-group arenas), per-head
    q/k RMSNorm in the Gemma (1+w) convention (pre-applied at load), and
    split RoPE — local layers at rope_local_base_freq unscaled, global
    layers at rope_theta (+rope_scaling)."""

    @pytest.fixture(scope="class")
    def gemma3_ckpt(self, tmp_path_factory):
        torch = pytest.importorskip("torch")
        from transformers import Gemma3ForCausalLM
        from transformers import Gemma3TextConfig as HFConfig

        hc = HFConfig(
            vocab_size=128,
            hidden_size=256,
            intermediate_size=256,
            num_hidden_layers=6,  # default pattern: 5 sliding + 1 full
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=128,
            rms_norm_eps=1e-6,
            rope_theta=1_000_000.0,
            rope_local_base_freq=10_000.0,
            sliding_window=8,  # bites inside the test prompt
            query_pre_attn_scalar=256,
            attn_implementation="eager",
            tie_word_embeddings=True,
        )
        torch.manual_seed(0)
        model = Gemma3ForCausalLM(hc).eval()
        d = tmp_path_factory.mktemp("gemma3_ckpt")
        model.save_pretrained(str(d), safe_serialization=True)
        return str(d), model

    def test_config_maps_to_unequal_hybrid(self, gemma3_ckpt):
        from kvcached_tpu.models.hf_loader import config_from_hf
        from kvcached_tpu.models.hybrid import HybridConfig

        cfg = config_from_hf(gemma3_ckpt[0])
        assert isinstance(cfg, HybridConfig)
        assert cfg.layer_windows == (8, 8, 8, 8, 8, None)
        assert not cfg.equal_groups
        assert cfg.group_layer_counts == (5, 1)
        assert cfg.qk_norm and cfg.norm_offset and cfg.post_norms
        assert cfg.attn_softcap is None and cfg.final_softcap is None
        assert cfg.local_rope_theta == 10_000.0
        assert cfg.rope_theta == 1_000_000.0

    def test_greedy_generation_matches_transformers(self, gemma3_ckpt):
        import torch

        from kvcached_tpu.engine import EngineConfig, SamplingParams
        from kvcached_tpu.models.hf_loader import engine_from_checkpoint

        ckpt_dir, hf_model = gemma3_ckpt
        # long enough that the sliding window (8) truncates attention AND
        # the global layer still sees everything
        prompt = [1, 17, 42, 99, 5, 64, 101, 7, 9, 33, 2, 58]
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
            dtype="float32",
        )
        try:
            assert "q_norm" in eng.params["layers"]
            assert isinstance(eng.k_pools, tuple) and len(eng.k_pools) == 2
            got = eng.generate([prompt], SamplingParams(max_new_tokens=8))
            assert got[0].output_tokens == want
        finally:
            eng.shutdown()

    def test_local_rope_is_live(self, gemma3_ckpt):
        """Collapsing the local base frequency onto the global one must
        change the step LOGITS — proof the split-rope path is live in the
        compiled graph (greedy tokens can survive the perturbation at
        random-init scale; the logits cannot)."""
        import dataclasses

        import jax
        import jax.numpy as jnp

        from kvcached_tpu.models.hf_loader import config_from_hf, params_from_hf
        from kvcached_tpu.models.hybrid import hybrid_prefill_step

        ckpt_dir, _ = gemma3_ckpt
        cfg = config_from_hf(ckpt_dir, dtype="float32")
        _, params = params_from_hf(ckpt_dir, cfg=cfg, dtype="float32")
        P, T = 16, 16
        KH, D = cfg.num_kv_heads, cfg.head_dim
        G = len(cfg.group_windows)
        pools = tuple(
            jnp.zeros((n, 8, KH, P, D), jnp.float32)
            for n in cfg.group_layer_counts
        )
        tokens = jnp.asarray(
            [1, 17, 42, 99, 5, 64, 101, 7, 9, 33, 2, 58, 0, 0, 0, 0],
            jnp.int32)
        positions = jnp.arange(T)
        chunk_pages = jnp.ones((G, 1), jnp.int32)
        page_table = jnp.ones((G, 8), jnp.int32)

        def logits_for(c):
            lg, _, _ = hybrid_prefill_step(
                params, c, tokens, positions, pools, pools,
                chunk_pages, page_table, jnp.int32(0), jnp.int32(12),
                interpret=True,
            )
            return lg

        base = logits_for(cfg)
        collapsed = logits_for(
            dataclasses.replace(cfg, local_rope_theta=None))
        assert not jnp.allclose(base, collapsed), (
            "local rope made no difference to the logits"
        )
