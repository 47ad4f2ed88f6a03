"""YAML launcher tests: family registry, pool sharing by geometry,
HF-checkpoint models, end-to-end serving through the built runtime."""

import jax
import pytest

from kvcached_tpu.controller.launch import _model_cfg, build_runtime
from kvcached_tpu.engine import SamplingParams


def base_cfg(**kw):
    d = dict(
        vocab_size=512, hidden_size=256, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=128, intermediate_size=512,
    )
    d.update(kw)
    return d


ENGINE = dict(
    max_batch=2, max_model_len=64, page_tokens=16,
    prefill_buckets=[16, 32], num_pages=32, interpret=True,
)


class TestFamilies:
    def test_all_families_resolve(self):
        assert _model_cfg("llama", base_cfg()).num_layers == 2
        assert _model_cfg("qwen2", base_cfg()).attention_bias
        assert not _model_cfg("mistral", base_cfg(
            sliding_window=32)).attention_bias
        g2 = _model_cfg("gemma2", base_cfg(sliding_window=32))
        assert g2.act == "gelu_tanh" and g2.post_norms
        assert g2.layer_windows == (32, None)
        # review fix: the alias must default the soft-caps and query scale
        # too — gemma2 weights are trained with them; query_scale defaults
        # from head_dim (query_pre_attn_scalar == head_dim for 2B/9B; 27B
        # must pass it explicitly)
        assert g2.attn_softcap == 50.0 and g2.final_softcap == 30.0
        assert g2.query_scale == float(g2.head_dim)
        g2b = _model_cfg("gemma2", base_cfg(sliding_window=32, head_dim=256))
        assert g2b.query_scale == 256.0
        g3 = _model_cfg("gemma3", base_cfg(num_layers=6, sliding_window=32))
        assert g3.qk_norm and g3.local_rope_theta == 10_000.0
        assert g3.layer_windows == (32, 32, 32, 32, 32, None)
        assert not g3.equal_groups
        assert g3.attn_softcap is None
        assert _model_cfg("hybrid", base_cfg(
            layer_windows=[None, 32],
        )).group_windows == (None, 32)
        hl = base_cfg(layer_types=["attn", "mamba"], d_inner=64,
                      d_state=4, d_conv=4)
        hl.pop("num_layers")  # derived from layer_types in this family
        assert _model_cfg("hybrid_linear", hl).num_mamba_layers == 1
        with pytest.raises(ValueError, match="unknown model family"):
            _model_cfg("nope", {})

    def test_yaml_lists_become_tuples(self):
        cfg = _model_cfg("hybrid", base_cfg(layer_windows=[None, 16]))
        assert isinstance(cfg.layer_windows, tuple)


class TestBuildRuntime:
    def test_geometry_sharing_and_serving(self):
        config = {
            "pool": {"page_tokens": 16, "num_pages": 48},
            "models": [
                {"name": "a", "family": "llama", "config": base_cfg(),
                 "engine": dict(ENGINE)},
                {"name": "b", "family": "llama", "config": base_cfg(),
                 "engine": dict(ENGINE)},
                {"name": "h", "family": "hybrid",
                 "config": base_cfg(num_layers=2, layer_windows=[None, 32]),
                 "engine": dict(ENGINE)},
            ],
        }
        runner = build_runtime(config)
        try:
            ea = runner.models["a"].engine
            eb = runner.models["b"].engine
            eh = runner.models["h"].engine
            # same geometry → one shared physical pool
            assert eb.pool is ea.pool
            # hybrid has different arena layers → its own pool
            assert eh.pool is not ea.pool
            out = ea.generate([[1, 2, 3]], SamplingParams(max_new_tokens=4))
            assert len(out[0].output_tokens) == 4
            outh = eh.generate([[4, 5]], SamplingParams(max_new_tokens=4))
            assert len(outh[0].output_tokens) == 4
        finally:
            for h in runner.models.values():
                h.engine.shutdown()

    def test_checkpoint_model(self, tmp_path):
        torch = pytest.importorskip("torch")
        from transformers import LlamaConfig as HFConfig
        from transformers import LlamaForCausalLM

        hc = HFConfig(
            vocab_size=128, hidden_size=256, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=2,
            num_key_value_heads=2, tie_word_embeddings=False,
        )
        torch.manual_seed(0)
        LlamaForCausalLM(hc).save_pretrained(str(tmp_path), safe_serialization=True)

        config = {
            "pool": {"page_tokens": 16, "num_pages": 32},
            "models": [
                {"name": "real", "checkpoint": str(tmp_path),
                 "engine": dict(ENGINE)},
            ],
        }
        runner = build_runtime(config)
        try:
            eng = runner.models["real"].engine
            assert eng.model_cfg.vocab_size == 128
            # checkpoint-backed models support sleep level 2
            assert runner.models["real"].ckpt_dir == str(tmp_path)
            out = eng.generate([[1, 5, 9]], SamplingParams(max_new_tokens=4))
            assert len(out[0].output_tokens) == 4
        finally:
            eng.shutdown()


class TestUnequalGroupColocation:
    def test_two_gemma3_models_share_per_group_pools(self):
        """Round 5: two identical-geometry unequal-group (Gemma3-class)
        models colocate over SHARED per-group pools through the YAML
        launcher; a different unequal pattern gets its own pools."""
        g3 = base_cfg(num_layers=3, layer_windows=[32, 32, None])
        g3_other = base_cfg(num_layers=3, layer_windows=[32, None, None])
        config = {
            "pool": {"page_tokens": 16, "num_pages": 32},
            "models": [
                {"name": "x", "family": "gemma3", "config": dict(g3),
                 "engine": dict(ENGINE)},
                {"name": "y", "family": "gemma3", "config": dict(g3),
                 "engine": dict(ENGINE)},
                {"name": "z", "family": "gemma3", "config": dict(g3_other),
                 "engine": dict(ENGINE)},
            ],
        }
        runner = build_runtime(config)
        try:
            ex = runner.models["x"].engine
            ey = runner.models["y"].engine
            ez = runner.models["z"].engine
            assert ex._group_pools is not None
            # identical unequal pattern → shared per-group pools
            assert ey._group_pools[0] is ex._group_pools[0]
            assert ey._group_pools[1] is ex._group_pools[1]
            # different pattern (2:1 vs 1:2) → its own pools
            assert ez._group_pools[0] is not ex._group_pools[0]
            out = ex.generate([[1, 2, 3]], SamplingParams(max_new_tokens=4))
            assert len(out[0].output_tokens) == 4
            outy = ey.generate([[4, 5]], SamplingParams(max_new_tokens=4))
            assert len(outy[0].output_tokens) == 4
        finally:
            for h in runner.models.values():
                h.engine.shutdown()
