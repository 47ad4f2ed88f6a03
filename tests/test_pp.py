"""Pipeline-parallel stage execution tests: per-stage pools must be
invisible to outputs (token-exact vs the plain engine) while giving each
stage independent accounting and operator control."""

import uuid

import jax
import pytest

from kvcached_tpu.engine import EngineConfig, LLMEngine, SamplingParams
from kvcached_tpu.models.llama import LlamaConfig, init_llama_params
from kvcached_tpu.parallel.pp import PPLlamaAdapter


@pytest.fixture(scope="module")
def toy():
    cfg = LlamaConfig.toy(num_layers=4)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


ECFG = dict(
    max_batch=2, max_model_len=128, page_tokens=16, decode_horizon=2,
    prefill_buckets=(16, 32), num_pages=64, interpret=True,
)


class TestPPExactness:
    def test_two_stage_matches_single_engine(self, toy):
        cfg, params = toy
        prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
        sp = SamplingParams(max_new_tokens=10)

        plain = LLMEngine(cfg, EngineConfig(**ECFG), params=params)
        try:
            want = [o.output_tokens for o in plain.generate(prompts, sp)]
        finally:
            plain.shutdown()

        pp = LLMEngine(
            PPLlamaAdapter(cfg, num_stages=2),
            EngineConfig(**ECFG), params=params,
        )
        try:
            assert pp.num_groups == 2  # stages are layer groups
            got = [o.output_tokens for o in pp.generate(prompts, sp)]
        finally:
            pp.shutdown()
        assert got == want

    def test_stage_count_validation(self, toy):
        cfg, _ = toy
        with pytest.raises(ValueError, match="divisible"):
            PPLlamaAdapter(cfg, num_stages=3)


class TestPerStageControl:
    def test_per_stage_managers_and_shm(self, toy):
        from kvcached_tpu import shm

        cfg, params = toy
        name = f"kvcached_pp_{uuid.uuid4().hex[:6]}"
        eng = LLMEngine(
            PPLlamaAdapter(cfg, num_stages=2),
            EngineConfig(ipc_name=name, **ECFG), params=params,
        )
        try:
            eng.generate([[1, 2, 3, 4]], SamplingParams(max_new_tokens=8))
            # both stages allocated pages and publish usage independently
            assert shm.get_kv_cache_info(name) is not None
            assert shm.get_kv_cache_info(f"{name}_g1") is not None
            u0 = eng.managers[0].page_allocator.num_in_use
            u1 = eng.managers[1].page_allocator.num_in_use
            assert u0 >= 1 and u1 >= 1
        finally:
            eng.shutdown()

    def test_stage_limit_cut_applies_to_that_stage(self, toy):
        """kvctl limiting stage 1's segment shrinks stage 1 only — the
        reference's per-stage elasticity."""
        import time

        from kvcached_tpu import shm

        cfg, params = toy
        name = f"kvcached_pp_{uuid.uuid4().hex[:6]}"
        eng = LLMEngine(
            PPLlamaAdapter(cfg, num_stages=2),
            EngineConfig(ipc_name=name, **ECFG), params=params,
        )
        try:
            pb = eng.kv_cfg.page_bytes
            shm.update_kv_cache_limit(f"{name}_g1", 4 * pb)
            deadline = time.time() + 5
            while time.time() < deadline:
                eng.managers[1].alloc(0)
                if eng.managers[1].page_allocator.limit_pages <= 4:
                    break
                time.sleep(0.05)
            assert eng.managers[1].page_allocator.limit_pages <= 4
            assert eng.managers[0].page_allocator.limit_pages > 4
            # serving still works under the stage limit
            out = eng.generate([[5, 6, 7]], SamplingParams(max_new_tokens=6))
            assert len(out[0].output_tokens) == 6
        finally:
            eng.shutdown()
