"""Hybrid-linear (attention + mamba) state-pool tests.

Reference: ElasticMambaPool + HybridLinearKVPool
(sglang/patches.py:705-1208) and super-cell packing with divisor-of-page
padding (sglang/interfaces.py:178-401).  Acceptance:

- super-cell geometry: padded cell tiles allocator pages exactly,
- generation exactness: batched == single, chunked prefill == single-shot
  (state resume across chunks), deterministic across engines,
- state-slot conservation: slots return to the pool when sequences finish,
- elasticity: the state pool obeys its own shm limit group.
"""

import uuid

import jax
import numpy as np
import pytest

from kvcached_tpu.engine import EngineConfig, LLMEngine, SamplingParams
from kvcached_tpu.models.mamba import (
    HybridLinearConfig,
    init_hybrid_linear_params,
    pack_cell,
    unpack_cell,
)


@pytest.fixture(scope="module")
def toy():
    cfg = HybridLinearConfig.toy(num_layers=4)
    params = init_hybrid_linear_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def make_engine(cfg, params, **kw):
    d = dict(
        max_batch=2, max_model_len=128, page_tokens=16, decode_horizon=4,
        prefill_buckets=(16, 32), num_pages=48, interpret=True,
    )
    d.update(kw)
    return LLMEngine(cfg, EngineConfig(**d), params=params)


class TestSuperCell:
    def test_padding_divides_lane_width(self, toy):
        cfg, _ = toy
        assert cfg.cell_elems % 128 == 0
        assert cfg.cell_elems >= cfg.conv_elems + cfg.ssm_elems
        # padding waste is bounded by one lane group
        assert cfg.cell_elems - (cfg.conv_elems + cfg.ssm_elems) < 128

    def test_pack_unpack_roundtrip(self, toy):
        import jax.numpy as jnp

        cfg, _ = toy
        conv = jnp.arange((cfg.d_conv - 1) * cfg.d_inner, dtype=jnp.float32)
        conv = conv.reshape(cfg.d_conv - 1, cfg.d_inner)
        ssm = jnp.arange(cfg.d_inner * cfg.d_state, dtype=jnp.float32)
        ssm = ssm.reshape(cfg.d_inner, cfg.d_state) + 7.0
        cell = pack_cell(cfg, conv, ssm)
        assert cell.shape == (cfg.cell_elems,)
        c2, s2 = unpack_cell(cfg, cell)
        np.testing.assert_array_equal(np.asarray(c2), np.asarray(conv))
        np.testing.assert_array_equal(np.asarray(s2), np.asarray(ssm))


class TestHybridLinearGeneration:
    def test_batched_matches_single(self, toy):
        cfg, params = toy
        prompts = [[1, 2, 3, 4, 5], [9, 8, 7, 6, 5, 4, 3]]
        eng = make_engine(cfg, params)
        try:
            assert eng.has_state
            batched = eng.generate(prompts, SamplingParams(max_new_tokens=10))
        finally:
            eng.shutdown()
        for i, p in enumerate(prompts):
            e1 = make_engine(cfg, params)
            try:
                single = e1.generate([p], SamplingParams(max_new_tokens=10))
                assert single[0].output_tokens == batched[i].output_tokens
            finally:
                e1.shutdown()

    def test_chunked_prefill_resumes_state(self, toy):
        """Prompts beyond the largest bucket exercise the state-resume path
        (each chunk reads the slot state the previous chunk wrote); must be
        token-exact vs an engine whose bucket fits the whole prompt."""
        cfg, params = toy
        prompt = [((i * 31) % 500) + 1 for i in range(50)]  # 50 > bucket 32

        chunked = make_engine(cfg, params, prefill_buckets=(16, 32))
        try:
            got = chunked.generate([prompt], SamplingParams(max_new_tokens=8))
        finally:
            chunked.shutdown()

        single = make_engine(cfg, params, prefill_buckets=(64,))
        try:
            want = single.generate([prompt], SamplingParams(max_new_tokens=8))
        finally:
            single.shutdown()
        assert got[0].output_tokens == want[0].output_tokens

    def test_slot_reuse_is_clean(self, toy):
        """A slot reused by a later sequence must not leak the previous
        sequence's state (fresh prefill zeroes the resume state)."""
        cfg, params = toy
        eng = make_engine(cfg, params, state_slots=2, max_batch=1)
        try:
            a = eng.generate([[5, 6, 7]], SamplingParams(max_new_tokens=6))
            b = eng.generate([[5, 6, 7]], SamplingParams(max_new_tokens=6))
            assert a[0].output_tokens == b[0].output_tokens
        finally:
            eng.shutdown()


class TestStatePoolElasticity:
    def test_slot_conservation(self, toy):
        cfg, params = toy
        eng = make_engine(cfg, params)
        try:
            sm = eng.state_manager
            idle_avail = sm.available_size()
            eng.generate(
                [[1, 2, 3], [4, 5, 6]], SamplingParams(max_new_tokens=6)
            )
            assert sm.available_size() == idle_avail, "state slots leaked"
            # null slot stays reserved
            assert sm.null_block == 0
        finally:
            eng.shutdown()

    def test_state_pool_has_own_shm_group(self, toy):
        from kvcached_tpu import shm

        cfg, params = toy
        name = f"kvcached_mamba_{uuid.uuid4().hex[:6]}"
        eng = make_engine(cfg, params, ipc_name=name)
        try:
            # attention group 0 plus the state group's _g1 suffix
            assert shm.get_kv_cache_info(name) is not None
            info = shm.get_kv_cache_info(f"{name}_g1")
            assert info is not None
            assert info.used_size > 0  # null slot's page is mapped
        finally:
            eng.shutdown()

    def test_state_slots_gate_admission(self, toy):
        """With a tiny state pool, more requests than slots must still all
        complete (admission waits for slots to free)."""
        cfg, params = toy
        eng = make_engine(
            cfg, params, state_slots=2, max_batch=2,
        )
        try:
            prompts = [[i + 1, i + 2, i + 3] for i in range(5)]
            outs = eng.generate(prompts, SamplingParams(max_new_tokens=6))
            assert len(outs) == 5
            assert all(len(o.output_tokens) == 6 for o in outs)
        finally:
            eng.shutdown()
