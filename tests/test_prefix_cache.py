"""Prefix-cache tests.

Ports the semantics of the reference's tests/test_prefix_cache.py (hit/miss,
LRU eviction, touch/reactivate, caps) plus the engine-level guarantees the
TPU design adds: cache-hit generation is BIT-IDENTICAL to recomputation
(single unified prefill path), and cached pages are reclaimed under memory
pressure before preemption.
"""

import jax
import pytest

from kvcached_tpu.engine import EngineConfig, LLMEngine, SamplingParams
from kvcached_tpu.engine.prefix_cache import PrefixCache, page_keys
from kvcached_tpu.models.llama import LlamaConfig, init_llama_params


class TestPageKeys:
    def test_chained_keys_depend_on_prefix(self):
        k1 = page_keys([1, 2, 3, 4, 5, 6, 7, 8], 4)
        k2 = page_keys([9, 2, 3, 4, 5, 6, 7, 8], 4)
        assert k1[0] != k2[0]
        assert k1[1] != k2[1]  # same second page content, different prefix

    def test_namespace_isolates_models(self):
        a = page_keys([1, 2, 3, 4], 4, "modelA")
        b = page_keys([1, 2, 3, 4], 4, "modelB")
        assert a != b

    def test_partial_page_excluded(self):
        assert len(page_keys([1, 2, 3, 4, 5], 4)) == 1


class TestPrefixCacheUnit:
    def test_lookup_hit_and_miss(self):
        c = PrefixCache(page_tokens=4, max_cached_tokens=1000)
        keys = page_keys(list(range(12)), 4)
        c.insert(keys, [10, 11, 12])
        assert c.lookup(keys) == [10, 11, 12]
        other = page_keys([99] * 8, 4)
        assert c.lookup(other) == []

    def test_longest_prefix_only(self):
        c = PrefixCache(4, 1000)
        keys = page_keys(list(range(12)), 4)
        c.insert(keys[:2], [10, 11])  # only first two pages cached
        assert c.lookup(keys) == [10, 11]

    def test_refcount_and_evictable_transition(self):
        c = PrefixCache(4, 1000)
        keys = page_keys(list(range(8)), 4)
        c.insert(keys, [5, 6])
        assert c.num_evictable == 0
        retained, to_free = c.release([5, 6])
        assert retained == [5, 6] and to_free == []
        assert c.num_evictable == 2
        # reactivate (touch) via lookup
        assert c.lookup(keys) == [5, 6]
        assert c.num_evictable == 0

    def test_lru_cap_enforced(self):
        c = PrefixCache(page_tokens=4, max_cached_tokens=8)  # cap = 2 pages
        for i in range(4):
            keys = page_keys([i * 100 + j for j in range(4)], 4)
            c.insert(keys, [i])
            _, freed = c.release([i])
        assert c.num_evictable <= 2

    def test_eviction_order_is_lru(self):
        c = PrefixCache(4, 1000)
        for i in range(3):
            keys = page_keys([i * 100 + j for j in range(4)], 4)
            c.insert(keys, [i])
            c.release([i])
        assert c.evict(2) == [0, 1]
        assert c.num_evictable == 1

    def test_disabled_cache(self):
        c = PrefixCache(4, max_cached_tokens=0)
        assert not c.enabled
        assert c.lookup(page_keys([1, 2, 3, 4], 4)) == []

    def test_untracked_blocks_pass_through_release(self):
        c = PrefixCache(4, 1000)
        retained, to_free = c.release([77, 78])
        assert retained == [] and to_free == [77, 78]


@pytest.fixture(scope="module")
def toy():
    cfg = LlamaConfig.toy()
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def make_engine(cfg, params, **kw):
    defaults = dict(
        max_batch=4, max_model_len=256, page_tokens=16, decode_horizon=4,
        prefill_buckets=(32, 64), num_pages=64, interpret=True,
    )
    defaults.update(kw)
    return LLMEngine(cfg, EngineConfig(**defaults), params=params)


class TestEngineIntegration:
    def test_cache_hit_is_bit_identical(self, toy):
        """Second serve of a shared prefix must produce identical tokens —
        the unified prefill path guarantees equal numerics."""
        cfg, params = toy
        prompt = list(range(1, 40))  # 2 full pages (16) + tail
        eng = make_engine(cfg, params)
        try:
            first = eng.generate([prompt], SamplingParams(max_new_tokens=10))
            stats0 = eng.prefix_cache.get_usage()
            second = eng.generate([prompt], SamplingParams(max_new_tokens=10))
            stats1 = eng.prefix_cache.get_usage()
            assert first[0].output_tokens == second[0].output_tokens
            assert stats1["hits"] > stats0["hits"], "second serve must hit"
        finally:
            eng.shutdown()

    def test_cache_off_matches_cache_on(self, toy):
        cfg, params = toy
        prompt = list(range(1, 40))
        eng_on = make_engine(cfg, params)
        eng_off = make_engine(cfg, params, enable_prefix_caching=False)
        try:
            a = eng_on.generate([prompt] * 2, SamplingParams(max_new_tokens=8))
            b = eng_off.generate([prompt] * 2, SamplingParams(max_new_tokens=8))
            for x, y in zip(a, b):
                assert x.output_tokens == y.output_tokens
        finally:
            eng_on.shutdown()
            eng_off.shutdown()

    def test_shared_prefix_dedups_pages(self, toy):
        """Two live sequences with the same prompt share prefix pages."""
        cfg, params = toy
        prompt = list(range(1, 40))
        eng = make_engine(cfg, params)
        try:
            # warm the cache
            eng.generate([prompt], SamplingParams(max_new_tokens=4))
            pages_before = eng.manager.page_allocator.num_in_use
            eng.generate([prompt], SamplingParams(max_new_tokens=4))
            usage = eng.prefix_cache.get_usage()
            assert usage["hits"] >= 2
        finally:
            eng.shutdown()

    def test_pressure_evicts_cache_before_preempting(self, toy):
        cfg, params = toy
        eng = make_engine(cfg, params, num_pages=10)
        try:
            # fill cache with a few finished requests
            for i in range(3):
                eng.generate([[i + 1] * 33], SamplingParams(max_new_tokens=2))
            assert eng.prefix_cache.num_evictable > 0
            # a big new request must evict cached pages rather than fail
            out = eng.generate([list(range(1, 60))], SamplingParams(max_new_tokens=4))
            assert len(out[0].output_tokens) == 4
            assert eng._preempt_count == 0
        finally:
            eng.shutdown()
