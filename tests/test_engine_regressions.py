"""Regression tests for the round-1 advisor findings (ADVICE.md):

1. decode horizon overflow past max_model_len clobbered the sequence's last
   real page (host gather clamps) — overflow writes must be discarded.
2. ``_free_seq`` cached pages containing a never-written KV slot (the final
   generated token is never consumed) — only fully-materialized pages may
   enter the prefix cache.
3. ``_do_prefill`` rollback paths dropped ``release()``'s LRU-overflow
   victims — those pages must be freed or they leak.

Plus the zero-page purity invariant the fixes introduce: the kernels discard
writes routed to physical page 0, so it stays all-zeros (defined reads for
unmapped entries — the reference's zero-page semantics,
csrc/ftensor.cpp:160-176).
"""

import jax
import numpy as np
import pytest

from kvcached_tpu.engine import EngineConfig, LLMEngine, SamplingParams
from kvcached_tpu.models.llama import LlamaConfig, init_llama_params


@pytest.fixture(scope="module")
def toy():
    cfg = LlamaConfig.toy()
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def make_engine(cfg, params, **kw):
    defaults = dict(
        max_batch=4,
        max_model_len=32,
        page_tokens=16,
        decode_horizon=4,
        prefill_buckets=(16, 32),
        num_pages=64,
        interpret=True,
    )
    defaults.update(kw)
    return LLMEngine(cfg, EngineConfig(**defaults), params=params)


class RecordingEngine(LLMEngine):
    """Captures the physical page row of each finishing sequence (the pages
    are freed immediately after, so tests can't read them otherwise)."""

    def _finish_seq(self, seq):
        self.last_phys = self._phys_row(seq).copy()
        self.last_len = len(seq.tokens)
        super()._finish_seq(seq)


def test_horizon_overflow_does_not_clobber_last_page(toy):
    """ADVICE #1: a sequence filling max_model_len exactly, decoded with
    K=4, must leave the same KV behind as the K=1 run (the overflow steps
    used to overwrite slot (pos % P) of the last real page)."""
    cfg, params = toy
    prompt = [3, 1, 4, 1, 5, 9, 2, 6]
    sp = SamplingParams(max_new_tokens=24)  # 8 + 24 == max_model_len == 32

    pools, rows, outs = [], [], []
    for K in (1, 4):
        eng = RecordingEngine.__new__(RecordingEngine)
        LLMEngine.__init__(
            eng, cfg,
            EngineConfig(
                max_batch=4, max_model_len=32, page_tokens=16,
                decode_horizon=K, prefill_buckets=(16, 32), num_pages=64,
                interpret=True, enable_prefix_caching=False,
            ),
            params=params,
        )
        try:
            out = eng.generate([prompt], sp)
            outs.append(out[0].output_tokens)
            pools.append(np.asarray(eng.k_pools, np.float32))
            rows.append(eng.last_phys)
        finally:
            eng.shutdown()

    assert outs[0] == outs[1], "K=1 vs K=4 outputs diverged"
    # KV of every consumed position (0..30) must be identical; the final
    # token (pos 31) is never consumed under K=1, so skip its slot.
    P = 16
    for pos in range(31):
        pg1, pg4 = rows[0][pos // P], rows[1][pos // P]
        s = pos % P
        np.testing.assert_array_equal(
            pools[0][:, pg1, :, s], pools[1][:, pg4, :, s],
            err_msg=f"KV mismatch at position {pos}",
        )


def test_zero_page_stays_zero(toy):
    """Padded batch rows and overflow steps route writes to page 0; the
    kernel must discard them (page 0 backs every unmapped table entry)."""
    cfg, params = toy
    eng = make_engine(cfg, params)  # max_batch=4, single request → 3 padded rows
    try:
        eng.generate([[5, 6, 7]], SamplingParams(max_new_tokens=20))
        zero_k = np.asarray(eng.k_pools, np.float32)[:, 0]
        zero_v = np.asarray(eng.v_pools, np.float32)[:, 0]
        assert np.all(zero_k == 0.0), "zero page (K) was dirtied"
        assert np.all(zero_v == 0.0), "zero page (V) was dirtied"
    finally:
        eng.shutdown()


def test_cached_pages_fully_materialized(toy):
    """ADVICE #2: a continued conversation hitting the prefix cache must
    produce the same tokens as a cache-less engine.  Before the fix, a
    sequence finishing at a page boundary cached a page whose last KV slot
    was never written; continuations attended over garbage."""
    cfg, params = toy
    prompt = [11, 22, 33, 44, 55, 66, 77, 88]
    sp = SamplingParams(max_new_tokens=24)  # total 32 = 2 full pages exactly

    eng = make_engine(cfg, params, max_model_len=64, decode_horizon=1,
                      prefill_buckets=(16, 32, 64))
    try:
        first = eng.generate([prompt], sp)[0].output_tokens
        continuation = prompt + first + [7, 8, 9]
        cont_out = eng.generate(
            [continuation], SamplingParams(max_new_tokens=8)
        )[0].output_tokens
    finally:
        eng.shutdown()

    fresh = make_engine(cfg, params, max_model_len=64, decode_horizon=1,
                        prefill_buckets=(16, 32, 64),
                        enable_prefix_caching=False)
    try:
        want = fresh.generate(
            [continuation], SamplingParams(max_new_tokens=8)
        )[0].output_tokens
    finally:
        fresh.shutdown()

    assert cont_out == want, "prefix-cached continuation diverged"


def test_prefill_rollback_frees_overflow_victims(toy):
    """ADVICE #3: when admission fails after a prefix-cache hit, LRU
    victims returned by release() must reach manager.free()."""
    cfg, params = toy
    eng = make_engine(cfg, params, num_pages=16)
    try:
        victim = eng.manager.alloc(1)
        assert victim is not None

        freed: list[list[int]] = []
        orig_free = eng.manager.free

        def spy_free(ids):
            freed.append(list(ids))
            orig_free(ids)

        eng.manager.free = spy_free
        # lookup returns a hit so the rollback path releases it; release
        # reports our pre-allocated block as an LRU-overflow victim
        eng.prefix_cache.lookup = lambda keys: [victim[0]]
        eng.prefix_cache.release = lambda blocks: ([], list(victim))
        # exhaust the pool so _ensure_blocks fails
        avail = eng.manager.available_size()
        hold = eng.manager.alloc(avail)
        assert hold is not None

        rid = eng.add_request([1] * 20, SamplingParams(max_new_tokens=4))
        assert rid >= 0
        seq = eng.waiting.pop(0)
        ok = eng._do_prefill(seq)
        assert not ok, "prefill should fail with exhausted pool"
        assert any(victim[0] in f for f in freed), (
            "LRU-overflow victim from release() was never freed (leak)"
        )
    finally:
        eng.shutdown()


def test_chunked_prefill_long_prompt(toy):
    """VERDICT item 4: prompts several times the largest prefill bucket must
    be served via chunked prefill, token-exact vs a single-shot engine whose
    bucket covers the whole prompt."""
    cfg, params = toy
    prompt = [((i * 37) % 500) + 1 for i in range(100)]  # 100 > bucket 32

    chunked = make_engine(
        cfg, params, max_model_len=256, prefill_buckets=(16, 32),
        decode_horizon=2,
    )
    try:
        got = chunked.generate([prompt], SamplingParams(max_new_tokens=12))
    finally:
        chunked.shutdown()

    single = make_engine(
        cfg, params, max_model_len=256, prefill_buckets=(128,),
        decode_horizon=2,
    )
    try:
        want = single.generate([prompt], SamplingParams(max_new_tokens=12))
    finally:
        single.shutdown()

    assert got[0].output_tokens == want[0].output_tokens


def test_interleaved_chunked_prefill(toy):
    """A long prompt's chunks interleave with decode horizons: a running
    sequence keeps generating while the long prompt prefills, and both
    outputs stay token-exact vs serving each alone."""
    cfg, params = toy
    short = [5, 6, 7]
    long_prompt = [((i * 37) % 500) + 1 for i in range(100)]  # > 3 chunks
    sp = SamplingParams(max_new_tokens=16)

    def solo(prompt):
        eng = make_engine(
            cfg, params, max_model_len=256, prefill_buckets=(16, 32),
            decode_horizon=2, num_pages=96,
        )
        try:
            return eng.generate([prompt], sp)[0].output_tokens
        finally:
            eng.shutdown()

    want_short, want_long = solo(short), solo(long_prompt)

    eng = make_engine(
        cfg, params, max_model_len=256, prefill_buckets=(16, 32),
        decode_horizon=2, num_pages=96,
    )
    try:
        rid_s = eng.add_request(short, sp)
        eng.step()  # short prefills and starts running
        rid_l = eng.add_request(long_prompt, sp)
        saw_interleave = False
        while eng.has_unfinished():
            eng.step()
            short_seq = next(
                (s for s in eng.running if s.req.req_id == rid_s), None
            )
            if (
                eng._prefilling is not None
                and 0 < eng._prefilling.num_prefilled < len(long_prompt)
                and short_seq is not None
                and short_seq.num_generated > 1
            ):
                saw_interleave = True
        outs = {o.req_id: o.output_tokens for o in eng.finished_outputs}
    finally:
        eng.shutdown()

    assert saw_interleave, "decode never ran while the long prompt prefilled"
    assert outs[rid_s] == want_short
    assert outs[rid_l] == want_long


def test_adaptive_horizon_matches_fixed(toy):
    """Adaptive K near the cap must not change outputs."""
    cfg, params = toy
    prompt = [9, 8, 7, 6, 5]
    sp = SamplingParams(max_new_tokens=11)  # not a multiple of the horizon
    outs = []
    for K in (1, 8):
        eng = make_engine(cfg, params, max_model_len=64, decode_horizon=K)
        try:
            outs.append(eng.generate([prompt], sp)[0].output_tokens)
        finally:
            eng.shutdown()
    assert outs[0] == outs[1]
    assert len(outs[0]) == 11


def test_stop_tokens_end_generation_early(toy):
    """stop_token_ids must truncate at the stop token even when the device
    horizon runs past it (post-stop steps are discarded host-side)."""
    cfg, params = toy
    eng = make_engine(cfg, params, max_model_len=64, decode_horizon=4)
    try:
        # discover what the model would generate unconstrained...
        free = eng.generate(
            [[5, 6, 7, 8]], SamplingParams(max_new_tokens=12)
        )[0].output_tokens
        stop = free[5]  # ...then stop at its 6th token
        out = eng.generate(
            [[5, 6, 7, 8]],
            SamplingParams(max_new_tokens=12, stop_token_ids=(stop,)),
        )[0].output_tokens
        first = out.index(stop)
        assert first <= 5
        assert out[-1] == stop, "generation must end AT the stop token"
        assert len(out) <= 6
    finally:
        eng.shutdown()


def test_temperature_sampling_is_seeded_deterministic(toy):
    """temperature>0 draws from the per-step PRNG chain — two engines with
    identical state must sample identical tokens (reproducibility), and
    sampling must differ from greedy."""
    cfg, params = toy
    sp = SamplingParams(max_new_tokens=10, temperature=1.5)
    outs = []
    for _ in range(2):
        eng = make_engine(cfg, params, max_model_len=64)
        try:
            outs.append(
                eng.generate([[9, 8, 7]], sp)[0].output_tokens
            )
        finally:
            eng.shutdown()
    assert outs[0] == outs[1], "seeded sampling must be reproducible"
    eng = make_engine(cfg, params, max_model_len=64)
    try:
        greedy = eng.generate(
            [[9, 8, 7]], SamplingParams(max_new_tokens=10)
        )[0].output_tokens
    finally:
        eng.shutdown()
    assert outs[0] != greedy, "hot sampling should diverge from greedy"
