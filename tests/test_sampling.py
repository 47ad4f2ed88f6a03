"""Sampling semantics: temperature + top-k + top-p (nucleus) filtering.

The reference delegates sampling to the host engines (vLLM/SGLang); owning
the engine means owning the sampler.  Filtering runs inside the decode scan
(`engine._sample_tokens`), compiled only for dispatches whose batch
actually uses it so the greedy/temperature hot path keeps no vocab sorts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvcached_tpu.engine import EngineConfig, LLMEngine, SamplingParams
from kvcached_tpu.engine.engine import _sample_tokens
from kvcached_tpu.models.llama import LlamaConfig, init_llama_params


@pytest.fixture(scope="module")
def toy():
    cfg = LlamaConfig.toy()
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def make_engine(cfg, params):
    return LLMEngine(cfg, EngineConfig(
        max_batch=4, max_model_len=64, page_tokens=16, decode_horizon=4,
        prefill_buckets=(16, 32), num_pages=64, interpret=True,
    ), params=params)


class TestSampleTokensUnit:
    """Pure-function checks of the filtered sampler."""

    def _draws(self, logits, temps, top_ks, top_ps, n=200):
        out = set()
        for i in range(n):
            t = _sample_tokens(
                logits, temps, top_ks, top_ps, jax.random.PRNGKey(i),
                filters=True,
            )
            out.add(int(t[0]))
        return out

    def test_top_k_restricts_support(self):
        logits = jnp.asarray([[3.0, 2.9, 2.8, -1.0, -2.0, -3.0]])
        seen = self._draws(
            logits, jnp.ones(1), jnp.asarray([2], jnp.int32), jnp.ones(1)
        )
        assert seen <= {0, 1}, f"top_k=2 must only emit the top 2, got {seen}"
        assert len(seen) == 2, "both top-2 tokens should appear in 200 draws"

    def test_top_p_keeps_minimal_nucleus(self):
        # softmax ≈ [0.64, 0.24, 0.09, ...]: p=0.7 keeps {0, 1} (0.64 < 0.7
        # exclusive-cum for token 1, 0.88 ≥ 0.7 for token 2)
        logits = jnp.asarray([[4.0, 3.0, 2.0, 1.0, 0.0, -1.0]])
        seen = self._draws(
            logits, jnp.ones(1), jnp.zeros(1, jnp.int32), jnp.asarray([0.7])
        )
        assert seen == {0, 1}, f"p=0.7 nucleus is {{0,1}}, got {seen}"

    def test_top_p_always_keeps_one_token(self):
        logits = jnp.asarray([[5.0, 0.0, 0.0, 0.0]])
        seen = self._draws(
            logits, jnp.ones(1), jnp.zeros(1, jnp.int32),
            jnp.asarray([1e-9]),
        )
        assert seen == {0}

    def test_mixed_batch_greedy_rows_unaffected(self):
        logits = jnp.asarray([
            [0.0, 1.0, 2.0, 3.0],  # greedy row: argmax = 3
            [3.0, 2.9, -9.0, -9.0],  # filtered row
        ])
        t = _sample_tokens(
            logits,
            jnp.asarray([0.0, 1.0]),
            jnp.asarray([0, 1], jnp.int32),
            jnp.asarray([1.0, 1.0]),
            jax.random.PRNGKey(0),
            filters=True,
        )
        assert int(t[0]) == 3
        assert int(t[1]) == 0  # top_k=1 ≡ argmax

    def test_disabled_filters_match_plain_categorical(self):
        """top_k=0/top_p=1.0 through the filtered path must draw the same
        token as the unfiltered path (same key, same scaled logits)."""
        logits = jax.random.normal(jax.random.PRNGKey(7), (4, 64))
        for seed in range(5):
            key = jax.random.PRNGKey(seed)
            a = _sample_tokens(
                logits, jnp.ones(4), jnp.zeros(4, jnp.int32), jnp.ones(4),
                key, filters=True,
            )
            b = _sample_tokens(
                logits, jnp.ones(4), jnp.zeros(4, jnp.int32), jnp.ones(4),
                key, filters=False,
            )
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestEngineSampling:
    def test_top_k_1_equals_greedy(self, toy):
        """temperature>0 with top_k=1 collapses to the greedy chain."""
        cfg, params = toy
        eng = make_engine(cfg, params)
        try:
            greedy = eng.generate(
                [[9, 8, 7]], SamplingParams(max_new_tokens=10)
            )[0].output_tokens
            topk1 = eng.generate(
                [[9, 8, 7]],
                SamplingParams(max_new_tokens=10, temperature=1.5, top_k=1),
            )[0].output_tokens
        finally:
            eng.shutdown()
        assert topk1 == greedy

    def test_top_p_sampling_is_seeded_deterministic(self, toy):
        cfg, params = toy
        sp = SamplingParams(
            max_new_tokens=10, temperature=1.2, top_p=0.9, top_k=40
        )
        outs = []
        for _ in range(2):
            eng = make_engine(cfg, params)
            try:
                outs.append(eng.generate([[9, 8, 7]], sp)[0].output_tokens)
            finally:
                eng.shutdown()
        assert outs[0] == outs[1], "seeded filtered sampling must reproduce"

    def test_mixed_filtered_and_greedy_batch(self, toy):
        """A batch mixing greedy and filtered rows: the greedy row's output
        must equal its solo-greedy run (filters are per-row)."""
        cfg, params = toy
        eng = make_engine(cfg, params)
        try:
            solo = eng.generate(
                [[1, 2, 3]], SamplingParams(max_new_tokens=8)
            )[0].output_tokens
        finally:
            eng.shutdown()

        eng = make_engine(cfg, params)
        try:
            rid_greedy = eng.add_request(
                [1, 2, 3], SamplingParams(max_new_tokens=8)
            )
            eng.add_request(
                [7, 7, 7],
                SamplingParams(max_new_tokens=8, temperature=1.0, top_k=5),
            )
            while eng.has_unfinished():
                eng.step()
            got = next(
                o for o in eng.finished_outputs if o.req_id == rid_greedy
            ).output_tokens
        finally:
            eng.shutdown()
        assert got == solo


class TestStopStrings:
    """SamplingParams.stop (OpenAI `stop`): generation ends when the
    decoded output contains a stop string; the returned output_text is
    truncated before it (the reference's sglang GSM8K run configures
    stop=["Question"])."""

    class _Tok:
        """Token id == character code (deterministic detokenizer)."""

        def decode(self, toks):
            return "".join(chr(t) for t in toks)

        def encode(self, text):
            return [ord(c) for c in text]

    def _engine(self, cfg, params, **over):
        from kvcached_tpu.engine import EngineConfig, LLMEngine

        ecfg = dict(max_batch=2, max_model_len=128, page_tokens=16,
                    decode_horizon=4, prefill_buckets=(16, 32), num_pages=48,
                    interpret=True, kv_dtype="float32")
        ecfg.update(over)
        return LLMEngine(cfg, EngineConfig(**ecfg), params=params,
                         tokenizer=self._Tok())

    def test_stop_string_truncates_and_finishes_early(self):
        from kvcached_tpu.engine import SamplingParams
        from kvcached_tpu.models.llama import LlamaConfig, init_llama_params

        cfg = LlamaConfig.toy(dtype="float32")
        params = init_llama_params(cfg, jax.random.PRNGKey(0))
        eng = self._engine(cfg, params)
        try:
            # run once unstopped to learn the model's actual output, then
            # stop on a substring of it
            base = eng.generate([[65, 66, 67]],
                                SamplingParams(max_new_tokens=24))[0]
            text = self._Tok().decode(base.output_tokens)
            assert base.output_text is None  # no stops configured
            probe = text[5:8]  # some substring the model provably emits
            out = eng.generate(
                [[65, 66, 67]],
                SamplingParams(max_new_tokens=24, stop=(probe,)),
            )[0]
            assert out.output_text is not None, "stop string did not fire"
            assert probe not in out.output_text
            assert text.startswith(out.output_text)
            idx = text.find(probe)
            assert out.output_text == text[:idx]
            # finished EARLY: fewer tokens than the unstopped run
            assert len(out.output_tokens) < len(base.output_tokens)
        finally:
            eng.shutdown()

    def test_no_tokenizer_ignores_stops(self):
        from kvcached_tpu.engine import (
            EngineConfig, LLMEngine, SamplingParams,
        )
        from kvcached_tpu.models.llama import LlamaConfig, init_llama_params

        cfg = LlamaConfig.toy(dtype="float32")
        params = init_llama_params(cfg, jax.random.PRNGKey(0))
        eng = LLMEngine(
            cfg,
            EngineConfig(max_batch=1, max_model_len=64, page_tokens=16,
                         decode_horizon=4, prefill_buckets=(16,),
                         num_pages=32, interpret=True, kv_dtype="float32"),
            params=params,
        )
        try:
            out = eng.generate(
                [[1, 2, 3]], SamplingParams(max_new_tokens=8, stop=("x",))
            )[0]
            assert len(out.output_tokens) == 8
            assert out.output_text is None
        finally:
            eng.shutdown()

    def test_stop_with_spec_decode(self):
        from kvcached_tpu.engine import SamplingParams
        from kvcached_tpu.models.llama import LlamaConfig, init_llama_params

        cfg = LlamaConfig.toy(dtype="float32")
        params = init_llama_params(cfg, jax.random.PRNGKey(0))
        eng = self._engine(cfg, params, spec_decode=True)
        plain = self._engine(cfg, params)
        try:
            base = plain.generate([[65, 66, 67, 65, 66, 67]],
                                  SamplingParams(max_new_tokens=20))[0]
            text = self._Tok().decode(base.output_tokens)
            probe = text[4:7]
            sp = SamplingParams(max_new_tokens=20, stop=(probe,))
            out = eng.generate([[65, 66, 67, 65, 66, 67]], sp)[0]
            want = plain.generate([[65, 66, 67, 65, 66, 67]], sp)[0]
            assert out.output_text == want.output_text == text[:text.find(probe)]
        finally:
            eng.shutdown()
            plain.shutdown()


class TestBatchedFirstTokenIndependence:
    def test_identical_prompts_same_seed_diversify(self):
        """Batched prefill must give sampled rows INDEPENDENT first-token
        draws even when prompts and seeds are identical (per-row key =
        step + seed + row index) — regression: one shared key made all
        rows of a batch start with the same token."""
        from kvcached_tpu.engine import (
            EngineConfig, LLMEngine, SamplingParams,
        )
        from kvcached_tpu.models.llama import LlamaConfig, init_llama_params

        cfg = LlamaConfig.toy(dtype="float32")
        params = init_llama_params(cfg, jax.random.PRNGKey(0))

        def run():
            eng = LLMEngine(
                cfg,
                EngineConfig(max_batch=8, max_model_len=64, page_tokens=16,
                             decode_horizon=2, prefill_buckets=(16,),
                             num_pages=96, interpret=True,
                             kv_dtype="float32", prefill_batch=8),
                params=params,
            )
            try:
                sp = SamplingParams(max_new_tokens=1, temperature=1.0)
                outs = eng.generate([[1, 2, 3]] * 8, sp)
                return [o.output_tokens[0] for o in outs]
            finally:
                eng.shutdown()

        firsts = run()
        assert len(set(firsts)) > 1, (
            f"8 identical sampled prompts all drew {firsts[0]} — "
            "rows share a PRNG key"
        )
        # reproducible across identical engine histories (the PRNG keys
        # off the step counter, like the serial sampled path)
        assert firsts == run()
