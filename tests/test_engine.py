"""End-to-end engine tests (CPU, pallas interpret mode, toy model).

The acceptance semantics come from the reference's
``tests/test_elastic_serving.py:150-165``: under load the pool must GROW,
on drain it must SHRINK, and deterministic generation must be CORRECT
(identical token-for-token) regardless of paging, batching, or an elastic
limit cut mid-run.
"""

import hashlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvcached_tpu import shm
from kvcached_tpu.engine import EngineConfig, LLMEngine, SamplingParams
from kvcached_tpu.models.llama import (
    LlamaConfig,
    init_llama_params,
    rms_norm,
    rope,
)


def dense_greedy_reference(params, cfg, prompt, max_new):
    """Straight-line dense decoding (no paging, no batching) as the golden
    model: full causal attention over all tokens each step."""
    tokens = list(prompt)
    for _ in range(max_new + 1):  # +1: first "generation" comes from prefill
        T = len(tokens)
        x = params["embed"][jnp.asarray(tokens)]
        positions = jnp.arange(T)
        mask = jnp.tril(jnp.ones((T, T), bool))
        H, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        group = H // KH
        for l in range(cfg.num_layers):
            lp = {k: v[l] for k, v in params["layers"].items()}
            h = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
            q = rope((h @ lp["wq"]).reshape(T, H, D), positions, cfg.rope_theta)
            k = rope((h @ lp["wk"]).reshape(T, KH, D), positions, cfg.rope_theta)
            v = (h @ lp["wv"]).reshape(T, KH, D)
            qg = q.reshape(T, KH, group, D).astype(jnp.float32)
            s = jnp.einsum("tkgd,skd->ktgs", qg, k.astype(jnp.float32)) / np.sqrt(D)
            s = jnp.where(mask[None, :, None, :], s, -1e30)
            p = jax.nn.softmax(s, axis=-1)
            attn = jnp.einsum("ktgs,skd->tkgd", p, v.astype(jnp.float32))
            x = x + attn.reshape(T, H * D).astype(x.dtype) @ lp["wo"]
            h = rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
            x = x + (jax.nn.silu(h @ lp["w_gate"]) * (h @ lp["w_up"])) @ lp["w_down"]
        x = rms_norm(x, params["final_norm"], cfg.rms_eps)
        logits = (x[-1] @ params["lm_head"]).astype(jnp.float32)
        tokens.append(int(jnp.argmax(logits)))
        if len(tokens) - len(prompt) >= max_new:
            break
    return tokens[len(prompt):]


@pytest.fixture(scope="module")
def toy():
    cfg = LlamaConfig.toy()
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def make_engine(cfg, params, **kw):
    defaults = dict(
        max_batch=4,
        max_model_len=256,
        page_tokens=16,
        decode_horizon=4,
        prefill_buckets=(32, 64),
        num_pages=64,
        interpret=True,
    )
    defaults.update(kw)
    return LLMEngine(cfg, EngineConfig(**defaults), params=params)


class TestCorrectness:
    def test_paged_matches_dense_reference(self, toy):
        """Greedy generation through the full paged engine must match
        straight-line dense decoding token-for-token."""
        cfg, params = toy
        prompt = [1, 7, 42, 3, 99, 5, 250, 17]
        want = dense_greedy_reference(params, cfg, prompt, max_new=12)
        eng = make_engine(cfg, params)
        try:
            out = eng.generate([prompt], SamplingParams(max_new_tokens=12))
            assert out[0].output_tokens == want
        finally:
            eng.shutdown()

    def test_batched_matches_single(self, toy):
        """Continuous batching must not change any sequence's output."""
        cfg, params = toy
        prompts = [[1, 2, 3, 4], [10, 20, 30, 40, 50, 60], [7] * 9]
        eng = make_engine(cfg, params)
        try:
            batched = eng.generate(prompts, SamplingParams(max_new_tokens=10))
        finally:
            eng.shutdown()
        for i, p in enumerate(prompts):
            eng1 = make_engine(cfg, params)
            try:
                single = eng1.generate([p], SamplingParams(max_new_tokens=10))
                assert single[0].output_tokens == batched[i].output_tokens, f"seq {i}"
            finally:
                eng1.shutdown()


class TestElasticServing:
    def test_grew_shrank_correct(self, toy):
        """The reference's top-level acceptance gate, natively:
        GREW under load, SHRANK on drain, md5-identical output."""
        cfg, params = toy
        eng = make_engine(cfg, params, num_pages=128, max_batch=4)
        try:
            idle_mapped = eng.manager.get_mapped_memory_size()

            prompts = [[i + 1, i + 2, i + 3, i + 4] for i in range(8)]
            sp = SamplingParams(max_new_tokens=24)
            peak = 0
            ids = [eng.add_request(p, sp) for p in prompts]
            while eng.has_unfinished():
                eng.step()
                peak = max(peak, eng.manager.get_mapped_memory_size())
            outs = {o.req_id: o.output_tokens for o in eng.finished_outputs}
            eng.manager.trim()
            drained = eng.manager.get_mapped_memory_size()

            assert peak > 1.5 * max(idle_mapped, eng.kv_cfg.page_bytes), "GREW"
            assert drained < peak, "SHRANK"

            # CORRECT: rerun and require md5-identical generations
            eng2 = make_engine(cfg, params, num_pages=128, max_batch=4)
            try:
                outs2 = eng2.generate(prompts, sp)
            finally:
                eng2.shutdown()
            h1 = hashlib.md5(str([outs[i] for i in ids]).encode()).hexdigest()
            h2 = hashlib.md5(str([o.output_tokens for o in outs2]).encode()).hexdigest()
            assert h1 == h2, "CORRECT"
        finally:
            eng.shutdown()

    def test_memory_pressure_preemption(self, toy):
        """With a tiny pool the engine must preempt rather than corrupt, and
        still finish every request with correct output."""
        cfg, params = toy
        eng_big = make_engine(cfg, params, num_pages=128)
        try:
            want = eng_big.generate(
                [[5, 6, 7], [8, 9, 10], [11, 12, 13]],
                SamplingParams(max_new_tokens=16),
            )
        finally:
            eng_big.shutdown()

        # pool so small only ~1-2 sequences fit at once
        eng = make_engine(cfg, params, num_pages=8)
        try:
            got = eng.generate(
                [[5, 6, 7], [8, 9, 10], [11, 12, 13]],
                SamplingParams(max_new_tokens=16),
            )
            for w, g in zip(want, got):
                assert w.output_tokens == g.output_tokens
        finally:
            eng.shutdown()


class TestOperatorLimitDuringServing:
    def test_kvctl_limit_cut_mid_serving(self, toy):
        """The reference's full acceptance flow (test_elastic_serving.py):
        serve load → operator cuts the limit via shm (kvctl) → engine
        shrinks (deferred until frees allow) → keeps serving correctly
        under the reduced limit."""
        import time
        import uuid

        from kvcached_tpu import shm

        cfg, params = toy
        name = f"kvcached_eng_{uuid.uuid4().hex[:6]}"
        eng = make_engine(cfg, params, num_pages=64, ipc_name=name)
        try:
            # phase 1: serve under the full pool
            prompts = [[i + 1, i + 2, i + 3, i + 4] for i in range(4)]
            sp = SamplingParams(max_new_tokens=16)
            out1 = eng.generate(prompts, sp)
            peak = eng.manager.get_mapped_memory_size()
            assert peak > 0

            # phase 2: operator cuts the limit to 8 pages
            limit = 8 * eng.kv_cfg.page_bytes
            shm.update_kv_cache_limit(eng.manager._tracker.ipc_name
                                      if hasattr(eng.manager, "_tracker")
                                      else name, limit)
            deadline = time.time() + 5
            while time.time() < deadline:
                eng.manager.alloc(0)  # pick up the resize target
                if eng.manager.available_size() <= 8 * eng.kv_cfg.blocks_per_page:
                    break
                time.sleep(0.05)

            # phase 3: keep serving under the reduced limit; outputs must
            # be identical to an unconstrained engine's
            out2 = eng.generate(prompts, sp)
            eng.manager.trim()
            assert eng.manager.get_mapped_memory_size() <= limit
            assert [o.output_tokens for o in out1] == [o.output_tokens for o in out2]
        finally:
            eng.shutdown()


class TestBatchedPrefill:
    """prefill_batch > 1: N waiting prompts stack into ONE padded prefill
    dispatch.  Rows are independent in the kernel, so outputs must be
    token-exact vs the serial path (prefill_batch=1)."""

    def _serve(self, cfg, params, prompts, max_new=12, **kw):
        eng = make_engine(cfg, params, **kw)
        try:
            sp = SamplingParams(max_new_tokens=max_new)
            rids = [eng.add_request(list(p), sp) for p in prompts]
            while eng.has_unfinished():
                eng.step()
            idx = {r: i for i, r in enumerate(rids)}
            return {idx[o.req_id]: o.output_tokens
                    for o in eng.finished_outputs}
        finally:
            eng.shutdown()

    def test_token_exact_vs_serial(self, toy):
        cfg, params = toy
        prompts = [[1, 2, 3, 4, 5], list(range(40, 70)), [7] * 3,
                   [9, 8, 7, 6] * 4]
        want = self._serve(cfg, params, prompts, prefill_batch=1)
        got = self._serve(cfg, params, prompts, prefill_batch=4)
        assert got == want, "batched prefill changed outputs"

    def test_metrics_report_batched_dispatches(self, toy):
        cfg, params = toy
        eng = make_engine(cfg, params, prefill_batch=4)
        try:
            sp = SamplingParams(max_new_tokens=4)
            eng.generate([[1, 2, 3], [4, 5], [6, 7, 8]], sp)
            pb = eng.kv_metrics()["prefill_batch"]
            assert pb["dispatches"] >= 1
            assert pb["prompts"] == 3
            assert pb["prompts_per_dispatch"] > 1.0
        finally:
            eng.shutdown()

    def test_mixed_lengths_and_padding_rows(self, toy):
        """3 prompts with prefill_batch=4: one pad row (true_len 0, zero
        pages) must not perturb anything; different lengths share the
        largest bucket."""
        cfg, params = toy
        prompts = [[5], list(range(1, 64)), [2, 3]]
        want = self._serve(cfg, params, prompts, prefill_batch=1)
        got = self._serve(cfg, params, prompts, prefill_batch=4)
        assert got == want

    def test_long_prompt_keeps_chunked_path(self, toy):
        """A head-of-line prompt beyond the largest bucket falls back to
        interleaved chunked prefill; later short prompts still batch."""
        cfg, params = toy
        long_prompt = [((3 * j) % 120) + 1 for j in range(100)]  # > bucket 64
        prompts = [long_prompt, [1, 2, 3], [4, 5, 6, 7]]
        want = self._serve(cfg, params, prompts, prefill_batch=1, max_new=8)
        got = self._serve(cfg, params, prompts, prefill_batch=4, max_new=8)
        assert got == want

    def test_prefix_cache_hits_inside_batch(self, toy):
        """Requests extending a cached prefix batch with fresh requests:
        cache-hit rows start at q_start > 0 inside the same dispatch."""
        cfg, params = toy

        def two_rounds(pb):
            eng = make_engine(cfg, params, prefill_batch=pb)
            try:
                sp = SamplingParams(max_new_tokens=10)
                first = [5, 6, 7, 8] * 8  # 32 tokens: full pages cached
                out1 = eng.generate([first], sp)[0].output_tokens
                follow = [list(first) + out1[:4], [1, 2, 3], [9] * 5]
                outs = eng.generate(follow, sp)
                return out1, [o.output_tokens for o in outs]
            finally:
                eng.shutdown()

        assert two_rounds(4) == two_rounds(1)

    def test_sampled_first_token_reproducible(self, toy):
        """Sampled rows draw their first token from their own row logits;
        identical histories reproduce identical outputs."""
        cfg, params = toy
        eng_kw = dict(prefill_batch=4)
        prompts = [[1, 2, 3], [4, 5], [6, 7, 8, 9]]

        def run():
            eng = make_engine(cfg, params, **eng_kw)
            try:
                sp = SamplingParams(max_new_tokens=6, temperature=0.8,
                                    top_k=20)
                return [o.output_tokens for o in eng.generate(prompts, sp)]
            finally:
                eng.shutdown()

        assert run() == run()

    def test_batch_on_mesh(self, toy):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from kvcached_tpu.parallel.mesh import make_mesh

        # f32: TP psum ordering makes bf16 non-bit-identical to
        # single-device (known caveat) — this test isolates BATCHING, so
        # compare meshed-serial vs meshed-batched at f32 plus a
        # single-device cross-check
        cfg = LlamaConfig.toy(num_heads=8, num_kv_heads=4, dtype="float32")
        params = init_llama_params(cfg, jax.random.PRNGKey(1))
        prompts = [[1, 2, 3, 4], [5, 6], [7, 8, 9], [10] * 6]
        sp = SamplingParams(max_new_tokens=8)

        def serve(mesh, pb):
            eng = LLMEngine(
                cfg,
                EngineConfig(max_batch=4, max_model_len=256, page_tokens=16,
                             decode_horizon=4, prefill_buckets=(32, 64),
                             num_pages=64, interpret=True, prefill_batch=pb,
                             kv_dtype="float32"),
                params=params, mesh=mesh,
            )
            try:
                return [o.output_tokens for o in eng.generate(prompts, sp)]
            finally:
                eng.shutdown()

        mesh = make_mesh(tp=4, dp=2)
        want = serve(mesh, 1)
        got = serve(mesh, 4)
        assert got == want, "meshed batched prefill diverged from serial"
        single = serve(None, 1)
        assert want == single, "meshed serial diverged from single-device"

    def test_int8_kv_batched(self, toy):
        cfg, params = toy
        over = dict(kv_dtype="int8", kv_scale=0.05, page_tokens=32,
                    prefill_buckets=(32, 64), max_model_len=256)
        prompts = [[1, 2, 3, 4, 5], list(range(40, 60)), [7] * 3]
        want = self._serve(cfg, params, prompts, prefill_batch=1, **over)
        got = self._serve(cfg, params, prompts, prefill_batch=4, **over)
        assert got == want
