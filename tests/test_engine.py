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
