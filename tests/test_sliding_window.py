"""Sliding-window attention (Mistral-style) tests.

Correctness: paged SW decode must match a dense reference with the same
window mask.  Elasticity: pages that slide out of every window must return
to the shared pool mid-sequence — bounded KV memory for unbounded
generation (the reference handles this class via per-group elastic pools;
here the reclaim is native to the scheduler).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvcached_tpu.engine import EngineConfig, LLMEngine, SamplingParams
from kvcached_tpu.models.llama import (
    LlamaConfig,
    init_llama_params,
    rms_norm,
    rope,
)


def dense_sw_reference(params, cfg, prompt, max_new):
    """Dense greedy decoding with an explicit sliding-window mask."""
    W = cfg.sliding_window
    tokens = list(prompt)
    for _ in range(max_new + 1):
        T = len(tokens)
        x = params["embed"][jnp.asarray(tokens)]
        positions = jnp.arange(T)
        i = jnp.arange(T)[:, None]
        j = jnp.arange(T)[None, :]
        mask = (j <= i) & (j > i - W)
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
def toy_sw():
    cfg = LlamaConfig.toy(sliding_window=32)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def make_engine(cfg, params, **kw):
    d = dict(max_batch=2, max_model_len=256, page_tokens=16, decode_horizon=4,
             prefill_buckets=(32, 64), num_pages=64, interpret=True)
    d.update(kw)
    return LLMEngine(cfg, EngineConfig(**d), params=params)


class TestSlidingWindowCorrectness:
    def test_matches_dense_sw_reference(self, toy_sw):
        cfg, params = toy_sw
        prompt = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3, 2, 3, 8, 4]
        want = dense_sw_reference(params, cfg, prompt, max_new=30)
        eng = make_engine(cfg, params)
        try:
            got = eng.generate([prompt], SamplingParams(max_new_tokens=30))
            assert got[0].output_tokens == want
        finally:
            eng.shutdown()

    def test_prompt_longer_than_window(self, toy_sw):
        cfg, params = toy_sw
        prompt = list(np.random.default_rng(0).integers(1, 500, 50))
        want = dense_sw_reference(params, cfg, [int(t) for t in prompt], max_new=8)
        eng = make_engine(cfg, params)
        try:
            got = eng.generate([[int(t) for t in prompt]],
                               SamplingParams(max_new_tokens=8))
            assert got[0].output_tokens == want
        finally:
            eng.shutdown()


class TestSlidingWindowElasticity:
    def test_pages_reclaimed_mid_sequence(self, toy_sw):
        """Long generation must hold only ~window worth of pages: KV memory
        is bounded even as the sequence grows."""
        cfg, params = toy_sw
        eng = make_engine(cfg, params, max_model_len=256)
        try:
            eng.add_request([1, 2, 3, 4], SamplingParams(max_new_tokens=180))
            peak_pages = 0
            while eng.has_unfinished():
                eng.step()
                if eng.running:
                    seq = eng.running[0]
                    live = sum(1 for b in seq.blocks if b is not None)
                    peak_pages = max(peak_pages, live)
            # window 32 tokens / 16-token pages = 2 pages + boundary + horizon
            bound = 32 // 16 + 2 + eng.cfg.decode_horizon // 16 + 1
            assert peak_pages <= bound, f"held {peak_pages} > bound {bound}"
        finally:
            eng.shutdown()

    def test_prefix_cache_forced_off(self, toy_sw):
        cfg, params = toy_sw
        eng = make_engine(cfg, params)
        try:
            assert not eng.prefix_cache.enabled
        finally:
            eng.shutdown()
