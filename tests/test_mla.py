"""MLA model family tests.

Correctness strategy: the absorbed paged path is compared against a dense
absorbed-form reference at the logits level (tolerance — flash vs dense
softmax reduction order differs), while engine-level guarantees (batching
invariance, prefix-cache bit-identity, elastic behavior) are exact because
they compare the paged path with itself.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvcached_tpu.engine import EngineConfig, LLMEngine, SamplingParams
from kvcached_tpu.models.llama import rms_norm, rope
from kvcached_tpu.models.mla import (
    MLAConfig,
    _latent_entry,
    _out_proj,
    _q_effective,
    init_mla_params,
    mla_prefill_step,
)


@pytest.fixture(scope="module")
def toy():
    cfg = MLAConfig.toy()
    params = init_mla_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def dense_absorbed_logits(params, cfg, prompt):
    """Dense absorbed-form forward over the prompt; returns last-token logits."""
    T = len(prompt)
    x = params["embed"][jnp.asarray(prompt)]
    positions = jnp.arange(T)
    mask = jnp.tril(jnp.ones((T, T), bool))
    for l in range(cfg.num_layers):
        lp = {k: v[l] for k, v in params["layers"].items()}
        h = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
        q_eff = _q_effective(cfg, lp, h, positions)  # [T, H, cache_dim]
        ent = _latent_entry(cfg, lp, h, positions)[:, 0, :]  # [T, cache_dim]
        s = jnp.einsum(
            "thd,sd->ths", q_eff.astype(jnp.float32), ent.astype(jnp.float32)
        ) * cfg.sm_scale
        s = jnp.where(mask[:, None, :], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        attn_lat = jnp.einsum(
            "ths,sr->thr", p, ent[:, : cfg.kv_lora_rank].astype(jnp.float32)
        ).astype(x.dtype)
        x = x + _out_proj(cfg, lp, attn_lat) @ lp["wo"]
        h = rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
        x = x + (jax.nn.silu(h @ lp["w_gate"]) * (h @ lp["w_up"])) @ lp["w_down"]
    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    return (x[-1] @ params["lm_head"]).astype(jnp.float32)


class TestMLAKernelPath:
    def test_prefill_logits_match_dense_absorbed(self, toy):
        cfg, params = toy
        prompt = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]
        want = dense_absorbed_logits(params, cfg, prompt)

        P = 16
        T = 32
        tokens = np.zeros(T, np.int32)
        tokens[: len(prompt)] = prompt
        k_pools = jnp.zeros((cfg.num_layers, 8, 1, P, cfg.cache_head_dim), jnp.float32)
        chunk_pages = jnp.asarray([1, 2], jnp.int32)
        page_table = jnp.asarray([1, 2, 0, 0], jnp.int32)
        got, _, _ = mla_prefill_step(
            params, cfg, jnp.asarray(tokens), jnp.arange(T),
            k_pools, None, chunk_pages, page_table,
            jnp.asarray(0, jnp.int32), jnp.asarray(len(prompt), jnp.int32),
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=3e-2, atol=3e-2
        )


def make_engine(cfg, params, **kw):
    defaults = dict(
        max_batch=2, max_model_len=128, page_tokens=16, decode_horizon=4,
        prefill_buckets=(32, 64), num_pages=32, interpret=True,
    )
    defaults.update(kw)
    return LLMEngine(cfg, EngineConfig(**defaults), params=params)


class TestMLAEngine:
    def test_batched_matches_single(self, toy):
        cfg, params = toy
        prompts = [[1, 2, 3, 4, 5], [9, 8, 7, 6, 5, 4, 3]]
        eng = make_engine(cfg, params)
        try:
            batched = eng.generate(prompts, SamplingParams(max_new_tokens=8))
        finally:
            eng.shutdown()
        for i, p in enumerate(prompts):
            e1 = make_engine(cfg, params)
            try:
                single = e1.generate([p], SamplingParams(max_new_tokens=8))
                assert single[0].output_tokens == batched[i].output_tokens
            finally:
                e1.shutdown()

    def test_prefix_cache_bit_identical(self, toy):
        cfg, params = toy
        prompt = list(range(1, 40))
        eng = make_engine(cfg, params, num_pages=48)
        try:
            first = eng.generate([prompt], SamplingParams(max_new_tokens=6))
            second = eng.generate([prompt], SamplingParams(max_new_tokens=6))
            assert first[0].output_tokens == second[0].output_tokens
            assert eng.prefix_cache.get_usage()["hits"] > 0
        finally:
            eng.shutdown()

    def test_single_buffer_pool(self, toy):
        """MLA uses num_kv_buffers=1: no V pool allocated."""
        cfg, params = toy
        eng = make_engine(cfg, params)
        try:
            assert eng.v_pools is None
            assert eng.kv_cfg.num_kv_buffers == 1
        finally:
            eng.shutdown()


class TestMLABatchedPrefill:
    """Batched prefill for the MLA family: N waiting prompts stack into
    one dispatch over the single latent buffer — token-exact vs serial."""

    def _serve(self, cfg, params, prompts, pb, mesh=None):
        from kvcached_tpu.engine import EngineConfig, LLMEngine, SamplingParams

        eng = LLMEngine(
            cfg,
            EngineConfig(max_batch=4, max_model_len=192, page_tokens=16,
                         decode_horizon=4, prefill_buckets=(16, 32),
                         num_pages=64, interpret=True, kv_dtype="float32",
                         prefill_batch=pb),
            params=params, mesh=mesh,
        )
        try:
            sp = SamplingParams(max_new_tokens=10)
            return [o.output_tokens for o in eng.generate(prompts, sp)]
        finally:
            eng.shutdown()

    def test_token_exact_vs_serial(self):
        from kvcached_tpu.models.mla import MLAConfig, init_mla_params

        cfg = MLAConfig.toy(dtype="float32")
        params = init_mla_params(cfg, jax.random.PRNGKey(0))
        prompts = [[1, 2, 3, 4, 5], list(range(40, 60)), [7] * 3, [9, 9]]
        want = self._serve(cfg, params, prompts, pb=1)
        got = self._serve(cfg, params, prompts, pb=4)
        assert got == want, "MLA batched prefill diverged"

    def test_on_mesh(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from kvcached_tpu.models.mla import MLAConfig, init_mla_params
        from kvcached_tpu.parallel.mesh import make_mesh

        cfg = MLAConfig.toy(dtype="float32")
        params = init_mla_params(cfg, jax.random.PRNGKey(0))
        prompts = [[1, 2, 3, 4, 5], [7] * 3, [9, 9], [4, 5, 6]]
        want = self._serve(cfg, params, prompts, pb=1)
        got = self._serve(cfg, params, prompts, pb=4,
                          mesh=make_mesh(tp=4, dp=2))
        assert got == want, "MLA batched prefill on mesh diverged"
