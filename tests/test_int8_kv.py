"""int8 KV cache with per-head dequantization scales.

VERDICT r1 item 8: scale tensors ride alongside the pools, quantization
happens in-kernel on write, dequantization folds into the scores (K) and
the weighted-value output (V).  Acceptance: matches the bf16 reference
within quantization tolerance; int8 pool halves page_bytes vs bf16.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvcached_tpu.engine import EngineConfig, LLMEngine, SamplingParams
from kvcached_tpu.models.llama import LlamaConfig, init_llama_params
from kvcached_tpu.ops.paged_attention import (
    paged_attention,
    paged_attention_decode,
    paged_attention_reference,
)


def quantize(x, scales):
    """x: [pages, KH, P, D]; scales: [KH] → int8 values."""
    return np.clip(
        np.round(np.asarray(x) / np.asarray(scales)[None, :, None, None]),
        -127, 127,
    ).astype(np.int8)


def make_case(seq_lens=(40, 7), num_pages=16, page_tokens=32,
              kv_heads=2, q_heads=4, dim=128):
    B = len(seq_lens)
    max_pages = max(-(-s // page_tokens) for s in seq_lens)
    q = jax.random.normal(jax.random.PRNGKey(0), (B, q_heads, dim), jnp.float32)
    k = jax.random.normal(
        jax.random.PRNGKey(1), (num_pages, kv_heads, page_tokens, dim),
        jnp.float32,
    )
    v = jax.random.normal(
        jax.random.PRNGKey(2), (num_pages, kv_heads, page_tokens, dim),
        jnp.float32,
    )
    # per-head amax calibration (deliberately different per head)
    k_sc = np.abs(np.asarray(k)).max(axis=(0, 2, 3)) / 127.0
    v_sc = np.abs(np.asarray(v)).max(axis=(0, 2, 3)) / 127.0
    pt = np.zeros((B, max_pages), np.int32)
    nxt = 1
    for b, s in enumerate(seq_lens):
        n = -(-s // page_tokens)
        pt[b, :n] = range(nxt, nxt + n)
        nxt += n
    return q, k, v, k_sc, v_sc, jnp.asarray(pt), jnp.asarray(seq_lens, jnp.int32)


class TestInt8Kernel:
    def test_readonly_matches_bf16_reference(self):
        """int8 pool + per-head scales vs the fp32 values' dense reference:
        error bounded by quantization noise."""
        q, k, v, k_sc, v_sc, pt, sl = make_case()
        k_pool8 = jnp.asarray(quantize(k, k_sc))
        v_pool8 = jnp.asarray(quantize(v, v_sc))
        L_k = jnp.asarray(np.tile(k_sc[None], (1, 1)), jnp.float32)  # [1, KH]
        L_v = jnp.asarray(np.tile(v_sc[None], (1, 1)), jnp.float32)

        out = paged_attention(
            q, k_pool8, v_pool8, pt, sl, interpret=True,
            k_scales=L_k, v_scales=L_v,
        )
        ref = paged_attention_reference(q, k, v, pt, sl)
        # int8 quant noise: ~1% relative on attention outputs
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=0.05, rtol=0.05
        )

    def test_fused_write_quantizes_in_kernel(self):
        """decode write path: unquantized K/V in, int8 lands in the pool
        with the per-head scale applied."""
        q, k, v, k_sc, v_sc, pt, sl = make_case(seq_lens=(33,))
        k_pool8 = jnp.asarray(quantize(k, k_sc))
        v_pool8 = jnp.asarray(quantize(v, v_sc))
        L_k = jnp.asarray(k_sc[None], jnp.float32)
        L_v = jnp.asarray(v_sc[None], jnp.float32)
        B, KH, D = 1, k.shape[1], k.shape[3]
        k_new = jax.random.normal(jax.random.PRNGKey(7), (B, KH, D), jnp.float32)
        v_new = jax.random.normal(jax.random.PRNGKey(8), (B, KH, D), jnp.float32)
        slot_pages = pt[:, 1]  # page holding position 33 (32..63)
        slot_offsets = jnp.asarray([1], jnp.int32)  # 33 % 32

        _, k_out, v_out = paged_attention_decode(
            q, k_pool8[None], v_pool8[None], pt, sl, 0,
            k_new, v_new, slot_pages, slot_offsets,
            interpret=True, k_scales=L_k, v_scales=L_v,
        )
        got = np.asarray(k_out)[0, int(slot_pages[0]), :, 1, :]  # [KH, D]
        want = np.clip(
            np.round(np.asarray(k_new)[0] / k_sc[:, None]), -127, 127
        ).astype(np.int8)
        np.testing.assert_array_equal(got, want)
        got_v = np.asarray(v_out)[0, int(slot_pages[0]), :, 1, :]
        want_v = np.clip(
            np.round(np.asarray(v_new)[0] / v_sc[:, None]), -127, 127
        ).astype(np.int8)
        np.testing.assert_array_equal(got_v, want_v)


@pytest.fixture(scope="module")
def toy():
    cfg = LlamaConfig.toy()
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


class TestInt8Engine:
    def make(self, cfg, params, **kw):
        d = dict(max_batch=2, max_model_len=128, page_tokens=32,
                 decode_horizon=4, prefill_buckets=(32, 64), num_pages=32,
                 interpret=True, kv_dtype="int8")
        d.update(kw)
        return LLMEngine(cfg, EngineConfig(**d), params=params)

    def test_deterministic_and_close_to_bf16(self, toy):
        cfg, params = toy
        prompt = [1, 2, 3, 4, 5, 6, 7]
        a = self.make(cfg, params)
        b = self.make(cfg, params)
        ref = self.make(cfg, params, kv_dtype="bfloat16")
        try:
            out_a = a.generate([prompt], SamplingParams(max_new_tokens=8))
            out_b = b.generate([prompt], SamplingParams(max_new_tokens=8))
            out_r = ref.generate([prompt], SamplingParams(max_new_tokens=8))
            assert out_a[0].output_tokens == out_b[0].output_tokens
            # quantized generation is allowed to drift, but the FIRST token
            # (prefill logits, least accumulated error) should agree
            assert out_a[0].output_tokens[0] == out_r[0].output_tokens[0]
        finally:
            a.shutdown()
            b.shutdown()
            ref.shutdown()

    def test_int8_mla_engine(self):
        """int8 latent pool for the MLA family: the single buffer is
        quantized with the K scales (values come from the same buffer).
        Deterministic; first token agrees with the f32 engine; spec decode
        stays token-exact vs int8 plain decode."""
        from kvcached_tpu.models.mla import MLAConfig, init_mla_params

        cfg = MLAConfig.toy(dtype="float32")
        params = init_mla_params(cfg, jax.random.PRNGKey(0))
        prompts = [[1, 2, 3, 1, 2, 3, 1, 2], [9] * 5]
        sp = SamplingParams(max_new_tokens=10)
        ecfg = dict(max_batch=2, max_model_len=128, page_tokens=32,
                    decode_horizon=4, prefill_buckets=(32, 64), num_pages=32,
                    interpret=True, kv_dtype="int8", kv_scale=0.02)

        def run(**over):
            eng = LLMEngine(cfg, EngineConfig(**{**ecfg, **over}),
                            params=params)
            try:
                return [o.output_tokens for o in eng.generate(prompts, sp)]
            finally:
                eng.shutdown()

        a = run()
        assert a == run(), "int8 MLA generation not deterministic"
        ref = run(kv_dtype="float32")
        assert [t[0] for t in a] == [t[0] for t in ref], (
            "first tokens diverged beyond quantization tolerance"
        )
        spec = run(spec_decode=True, spec_gamma=3)
        assert spec == a, "int8 MLA spec decode diverged from int8 plain"

    def test_int8_pool_halves_memory(self, toy):
        cfg, params = toy
        e8 = self.make(cfg, params)
        e16 = self.make(cfg, params, kv_dtype="bfloat16")
        try:
            assert e8.kv_cfg.page_bytes * 2 == e16.kv_cfg.page_bytes
            assert e8.quant_scales is not None
        finally:
            e8.shutdown()
            e16.shutdown()

    def test_set_kv_scales_takes_effect(self, toy):
        cfg, params = toy
        eng = self.make(cfg, params)
        try:
            L, KH = eng.kv_cfg.num_layers, cfg.num_kv_heads
            out1 = eng.generate([[1, 2, 3]], SamplingParams(max_new_tokens=4))
            # absurd scales must change (wreck) the outputs — proves the
            # scales actually flow into the kernels
            eng.set_kv_scales(
                np.full((L, KH), 100.0), np.full((L, KH), 100.0)
            )
            out2 = eng.generate([[1, 2, 3]], SamplingParams(max_new_tokens=4))
            assert out1[0].output_tokens != out2[0].output_tokens
        finally:
            eng.shutdown()


class TestInt8Stateful:
    """int8 KV for stateful (mamba/hybrid-linear) models: the attention
    layers' pools quantize on write with per-head scales exactly like the
    plain families; the mamba STATE pool stays f32 (recurrent accumulators,
    not paged KV).  Closes the round-2 carve-out (the reference's quantized
    pools don't exclude mamba)."""

    def _make(self, cfg, params, mesh=None, **kw):
        d = dict(max_batch=2, max_model_len=128, page_tokens=32,
                 decode_horizon=4, prefill_buckets=(32, 64), num_pages=32,
                 interpret=True, kv_dtype="int8", kv_scale=0.05)
        d.update(kw)
        return LLMEngine(cfg, EngineConfig(**d), params=params, mesh=mesh)

    def test_hybrid_linear_int8_deterministic_and_close(self):
        from kvcached_tpu.models.mamba import (
            HybridLinearConfig,
            init_hybrid_linear_params,
        )

        cfg = HybridLinearConfig.toy(num_layers=4, dtype="float32")
        params = init_hybrid_linear_params(cfg, jax.random.PRNGKey(0))
        prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
        sp = SamplingParams(max_new_tokens=8)
        a = self._make(cfg, params)
        b = self._make(cfg, params)
        ref = self._make(cfg, params, kv_dtype="float32")
        try:
            out_a = [o.output_tokens for o in a.generate(prompts, sp)]
            out_b = [o.output_tokens for o in b.generate(prompts, sp)]
            out_r = [o.output_tokens for o in ref.generate(prompts, sp)]
            assert out_a == out_b, "int8 stateful generation nondeterministic"
            # quantized KV may drift later; the first token (prefill logits,
            # least accumulated error) must agree with full precision
            assert [t[0] for t in out_a] == [t[0] for t in out_r]
            assert str(a.k_pools.dtype) == "int8"
            assert a.states.dtype == jnp.float32  # state pool unquantized
        finally:
            a.shutdown()
            b.shutdown()
            ref.shutdown()

    def test_hybrid_linear_int8_chunked_prefill(self):
        """A prompt beyond the largest bucket: int8 chunk writes + state
        resume must stay deterministic."""
        from kvcached_tpu.models.mamba import (
            HybridLinearConfig,
            init_hybrid_linear_params,
        )

        cfg = HybridLinearConfig.toy(num_layers=4, dtype="float32")
        params = init_hybrid_linear_params(cfg, jax.random.PRNGKey(0))
        long_prompt = [((5 * j) % 120) + 1 for j in range(96)]  # > bucket 64
        sp = SamplingParams(max_new_tokens=6)
        a = self._make(cfg, params)
        b = self._make(cfg, params)
        try:
            out_a = a.generate([long_prompt], sp)[0].output_tokens
            out_b = b.generate([long_prompt], sp)[0].output_tokens
            assert out_a == out_b
            assert len(out_a) == 6
        finally:
            a.shutdown()
            b.shutdown()

    def test_hybrid_linear_int8_on_mesh(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from kvcached_tpu.models.mamba import (
            HybridLinearConfig,
            init_hybrid_linear_params,
        )
        from kvcached_tpu.parallel.mesh import make_mesh

        cfg = HybridLinearConfig.toy(
            num_layers=4, num_heads=4, num_kv_heads=2,
            intermediate_size=256, dtype="float32",
        )
        params = init_hybrid_linear_params(cfg, jax.random.PRNGKey(0))
        prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [6] * 4, [2, 2]]
        sp = SamplingParams(max_new_tokens=6)
        single = self._make(cfg, params, max_batch=4)
        meshed = self._make(cfg, params, max_batch=4,
                            mesh=make_mesh(tp=2, dp=2))
        try:
            want = [o.output_tokens for o in single.generate(prompts, sp)]
            got = [o.output_tokens for o in meshed.generate(prompts, sp)]
            assert got == want, "int8 stateful mesh diverged"
        finally:
            single.shutdown()
            meshed.shutdown()


class TestScaleShapeContract:
    def test_colocated_pp_scale_shapes(self):
        """Colocated pp accepts BOTH [Lp, KH] (arena-keyed, shared across
        stages) and — since round 5 — [L_total, KH] (per-MODEL-layer:
        true per-stage calibration; the rows ride the step fns' layer
        scan).  Genuinely wrong shapes still fail loudly."""
        import numpy as np

        from kvcached_tpu.engine import EngineConfig, LLMEngine
        from kvcached_tpu.models.llama import LlamaConfig, init_llama_params
        from kvcached_tpu.parallel.pp import PPLlamaAdapter

        cfg = LlamaConfig.toy(num_layers=4, dtype="float32")
        params = init_llama_params(cfg, jax.random.PRNGKey(0))
        eng = LLMEngine(
            PPLlamaAdapter(cfg, num_stages=2),
            EngineConfig(max_batch=2, max_model_len=64, page_tokens=32,
                         prefill_buckets=(32,), num_pages=16,
                         interpret=True, kv_dtype="int8"),
            params=params,
        )
        try:
            L, KH = cfg.num_layers, cfg.num_kv_heads
            per_model = np.full((L, KH), 0.05, np.float32)
            eng.set_kv_scales(per_model, per_model)
            assert eng.quant_scales[0].shape == (L, KH)
            arena = np.full((L // 2, KH), 0.05, np.float32)
            eng.set_kv_scales(arena, arena)
            assert eng.quant_scales[0].shape == (L // 2, KH)
            bad = np.full((L + 1, KH), 0.05, np.float32)
            with pytest.raises(ValueError, match="set_kv_scales"):
                eng.set_kv_scales(bad, bad)
        finally:
            eng.shutdown()


class TestInt8HybridGroups:
    """int8 KV for the plain hybrid family (Gemma2/Gemma3-class layer
    groups).  Scales are per MODEL layer ([L_model, KH]); the step fns
    split them into per-group arena-shaped arrays (within a group, arena
    layer <-> model layer is a bijection — models/hybrid.py
    _group_scales).  Covers both the shared arena (equal groups) and
    per-group arenas (unequal groups, Gemma3's local:global pattern)."""

    def make(self, cfg, params, **kw):
        # kv_scale 0.05 (range ±6.35) — random-init toy K/V are ~N(0,1);
        # 0.02 clips the tails hard enough to flip near-tie argmaxes
        d = dict(max_batch=3, max_model_len=128, page_tokens=32,
                 decode_horizon=4, prefill_buckets=(32, 64), num_pages=32,
                 interpret=True, kv_dtype="int8", kv_scale=0.05,
                 enable_prefix_caching=False)
        d.update(kw)
        return LLMEngine(cfg, EngineConfig(**d), params=params)

    def _run(self, cfg, params, prompts, **over):
        eng = self.make(cfg, params, **over)
        try:
            return [
                o.output_tokens
                for o in eng.generate(
                    prompts, SamplingParams(max_new_tokens=8))
            ]
        finally:
            eng.shutdown()

    @pytest.fixture(scope="class")
    def equal(self):
        from kvcached_tpu.models.hybrid import (
            HybridConfig,
            init_hybrid_params,
        )

        cfg = HybridConfig.toy(num_layers=4, window=32, dtype="float32")
        return cfg, init_hybrid_params(cfg, jax.random.PRNGKey(0))

    @pytest.fixture(scope="class")
    def unequal(self):
        import dataclasses

        from kvcached_tpu.models.hybrid import (
            HybridConfig,
            init_hybrid_params,
        )

        cfg = HybridConfig.toy(num_layers=6, window=32, dtype="float32")
        cfg = dataclasses.replace(
            cfg, layer_windows=(32, 32, None, 32, 32, None))
        assert not cfg.equal_groups
        return cfg, init_hybrid_params(cfg, jax.random.PRNGKey(0))

    def test_equal_groups_deterministic_spec_and_batched(self, equal):
        cfg, params = equal
        prompts = [[1, 2, 3, 4, 5, 6, 7], [9] * 5]
        a = self._run(cfg, params, prompts)
        assert a == self._run(cfg, params, prompts), "not deterministic"
        ref = self._run(cfg, params, prompts, kv_dtype="float32")
        assert [t[0] for t in a] == [t[0] for t in ref], (
            "first tokens diverged beyond quantization tolerance"
        )
        spec = self._run(cfg, params, prompts, spec_decode=True,
                         spec_gamma=2, spec_horizon=2)
        assert spec == a, "int8 hybrid spec decode diverged from plain"
        batched = self._run(cfg, params, prompts, prefill_batch=2)
        assert batched == a, "int8 hybrid batched prefill diverged"

    def test_unequal_groups_int8(self, unequal):
        """The round-5 unblock: per-group arenas + int8 (both were
        mutually exclusive before)."""
        cfg, params = unequal
        prompts = [[5, 6, 7, 5, 6, 7, 5, 6], [1, 2, 1, 2, 1, 2]]
        eng = self.make(cfg, params)
        try:
            assert isinstance(eng.k_pools, tuple)
            assert all(p.dtype == jnp.int8 for p in eng.k_pools)
            assert eng.k_pools[0].shape[0] == 4  # sliding group arena
            assert eng.k_pools[1].shape[0] == 2  # full group arena
            a = [o.output_tokens for o in eng.generate(
                prompts, SamplingParams(max_new_tokens=8))]
        finally:
            eng.shutdown()
        assert a == self._run(cfg, params, prompts), "not deterministic"
        ref = self._run(cfg, params, prompts, kv_dtype="float32")
        assert [t[0] for t in a] == [t[0] for t in ref], (
            "first tokens diverged beyond quantization tolerance"
        )
        spec = self._run(cfg, params, prompts, spec_decode=True,
                         spec_gamma=2, spec_horizon=2)
        assert spec == a, "int8 unequal-group spec decode diverged"
        batched = self._run(cfg, params, prompts, prefill_batch=2)
        assert batched == a, "int8 unequal-group batched prefill diverged"

    def test_scale_contract_and_liveness(self, unequal):
        """Hybrid scales are per MODEL layer; arena shapes are rejected;
        absurd per-layer scales must change output (the split-per-group
        rows really reach the kernels)."""
        cfg, params = unequal
        eng = self.make(cfg, params)
        try:
            L, KH = cfg.num_layers, cfg.num_kv_heads
            out1 = eng.generate([[1, 2, 3]],
                                SamplingParams(max_new_tokens=4))
            good = np.full((L, KH), 0.02, np.float32)
            eng.set_kv_scales(good, good)
            arena = np.full((4, KH), 0.02, np.float32)
            with pytest.raises(ValueError, match="set_kv_scales"):
                eng.set_kv_scales(arena, arena)
            eng.set_kv_scales(np.full((L, KH), 100.0),
                              np.full((L, KH), 100.0))
            out2 = eng.generate([[1, 2, 3]],
                                SamplingParams(max_new_tokens=4))
            assert out1[0].output_tokens != out2[0].output_tokens
        finally:
            eng.shutdown()
