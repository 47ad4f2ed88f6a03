"""Hybrid-attention (per-layer-group pools) tests.

The reference's hybrid models (gpt-oss style) interleave full-attention and
sliding-window layers, each group with its own elastic KV pool
(kvcached/integration/vllm/patches.py:674-789).  Acceptance here:

- token-exact generation vs a dense per-layer-window golden model,
- the sliding-window group frees pages mid-sequence while the full group
  keeps every page (per-group lifetimes over one shared arena),
- per-group operator limits via distinct shm segments (_g<id>).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvcached_tpu.engine import EngineConfig, LLMEngine, SamplingParams
from kvcached_tpu.models.hybrid import (
    HybridConfig,
    init_hybrid_params,
)
from kvcached_tpu.models.llama import rms_norm, rope


def dense_hybrid_reference(params, cfg, prompt, max_new):
    """Straight-line dense decoding with per-layer window masks."""
    tokens = list(prompt)
    for _ in range(max_new + 1):
        T = len(tokens)
        x = params["embed"][jnp.asarray(tokens)]
        positions = jnp.arange(T)
        H, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        group = H // KH
        causal = jnp.tril(jnp.ones((T, T), bool))
        for l in range(cfg.num_layers):
            lp = {k: v[l] for k, v in params["layers"].items()}
            w = cfg.layer_windows[l]
            mask = causal
            if w is not None:
                # kv index must be > q - window
                qi = jnp.arange(T)[:, None]
                ki = jnp.arange(T)[None, :]
                mask = causal & (ki > qi - w)
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
    cfg = HybridConfig.toy(num_layers=4, window=32)
    params = init_hybrid_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def make_engine(cfg, params, **kw):
    defaults = dict(
        max_batch=2,
        max_model_len=128,
        page_tokens=16,
        decode_horizon=4,
        prefill_buckets=(16, 32),
        num_pages=64,
        interpret=True,
    )
    defaults.update(kw)
    return LLMEngine(cfg, EngineConfig(**defaults), params=params)


class TestHybridCorrectness:
    def test_equals_llama_when_windows_exceed_len(self, toy):
        """Structural exactness: a 2-group hybrid whose SW window exceeds
        max_model_len must generate BIT-IDENTICAL tokens to the plain llama
        engine with the same weights — the multi-group machinery (per-group
        managers, G-dim page tables, lax.switch dispatch, shared arena) must
        be invisible when the mask never bites."""
        from kvcached_tpu.models.llama import LlamaConfig

        hcfg = HybridConfig.toy(num_layers=4, window=4096)
        params = init_hybrid_params(hcfg, jax.random.PRNGKey(0))
        lcfg = LlamaConfig(
            vocab_size=hcfg.vocab_size, hidden_size=hcfg.hidden_size,
            num_layers=hcfg.num_layers, num_heads=hcfg.num_heads,
            num_kv_heads=hcfg.num_kv_heads, head_dim=hcfg.head_dim,
            intermediate_size=hcfg.intermediate_size,
        )
        prompts = [[3, 14, 15, 92, 6, 53, 5, 89], [7] * 20]
        sp = SamplingParams(max_new_tokens=12)

        leng = make_engine(lcfg, params, enable_prefix_caching=False)
        try:
            want = [o.output_tokens for o in leng.generate(prompts, sp)]
        finally:
            leng.shutdown()

        eng = make_engine(hcfg, params)
        try:
            assert eng.num_groups == 2
            got = [o.output_tokens for o in eng.generate(prompts, sp)]
        finally:
            eng.shutdown()
        assert got == want

    def test_windowed_logits_match_dense(self, toy):
        """Numerical correctness of the per-layer window masks: prefill and
        decode logits vs a dense per-layer-window reference, with the window
        genuinely biting (T > window)."""
        import jax.numpy as jnp

        from kvcached_tpu.models.hybrid import (
            hybrid_decode_step,
            hybrid_prefill_step,
        )

        cfg, params = toy  # windows (None, 32, None, 32)
        P = 16
        pages = 32
        L_g = cfg.layers_per_group
        KH, D = cfg.num_kv_heads, cfg.head_dim
        k_pools = jnp.zeros((L_g, pages, KH, P, D), jnp.bfloat16)
        v_pools = jnp.zeros_like(k_pools)

        prompt = [((i * 13) % 500) + 1 for i in range(48)]  # 48 > window 32
        plen = len(prompt)
        T = 48
        tokens = np.asarray(prompt, np.int32)
        positions = np.arange(T, dtype=np.int32)
        # group 0 pages 1..3, group 1 pages 4..6 over one shared arena
        chunk_pages = np.array([[1, 2, 3], [4, 5, 6]], np.int32)
        page_table = np.zeros((2, 8), np.int32)
        page_table[0, :3] = [1, 2, 3]
        page_table[1, :3] = [4, 5, 6]

        logits, k_pools, v_pools = hybrid_prefill_step(
            params, cfg, jnp.asarray(tokens), jnp.asarray(positions),
            k_pools, v_pools, jnp.asarray(chunk_pages),
            jnp.asarray(page_table), jnp.asarray(0, jnp.int32),
            jnp.asarray(plen, jnp.int32), interpret=True,
        )

        def dense_last_logits(windows):
            x = params["embed"][jnp.asarray(prompt)]
            pos = jnp.arange(T)
            H = cfg.num_heads
            group = H // KH
            causal = jnp.tril(jnp.ones((T, T), bool))
            for l in range(cfg.num_layers):
                lp = {k: v[l] for k, v in params["layers"].items()}
                w = windows[l]
                mask = causal
                if w is not None:
                    qi = jnp.arange(T)[:, None]
                    ki = jnp.arange(T)[None, :]
                    mask = causal & (ki > qi - w)
                h = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
                q = rope((h @ lp["wq"]).reshape(T, H, D), pos, cfg.rope_theta)
                k = rope((h @ lp["wk"]).reshape(T, KH, D), pos, cfg.rope_theta)
                v = (h @ lp["wv"]).reshape(T, KH, D)
                qg = q.reshape(T, KH, group, D).astype(jnp.float32)
                s = jnp.einsum(
                    "tkgd,skd->ktgs", qg, k.astype(jnp.float32)
                ) / np.sqrt(D)
                s = jnp.where(mask[None, :, None, :], s, -1e30)
                p = jax.nn.softmax(s, axis=-1)
                attn = jnp.einsum("ktgs,skd->tkgd", p, v.astype(jnp.float32))
                x = x + attn.reshape(T, H * D).astype(x.dtype) @ lp["wo"]
                h = rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
                x = x + (
                    jax.nn.silu(h @ lp["w_gate"]) * (h @ lp["w_up"])
                ) @ lp["w_down"]
            x = rms_norm(x, params["final_norm"], cfg.rms_eps)
            return (x[-1] @ params["lm_head"]).astype(jnp.float32)

        want = dense_last_logits(cfg.layer_windows)
        np.testing.assert_allclose(
            np.asarray(logits, np.float32), np.asarray(want, np.float32),
            atol=0.08, rtol=0.05,
        )
        # and the window genuinely bites: the all-full-attention dense model
        # must be measurably DIFFERENT (else the check above is vacuous)
        unwindowed = dense_last_logits([None] * cfg.num_layers)
        assert float(jnp.max(jnp.abs(want - unwindowed))) > 0.5


class TestPerGroupLifetimes:
    def test_sw_group_frees_pages_full_group_keeps(self, toy):
        cfg, params = toy
        eng = make_engine(cfg, params, max_model_len=160)
        try:
            prompt = [7] * 16
            rid = eng.add_request(prompt, SamplingParams(max_new_tokens=100))
            assert rid >= 0
            peak_sw, peak_full = 0, 0
            end_sw = end_full = None
            while eng.has_unfinished():
                eng.step()
                if eng.running:
                    seq = eng.running[0]
                    n_full = sum(b is not None for b in seq.blocks_g[0])
                    n_sw = sum(b is not None for b in seq.blocks_g[1])
                    peak_full = max(peak_full, n_full)
                    peak_sw = max(peak_sw, n_sw)
                    end_full, end_sw = n_full, n_sw
            # window 32, page 16 → SW group live pages stay bounded (~3)
            assert peak_sw <= 4, f"SW group never reclaimed: {peak_sw} pages"
            # full group accumulates: 116 tokens → 8 pages
            assert peak_full >= 7, f"full group should keep pages: {peak_full}"
            assert end_sw < end_full
        finally:
            eng.shutdown()

    def test_groups_share_one_physical_arena(self, toy):
        """Pages are fungible between groups — what SW frees, full can use."""
        cfg, params = toy
        eng = make_engine(cfg, params, num_pages=32)
        try:
            total_phys = eng.pool.capacity - 1  # minus zero page
            a = eng.managers[0].alloc(10)
            b = eng.managers[1].alloc(10)
            assert a is not None and b is not None
            assert eng.pool.avail_physical_pages() <= total_phys - 20 + 20  # sanity
            eng.managers[1].free(b)
            eng.managers[1].trim()
            # group 0 can now take what group 1 released
            c = eng.managers[0].alloc(15)
            assert c is not None
            eng.managers[0].free(a + c)
        finally:
            eng.shutdown()

    def test_per_group_shm_segments(self, toy):
        import uuid

        from kvcached_tpu import shm

        cfg, params = toy
        name = f"kvcached_hyb_{uuid.uuid4().hex[:6]}"
        eng = make_engine(cfg, params, ipc_name=name)
        try:
            info0 = shm.get_kv_cache_info(name)
            info1 = shm.get_kv_cache_info(f"{name}_g1")
            assert info0 is not None and info1 is not None
        finally:
            eng.shutdown()


class TestHybridBatching:
    def test_batched_matches_single(self, toy):
        cfg, params = toy
        prompts = [[1, 2, 3, 4], [10, 20, 30, 40, 50, 60]]
        eng = make_engine(cfg, params)
        try:
            batched = eng.generate(prompts, SamplingParams(max_new_tokens=10))
        finally:
            eng.shutdown()
        for i, p in enumerate(prompts):
            eng1 = make_engine(cfg, params)
            try:
                single = eng1.generate([p], SamplingParams(max_new_tokens=10))
                assert single[0].output_tokens == batched[i].output_tokens
            finally:
                eng1.shutdown()


class TestHybridBatchedPrefill:
    """Batched prefill for hybrid layer groups: N prompts in one dispatch,
    each layer writing through its group's page row with its group's
    static window — token-exact vs serial."""

    def _serve(self, cfg, params, prompts, pb):
        from kvcached_tpu.engine import EngineConfig, LLMEngine, SamplingParams

        eng = LLMEngine(
            cfg,
            EngineConfig(max_batch=4, max_model_len=192, page_tokens=16,
                         decode_horizon=4, prefill_buckets=(16, 32),
                         num_pages=96, interpret=True, kv_dtype="float32",
                         prefill_batch=pb),
            params=params,
        )
        try:
            sp = SamplingParams(max_new_tokens=10)
            return [o.output_tokens for o in eng.generate(prompts, sp)]
        finally:
            eng.shutdown()

    def test_token_exact_vs_serial(self):
        from kvcached_tpu.models.hybrid import HybridConfig, init_hybrid_params

        cfg = HybridConfig.toy(num_layers=4, window=32, dtype="float32")
        params = init_hybrid_params(cfg, jax.random.PRNGKey(0))
        prompts = [[1, 2, 3, 4, 5], list(range(40, 60)), [7] * 3, [9, 9]]
        want = self._serve(cfg, params, prompts, pb=1)
        got = self._serve(cfg, params, prompts, pb=4)
        assert got == want, "hybrid batched prefill diverged"

    def test_on_mesh(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from kvcached_tpu.engine import EngineConfig, LLMEngine, SamplingParams
        from kvcached_tpu.models.hybrid import HybridConfig, init_hybrid_params
        from kvcached_tpu.parallel.mesh import make_mesh

        cfg = HybridConfig.toy(num_layers=4, window=32, dtype="float32")
        params = init_hybrid_params(cfg, jax.random.PRNGKey(0))
        prompts = [[1, 2, 3, 4, 5], [7] * 3, [9, 9], [4, 5, 6]]
        want = self._serve(cfg, params, prompts, pb=1)
        eng = LLMEngine(
            cfg,
            EngineConfig(max_batch=4, max_model_len=192, page_tokens=16,
                         decode_horizon=4, prefill_buckets=(16, 32),
                         num_pages=96, interpret=True, kv_dtype="float32",
                         prefill_batch=4),
            params=params, mesh=make_mesh(tp=2, dp=2),
        )
        try:
            sp = SamplingParams(max_new_tokens=10)
            got = [o.output_tokens for o in eng.generate(prompts, sp)]
        finally:
            eng.shutdown()
        assert got == want, "hybrid batched prefill on mesh diverged"


class TestUnequalGroups:
    """Gemma3-class UNEQUAL layer groups (5:1 local:global): each group
    gets its own arena + pool; accounting, per-group shm limits, and
    elastic reclamation work exactly as with the shared arena."""

    @pytest.fixture(scope="class")
    def ucfg(self):
        cfg = HybridConfig.toy(num_layers=6, window=32)
        import dataclasses

        cfg = dataclasses.replace(
            cfg, layer_windows=(32, 32, None, 32, 32, None))
        # groups: (32 -> 4 layers, None -> 2 layers)
        assert not cfg.equal_groups
        params = init_hybrid_params(cfg, jax.random.PRNGKey(0))
        return cfg, params

    def test_token_exact_vs_dense(self, ucfg):
        cfg, params = ucfg
        prompt = [3, 1, 4, 1, 5, 9, 2, 6]
        want = dense_hybrid_reference(params, cfg, prompt, 48)
        eng = make_engine(cfg, params, max_model_len=96, kv_dtype="float32")
        try:
            assert isinstance(eng.k_pools, tuple) and len(eng.k_pools) == 2
            # per-group arenas have their groups' layer counts
            assert eng.k_pools[0].shape[0] == 4
            assert eng.k_pools[1].shape[0] == 2
            got = eng.generate(
                [prompt], SamplingParams(max_new_tokens=48)
            )[0].output_tokens
        finally:
            eng.shutdown()
        assert got == want, "unequal-group engine diverged from dense"

    def test_spec_and_batched_prefill_token_exact(self, ucfg):
        cfg, params = ucfg
        prompts = [[5, 6, 7, 5, 6, 7, 5, 6], [1, 2, 1, 2, 1, 2],
                   list(range(3, 40))]
        sp = SamplingParams(max_new_tokens=10)

        def run(**kw):
            eng = make_engine(cfg, params, max_model_len=96,
                              kv_dtype="float32", **kw)
            try:
                return [o.output_tokens
                        for o in eng.generate(prompts, sp)], eng
            finally:
                eng.shutdown()

        want, _ = run()
        got_spec, eng = run(spec_decode=True, spec_gamma=2, spec_horizon=2)
        assert got_spec == want, "spec decode diverged under unequal groups"
        got_batch, eng = run(prefill_batch=3)
        assert got_batch == want, "batched prefill diverged under unequal groups"

    def test_per_group_elastic_and_remote_limit(self, ucfg):
        """The sliding group reclaims pages mid-generation while the full
        group keeps every page — now in SEPARATE arenas; a kvctl-style
        limit write on the full group's ``_g1`` shm segment resizes only
        that group's manager."""
        import uuid

        from kvcached_tpu import shm

        cfg, params = ucfg
        name = f"kvcached_uneq_{uuid.uuid4().hex[:6]}"
        eng = make_engine(cfg, params, max_model_len=160, ipc_name=name)
        try:
            # distinct pools, distinct segments
            assert eng.managers[0].page_allocator is not eng.managers[1].page_allocator
            assert shm.get_kv_cache_info(name) is not None
            assert shm.get_kv_cache_info(f"{name}_g1") is not None

            prompt = [7] * 16
            eng.add_request(prompt, SamplingParams(max_new_tokens=100))
            peak_sw = peak_full = 0
            while eng.has_unfinished():
                eng.step()
                if eng.running:
                    seq = eng.running[0]
                    peak_sw = max(peak_sw, sum(
                        b is not None for b in seq.blocks_g[0]))
                    peak_full = max(peak_full, sum(
                        b is not None for b in seq.blocks_g[1]))
            assert peak_sw <= 4, f"SW group never reclaimed: {peak_sw}"
            assert peak_full >= 7, f"full group should keep pages: {peak_full}"

            # operator cuts ONLY the full group's limit (kvctl limit path)
            g1_cfg = eng.managers[1].cfg if hasattr(eng.managers[1], "cfg") else None
            new_limit = 4 * eng.managers[1].page_allocator.page_bytes \
                if hasattr(eng.managers[1].page_allocator, "page_bytes") else 1 << 20
            shm.update_kv_cache_limit(f"{name}_g1", int(new_limit))
            # the next alloc on group 1 applies the resize target
            eng.managers[1].alloc(1)
            assert shm.get_kv_cache_info(f"{name}_g1").total_size == int(new_limit)
            # group 0's limit untouched
            assert shm.get_kv_cache_info(name).total_size != int(new_limit)
        finally:
            eng.shutdown()


class TestUnequalGroupsMesh:
    """Round-5 unblock: per-group arenas (unequal layer groups) compose
    with the device mesh — pools shard per group on the kv-head axis
    (tuple-prefix in_specs), and the dp replica equalizer replays each
    group's per-model-layer K/V rows into its own arena."""

    @pytest.fixture(scope="class")
    def ucfg(self):
        import dataclasses

        cfg = HybridConfig.toy(num_layers=6, window=32, dtype="float32")
        cfg = dataclasses.replace(
            cfg, layer_windows=(32, 32, None, 32, 32, None))
        assert not cfg.equal_groups
        params = init_hybrid_params(cfg, jax.random.PRNGKey(0))
        return cfg, params

    def _run(self, cfg, params, prompts, mesh=None, **over):
        base = dict(max_batch=2, max_model_len=128, page_tokens=32,
                    decode_horizon=4, prefill_buckets=(32,), num_pages=16,
                    interpret=True, enable_prefix_caching=False)
        base.update(over)
        eng = LLMEngine(cfg, EngineConfig(**base), params=params, mesh=mesh)
        try:
            return [o.output_tokens for o in eng.generate(
                prompts, SamplingParams(max_new_tokens=8))]
        finally:
            eng.shutdown()

    def test_tp_and_dp_token_exact(self, ucfg):
        import numpy as np

        from jax.sharding import Mesh

        cfg, params = ucfg
        prompts = [[5, 6, 7, 5, 6, 7, 5, 6], [1, 2, 1, 2, 1, 2]]
        want = self._run(cfg, params, prompts)
        tp2 = Mesh(np.array(jax.devices()[:2]), ("tp",))
        assert self._run(cfg, params, prompts, mesh=tp2) == want
        assert self._run(cfg, params, prompts, mesh=tp2,
                         spec_decode=True, spec_gamma=2,
                         spec_horizon=2) == want
        assert self._run(cfg, params, prompts, mesh=tp2,
                         prefill_batch=2) == want
        dptp = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("dp", "tp"))
        assert self._run(cfg, params, prompts, mesh=dptp) == want, (
            "dp equalizer diverged under per-group arenas"
        )

    def test_int8_on_mesh_matches_single_device(self, ucfg):
        import numpy as np

        from jax.sharding import Mesh

        cfg, params = ucfg
        prompts = [[5, 6, 7, 5, 6, 7, 5, 6], [1, 2, 1, 2, 1, 2]]
        w8 = self._run(cfg, params, prompts, kv_dtype="int8", kv_scale=0.05)
        tp2 = Mesh(np.array(jax.devices()[:2]), ("tp",))
        g8 = self._run(cfg, params, prompts, mesh=tp2,
                       kv_dtype="int8", kv_scale=0.05)
        assert g8 == w8, "int8 quantization diverged across tp sharding"


class TestUnequalGroupsColocation:
    """Two same-geometry unequal-group engines (e.g. two Gemma3
    instances) colocate over SHARED per-group pools — the serverless
    headline extended to per-group arenas.  Pages stay fungible within
    each group across engines; geometry mismatches are loud errors."""

    def test_shared_per_group_pools(self):
        import dataclasses

        cfg = HybridConfig.toy(num_layers=6, window=32, dtype="float32")
        cfg = dataclasses.replace(
            cfg, layer_windows=(32, 32, None, 32, 32, None))
        pa = init_hybrid_params(cfg, jax.random.PRNGKey(0))
        pb = init_hybrid_params(cfg, jax.random.PRNGKey(1))
        base = dict(max_batch=2, max_model_len=128, page_tokens=8,
                    num_pages=24, interpret=True, prefill_buckets=(16,),
                    enable_prefix_caching=False)
        a = LLMEngine(cfg, EngineConfig(**base), params=pa)
        b = LLMEngine(cfg, EngineConfig(**base), params=pb,
                      shared_pool=a.pools, pool_arrays=a.arrays)
        ra = LLMEngine(cfg, EngineConfig(**base), params=pa)
        rb = LLMEngine(cfg, EngineConfig(**base), params=pb)
        try:
            assert b._group_pools[0] is a._group_pools[0]
            # B borrowing group-0 pages is visible to A (shared arena)
            pre = a.managers[0].available_size()
            h = b.managers[0].alloc(pre - 2)
            assert a.managers[0].available_size() < 4
            b.managers[0].free(h)

            # INTERLEAVED serving: both engines hold live sequences in
            # the same pools at once; outputs must match solo runs
            # (no page collisions between engines or groups)
            prompt = [1, 2, 3, 4, 5]
            sp = SamplingParams(max_new_tokens=8)
            a.add_request(prompt, sp)
            b.add_request(prompt, sp)
            while a.has_unfinished() or b.has_unfinished():
                if a.has_unfinished():
                    a.step()
                if b.has_unfinished():
                    b.step()
            oa = a.finished_outputs[0].output_tokens
            ob = b.finished_outputs[0].output_tokens
            wa = ra.generate([prompt], sp)[0].output_tokens
            wb = rb.generate([prompt], sp)[0].output_tokens
            assert oa == wa, "engine A diverged under colocation"
            assert ob == wb, "engine B diverged under colocation"

            # geometry mismatch is a loud error, not silent corruption
            import pytest as _pytest

            cfg2 = dataclasses.replace(cfg, num_kv_heads=4, num_heads=8)
            with _pytest.raises(ValueError, match="geometry mismatch"):
                LLMEngine(cfg2, EngineConfig(**base),
                          params=init_hybrid_params(
                              cfg2, jax.random.PRNGKey(2)),
                          shared_pool=a.pools, pool_arrays=a.arrays)
        finally:
            for e in (a, b, ra, rb):
                e.shutdown()
