"""Pipeline-parallel stage execution tests: per-stage pools must be
invisible to outputs (token-exact vs the plain engine) while giving each
stage independent accounting and operator control."""

import uuid

import jax
import pytest

from kvcached_tpu.engine import EngineConfig, LLMEngine, SamplingParams
from kvcached_tpu.models.llama import LlamaConfig, init_llama_params
from kvcached_tpu.parallel.pp import PPLlamaAdapter


@pytest.fixture(scope="module")
def toy():
    cfg = LlamaConfig.toy(num_layers=4)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


ECFG = dict(
    max_batch=2, max_model_len=128, page_tokens=16, decode_horizon=2,
    prefill_buckets=(16, 32), num_pages=64, interpret=True,
)


class TestPPExactness:
    def test_two_stage_matches_single_engine(self, toy):
        cfg, params = toy
        prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
        sp = SamplingParams(max_new_tokens=10)

        plain = LLMEngine(cfg, EngineConfig(**ECFG), params=params)
        try:
            want = [o.output_tokens for o in plain.generate(prompts, sp)]
        finally:
            plain.shutdown()

        pp = LLMEngine(
            PPLlamaAdapter(cfg, num_stages=2),
            EngineConfig(**ECFG), params=params,
        )
        try:
            assert pp.num_groups == 2  # stages are layer groups
            got = [o.output_tokens for o in pp.generate(prompts, sp)]
        finally:
            pp.shutdown()
        assert got == want

    def test_stage_count_validation(self, toy):
        cfg, _ = toy
        with pytest.raises(ValueError, match="divisible"):
            PPLlamaAdapter(cfg, num_stages=3)


class TestPerStageControl:
    def test_per_stage_managers_and_shm(self, toy):
        from kvcached_tpu import shm

        cfg, params = toy
        name = f"kvcached_pp_{uuid.uuid4().hex[:6]}"
        eng = LLMEngine(
            PPLlamaAdapter(cfg, num_stages=2),
            EngineConfig(ipc_name=name, **ECFG), params=params,
        )
        try:
            eng.generate([[1, 2, 3, 4]], SamplingParams(max_new_tokens=8))
            # both stages allocated pages and publish usage independently
            assert shm.get_kv_cache_info(name) is not None
            assert shm.get_kv_cache_info(f"{name}_g1") is not None
            u0 = eng.managers[0].page_allocator.num_in_use
            u1 = eng.managers[1].page_allocator.num_in_use
            assert u0 >= 1 and u1 >= 1
        finally:
            eng.shutdown()

    def test_stage_limit_cut_applies_to_that_stage(self, toy):
        """kvctl limiting stage 1's segment shrinks stage 1 only — the
        reference's per-stage elasticity."""
        import time

        from kvcached_tpu import shm

        cfg, params = toy
        name = f"kvcached_pp_{uuid.uuid4().hex[:6]}"
        eng = LLMEngine(
            PPLlamaAdapter(cfg, num_stages=2),
            EngineConfig(ipc_name=name, **ECFG), params=params,
        )
        try:
            pb = eng.kv_cfg.page_bytes
            shm.update_kv_cache_limit(f"{name}_g1", 4 * pb)
            deadline = time.time() + 5
            while time.time() < deadline:
                eng.managers[1].alloc(0)
                if eng.managers[1].page_allocator.limit_pages <= 4:
                    break
                time.sleep(0.05)
            assert eng.managers[1].page_allocator.limit_pages <= 4
            assert eng.managers[0].page_allocator.limit_pages > 4
            # serving still works under the stage limit
            out = eng.generate([[5, 6, 7]], SamplingParams(max_new_tokens=6))
            assert len(out[0].output_tokens) == 6
        finally:
            eng.shutdown()


class TestPPPlacement:
    """Stage PLACEMENT on disjoint devices of a 'pp' mesh
    (parallel/pp_mesh.py): each stage's weights and KV pool live only in
    that stage's device memory, activations ppermute stage→stage, decode
    microbatches on a pipeline schedule.  Token-exact vs the plain engine
    — PP's actual purpose (models bigger than one device), the reference's
    engines running PP across GPUs (vllm/patches.py:654-664,978-1005)."""

    def _mesh(self, S):
        import numpy as np
        from jax.sharding import Mesh

        if len(jax.devices()) < S:
            pytest.skip(f"needs {S} virtual devices")
        return Mesh(np.array(jax.devices()[:S]), ("pp",))

    def _serve(self, cfg, params, prompts, sp, *, stages=None, **over):
        ecfg = dict(
            max_batch=4, max_model_len=96, page_tokens=16, decode_horizon=4,
            prefill_buckets=(16, 32), num_pages=32, interpret=True,
            kv_dtype="float32",
        )
        ecfg.update(over)
        if stages is None:
            eng = LLMEngine(cfg, EngineConfig(**ecfg), params=params)
        else:
            eng = LLMEngine(
                PPLlamaAdapter(cfg, num_stages=stages),
                EngineConfig(**ecfg), params=params,
                mesh=self._mesh(stages),
            )
        try:
            outs = eng.generate(prompts, sp)
            return [o.output_tokens for o in outs], eng
        finally:
            eng.shutdown()

    def test_two_stage_placed_token_exact(self):
        cfg = LlamaConfig.toy(num_layers=4, dtype="float32")
        params = init_llama_params(cfg, jax.random.PRNGKey(0))
        prompts = [[1, 2, 3, 4, 5], list(range(7, 27)), [9, 9, 9], [4, 5]]
        sp = SamplingParams(max_new_tokens=8)
        want, _ = self._serve(cfg, params, prompts, sp)
        got, eng = self._serve(cfg, params, prompts, sp, stages=2)
        assert got == want, "placed 2-stage PP diverged"

    def test_four_stage_with_chunked_prefill(self):
        cfg = LlamaConfig.toy(num_layers=4, dtype="float32")
        params = init_llama_params(cfg, jax.random.PRNGKey(0))
        long_prompt = [((3 * j) % 120) + 1 for j in range(48)]  # > bucket 32
        prompts = [long_prompt, [1, 2, 3], [7] * 5, [2, 4, 6, 8]]
        sp = SamplingParams(max_new_tokens=6)
        want, _ = self._serve(cfg, params, prompts, sp)
        got, _ = self._serve(cfg, params, prompts, sp, stages=4)
        assert got == want, "4-stage PP with chunked prefill diverged"

    def test_stage_pools_actually_placed(self):
        """Each stage's pool shard must live on that stage's device, and
        the per-stage accounting pools must be independent objects with
        their own shm segments (kvctl can limit each stage)."""
        import numpy as np

        cfg = LlamaConfig.toy(num_layers=4, dtype="float32")
        params = init_llama_params(cfg, jax.random.PRNGKey(0))
        mesh = self._mesh(2)
        ipc = f"pp{uuid.uuid4().hex[:6]}"
        eng = LLMEngine(
            PPLlamaAdapter(cfg, num_stages=2),
            EngineConfig(max_batch=2, max_model_len=96, page_tokens=16,
                         decode_horizon=2, prefill_buckets=(16, 32),
                         num_pages=32, interpret=True, kv_dtype="float32",
                         ipc_name=ipc),
            params=params, mesh=mesh,
        )
        try:
            eng.generate([[1, 2, 3, 4]], SamplingParams(max_new_tokens=4))
            shards = sorted(
                eng.k_pools.addressable_shards, key=lambda s: s.index[0].start
            )
            assert len(shards) == 2
            devs = [s.device for s in shards]
            assert devs[0] != devs[1], "stages share a device"
            assert devs == list(mesh.devices.flat), (
                "stage order does not follow the pp mesh axis"
            )
            # independent accounting: different allocator objects, and the
            # stages' shm segments are distinct (group suffix)
            a0 = eng.managers[0].page_allocator
            a1 = eng.managers[1].page_allocator
            assert a0 is not a1
            from kvcached_tpu import shm as shm_mod

            i0 = shm_mod.get_kv_cache_info(ipc)
            i1 = shm_mod.get_kv_cache_info(f"{ipc}_g1")
            assert i0 is not None and i1 is not None
        finally:
            eng.shutdown()

    def test_stage_limit_cut_still_independent(self):
        """kvctl-style limit cut on stage 1's segment only: stage 0's
        target unchanged — the reference's per-stage elasticity."""
        from kvcached_tpu import shm as shm_mod

        cfg = LlamaConfig.toy(num_layers=4, dtype="float32")
        params = init_llama_params(cfg, jax.random.PRNGKey(0))
        ipc = f"pp{uuid.uuid4().hex[:6]}"
        eng = LLMEngine(
            PPLlamaAdapter(cfg, num_stages=2),
            EngineConfig(max_batch=2, max_model_len=96, page_tokens=16,
                         decode_horizon=2, prefill_buckets=(16, 32),
                         num_pages=32, interpret=True, kv_dtype="float32",
                         ipc_name=ipc),
            params=params, mesh=self._mesh(2),
        )
        try:
            import time

            page_bytes = eng.kv_cfg.page_bytes
            shm_mod.update_kv_cache_limit(f"{ipc}_g1", 8 * page_bytes)
            deadline = time.time() + 5
            while time.time() < deadline:
                eng.managers[1].alloc(0)  # pick up the resize target
                if eng.managers[1].page_allocator.limit_pages <= 8:
                    break
                time.sleep(0.05)
            assert eng.managers[1].page_allocator.limit_pages <= 8
            assert eng.managers[0].page_allocator.limit_pages > 8
            # serving still works under the stage limit
            out = eng.generate([[5, 6, 7]], SamplingParams(max_new_tokens=6))
            assert len(out[0].output_tokens) == 6
        finally:
            eng.shutdown()

    def test_microbatch_one_matches(self):
        """pp_microbatches=1 (no overlap) must also be exact."""
        cfg = LlamaConfig.toy(num_layers=4, dtype="float32")
        params = init_llama_params(cfg, jax.random.PRNGKey(0))
        prompts = [[1, 2, 3], [4, 5], [6] * 4, [7, 8, 9]]
        sp = SamplingParams(max_new_tokens=6)
        want, _ = self._serve(cfg, params, prompts, sp)
        got, _ = self._serve(cfg, params, prompts, sp, stages=2,
                             pp_microbatches=1)
        assert got == want

    def test_microbatch_four_matches(self):
        cfg = LlamaConfig.toy(num_layers=4, dtype="float32")
        params = init_llama_params(cfg, jax.random.PRNGKey(0))
        prompts = [[1, 2, 3], [4, 5], [6] * 4, [7, 8, 9]]
        sp = SamplingParams(max_new_tokens=6)
        want, _ = self._serve(cfg, params, prompts, sp)
        got, _ = self._serve(cfg, params, prompts, sp, stages=2,
                             pp_microbatches=4)
        assert got == want


class TestPPFeatureMatrix:
    """Round-3 known limits closed: int8 KV, speculative decoding, and
    batched prefill now run under pp (colocated layer-group mode AND
    placed stages) — the reference's quantized pools, spec-decode flows,
    and batched prefills don't carve PP out
    (vllm/patches.py:654-664, sglang/patches.py:714-956)."""

    def _pp_mesh(self, S):
        import numpy as np
        from jax.sharding import Mesh

        if len(jax.devices()) < S:
            pytest.skip(f"needs {S} virtual devices")
        return Mesh(np.array(jax.devices()[:S]), ("pp",))

    def _run(self, cfg, params, prompts, sp, *, stages=None, placed=False,
             **over):
        ecfg = dict(
            max_batch=4, max_model_len=96, page_tokens=16, decode_horizon=4,
            prefill_buckets=(16, 32), num_pages=32, interpret=True,
        )
        ecfg.update(over)
        if stages is None:
            eng = LLMEngine(cfg, EngineConfig(**ecfg), params=params)
        else:
            eng = LLMEngine(
                PPLlamaAdapter(cfg, num_stages=stages),
                EngineConfig(**ecfg), params=params,
                mesh=self._pp_mesh(stages) if placed else None,
            )
        try:
            outs = eng.generate(prompts, sp)
            return [o.output_tokens for o in outs], eng
        finally:
            eng.shutdown()

    @pytest.fixture(scope="class")
    def f32(self):
        cfg = LlamaConfig.toy(num_layers=4, dtype="float32")
        params = init_llama_params(cfg, jax.random.PRNGKey(0))
        return cfg, params

    def test_int8_colocated(self, f32):
        """int8 pools under colocated pp: stages share one arena, scales
        keyed by arena layer — token-exact vs the plain int8 engine."""
        cfg, params = f32
        prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [4, 4, 4, 4]]
        sp = SamplingParams(max_new_tokens=8)
        i8 = dict(kv_dtype="int8", page_tokens=32, prefill_buckets=(32,))
        want, _ = self._run(cfg, params, prompts, sp, **i8)
        got, eng = self._run(cfg, params, prompts, sp, stages=2, **i8)
        assert got == want, "colocated pp int8 diverged from plain int8"

    def test_int8_placed(self, f32):
        """int8 pools under PLACED stages: stage-stacked [S, Lp, KH]
        scales, each stage dequantizing its own layers."""
        cfg, params = f32
        prompts = [[1, 2, 3, 4, 5], list(range(7, 27)), [9, 9, 9], [4, 5]]
        sp = SamplingParams(max_new_tokens=8)
        i8 = dict(kv_dtype="int8", page_tokens=32, prefill_buckets=(32,))
        want, _ = self._run(cfg, params, prompts, sp, **i8)
        got, _ = self._run(cfg, params, prompts, sp, stages=2, placed=True,
                           **i8)
        assert got == want, "placed pp int8 diverged from plain int8"

    def test_int8_placed_custom_scales(self, f32):
        """set_kv_scales under pp placement: a flat [L, KH] install is
        stage-stacked and must match the plain engine given the same
        per-layer scales."""
        import numpy as np

        cfg, params = f32
        L, KH = cfg.num_layers, cfg.num_kv_heads
        ks = (0.02 + 0.01 * np.arange(L * KH, dtype=np.float32)
              ).reshape(L, KH)
        vs = ks * 1.5
        prompts = [[1, 2, 3, 4, 5], [9, 9, 9]]
        sp = SamplingParams(max_new_tokens=6)

        ecfg = dict(max_batch=2, max_model_len=96, page_tokens=32,
                    decode_horizon=4, prefill_buckets=(32,), num_pages=32,
                    interpret=True, kv_dtype="int8")
        plain = LLMEngine(cfg, EngineConfig(**ecfg), params=params)
        try:
            plain.set_kv_scales(ks, vs)
            want = [o.output_tokens for o in plain.generate(prompts, sp)]
        finally:
            plain.shutdown()
        eng = LLMEngine(
            PPLlamaAdapter(cfg, num_stages=2), EngineConfig(**ecfg),
            params=params, mesh=self._pp_mesh(2),
        )
        try:
            eng.set_kv_scales(ks, vs)  # flat [L, KH] -> [S, Lp, KH]
            assert eng.quant_scales[0].shape == (2, L // 2, KH)
            got = [o.output_tokens for o in eng.generate(prompts, sp)]
        finally:
            eng.shutdown()
        assert got == want, "placed pp custom int8 scales diverged"

    def test_int8_colocated_per_model_scales(self, f32):
        """Round-5 fix: COLOCATED pp accepts per-MODEL-layer scales
        [L, KH] (true per-stage calibration despite the shared arena) —
        token-exact vs the plain engine given the same per-layer scales,
        and vs the PLACED pp engine's stage-stacked install."""
        import numpy as np

        cfg, params = f32
        L, KH = cfg.num_layers, cfg.num_kv_heads
        # scales that DIFFER across stages, so arena-layer sharing would
        # produce different tokens (liveness of the per-stage resolution)
        ks = (0.02 + 0.01 * np.arange(L * KH, dtype=np.float32)
              ).reshape(L, KH)
        vs = ks * 1.5
        prompts = [[1, 2, 3, 4, 5], [9, 9, 9]]
        sp = SamplingParams(max_new_tokens=6)
        ecfg = dict(max_batch=2, max_model_len=96, page_tokens=32,
                    decode_horizon=4, prefill_buckets=(32,), num_pages=32,
                    interpret=True, kv_dtype="int8")

        plain = LLMEngine(cfg, EngineConfig(**ecfg), params=params)
        try:
            plain.set_kv_scales(ks, vs)
            want = [o.output_tokens for o in plain.generate(prompts, sp)]
        finally:
            plain.shutdown()

        # colocated pp (stages as layer groups, ONE shared arena)
        eng = LLMEngine(
            PPLlamaAdapter(cfg, num_stages=2), EngineConfig(**ecfg),
            params=params,
        )
        try:
            eng.set_kv_scales(ks, vs)  # [L, KH]: per MODEL layer
            assert eng.quant_scales[0].shape == (L, KH)
            got = [o.output_tokens for o in eng.generate(prompts, sp)]
            pool_per_model = np.asarray(eng.k_pools)
        finally:
            eng.shutdown()
        assert got == want, "colocated pp per-model int8 scales diverged"

        # liveness: collapsing to stage-0's rows (the old shared-arena
        # contract) must change the QUANTIZED pool bytes — stage-1 layers
        # now quantize on stage-0's grid — or the per-layer rows never
        # reached the quantizer.  (Greedy tokens can survive the small
        # perturbation; the pool bytes cannot.)
        eng = LLMEngine(
            PPLlamaAdapter(cfg, num_stages=2), EngineConfig(**ecfg),
            params=params,
        )
        try:
            eng.set_kv_scales(ks[: L // 2], vs[: L // 2])  # arena-keyed
            [o.output_tokens for o in eng.generate(prompts, sp)]
            pool_collapsed = np.asarray(eng.k_pools)
        finally:
            eng.shutdown()
        assert not np.array_equal(pool_per_model, pool_collapsed), (
            "per-stage scales made no difference to the quantized pool — "
            "scale rows unused?"
        )

    def test_spec_decode_colocated(self, f32):
        """Greedy speculative decoding under colocated pp is token-exact
        vs plain decode by construction."""
        cfg, params = f32
        # repetitive prompts so prompt-lookup drafting actually fires
        prompts = [[5, 6, 7, 5, 6, 7, 5, 6], [1, 2, 1, 2, 1, 2]]
        sp = SamplingParams(max_new_tokens=10)
        want, _ = self._run(cfg, params, prompts, sp)
        got, _ = self._run(cfg, params, prompts, sp, stages=2,
                           spec_decode=True, spec_gamma=2, spec_horizon=2)
        assert got == want, "colocated pp spec decode diverged"

    def test_spec_decode_placed(self, f32):
        """Greedy spec decode through the PLACED verify pipeline."""
        cfg, params = f32
        prompts = [[5, 6, 7, 5, 6, 7, 5, 6], [1, 2, 1, 2, 1, 2],
                   [3, 3, 3, 3], [8, 9]]
        sp = SamplingParams(max_new_tokens=10)
        want, _ = self._run(cfg, params, prompts, sp)
        got, eng = self._run(cfg, params, prompts, sp, stages=2, placed=True,
                             spec_decode=True, spec_gamma=2, spec_horizon=2)
        assert got == want, "placed pp spec decode diverged"

    def test_spec_decode_placed_int8(self, f32):
        """spec decode + int8 pools + placed stages compose."""
        cfg, params = f32
        prompts = [[5, 6, 7, 5, 6, 7, 5, 6], [1, 2, 1, 2, 1, 2]]
        sp = SamplingParams(max_new_tokens=8)
        i8 = dict(kv_dtype="int8", page_tokens=32, prefill_buckets=(32,))
        want, _ = self._run(cfg, params, prompts, sp, **i8)
        got, _ = self._run(cfg, params, prompts, sp, stages=2, placed=True,
                           spec_decode=True, spec_gamma=2,
                           spec_horizon=2, **i8)
        assert got == want, "placed pp spec+int8 diverged"

    def test_batched_prefill_colocated(self, f32):
        cfg, params = f32
        prompts = [[1, 2, 3], [4, 5, 6, 7], [9, 9], [3, 1, 4, 1, 5]]
        sp = SamplingParams(max_new_tokens=6)
        want, _ = self._run(cfg, params, prompts, sp)
        got, eng = self._run(cfg, params, prompts, sp, stages=2,
                             prefill_batch=4)
        assert got == want, "colocated pp batched prefill diverged"
        assert eng._pb_dispatches >= 1, "batch path never taken"
        assert eng._pb_prompts >= 4

    def test_batched_prefill_placed(self, f32):
        cfg, params = f32
        prompts = [[1, 2, 3], [4, 5, 6, 7], [9, 9], [3, 1, 4, 1, 5]]
        sp = SamplingParams(max_new_tokens=6)
        want, _ = self._run(cfg, params, prompts, sp)
        got, eng = self._run(cfg, params, prompts, sp, stages=2, placed=True,
                             prefill_batch=4)
        assert got == want, "placed pp batched prefill diverged"
        assert eng._pb_dispatches >= 1, "batch path never taken"

    def test_batched_prefill_placed_multitile(self, f32):
        """Batched prefill whose bucket spans several page-aligned
        microtiles (the pipelined-tile path with N rows per tile)."""
        cfg, params = f32
        prompts = [[(3 * j) % 50 + 1 for j in range(28)],
                   [7, 8, 9], [1] * 20, [2, 4]]
        sp = SamplingParams(max_new_tokens=6)
        want, _ = self._run(cfg, params, prompts, sp,
                            prefill_buckets=(32,))
        got, eng = self._run(cfg, params, prompts, sp, stages=2, placed=True,
                             prefill_batch=4, prefill_buckets=(32,),
                             pp_microbatches=2)
        assert got == want, "placed pp multi-tile batched prefill diverged"


class TestPPCombined1F1B:
    """1F1B prefill/decode overlap under pp placement: a chunked prefill
    in flight alongside running sequences dispatches ONE combined
    pipeline (prefill tiles + decode microbatches share the schedule)
    instead of alternating chunk/decode dispatches — token-exact, and
    decode no longer idles during a long prompt's prefill."""

    def _mesh(self, S):
        import numpy as np
        from jax.sharding import Mesh

        if len(jax.devices()) < S:
            pytest.skip(f"needs {S} virtual devices")
        return Mesh(np.array(jax.devices()[:S]), ("pp",))

    def _workload(self):
        # short prompts first (running by the time the long one arrives),
        # then a chunked long prompt (> largest bucket 32)
        long_prompt = [((3 * j) % 120) + 1 for j in range(48)]
        prompts = [[1, 2, 3], [7] * 5, long_prompt, [2, 4, 6, 8]]
        return prompts, SamplingParams(max_new_tokens=10)

    def _serve(self, cfg, params, *, stages=None, mesh=None, **over):
        prompts, sp = self._workload()
        ecfg = dict(max_batch=4, max_model_len=96, page_tokens=16,
                    decode_horizon=4, prefill_buckets=(16, 32), num_pages=32,
                    interpret=True, kv_dtype="float32")
        ecfg.update(over)
        if stages is None:
            eng = LLMEngine(cfg, EngineConfig(**ecfg), params=params)
        else:
            eng = LLMEngine(PPLlamaAdapter(cfg, num_stages=stages),
                            EngineConfig(**ecfg), params=params,
                            mesh=mesh if mesh is not None
                            else self._mesh(stages))
        try:
            # stagger arrivals: shorts first so they are RUNNING when the
            # long prompt starts chunking (the overlap scenario)
            rids = []
            sps = [sp] * len(prompts)
            for p, s in zip(prompts[:2], sps):
                rids.append(eng.add_request(p, s))
            for _ in range(3):
                eng.step()
            for p, s in zip(prompts[2:], sps):
                rids.append(eng.add_request(p, s))
            while eng.has_unfinished():
                eng.step()
            idx = {r: i for i, r in enumerate(rids)}
            outs = {idx[o.req_id]: o.output_tokens
                    for o in eng.finished_outputs}
            return outs, eng
        finally:
            eng.shutdown()

    def test_combined_token_exact_and_taken(self):
        cfg = LlamaConfig.toy(num_layers=4, dtype="float32")
        params = init_llama_params(cfg, jax.random.PRNGKey(0))
        want, _ = self._serve(cfg, params)
        got, eng = self._serve(cfg, params, stages=2)
        assert got == want, "pp combined 1F1B dispatch diverged"
        assert eng._combined_dispatches >= 1, (
            "combined path never taken — the overlap scenario did not fire"
        )

    def test_combined_int8(self):
        cfg = LlamaConfig.toy(num_layers=4, dtype="float32")
        params = init_llama_params(cfg, jax.random.PRNGKey(0))
        i8 = dict(kv_dtype="int8", page_tokens=32, prefill_buckets=(32,),
                  max_model_len=128, num_pages=32)
        want, _ = self._serve(cfg, params, **i8)
        got, eng = self._serve(cfg, params, stages=2, **i8)
        assert got == want, "pp combined int8 diverged"

    def test_combined_microbatch_one(self):
        cfg = LlamaConfig.toy(num_layers=4, dtype="float32")
        params = init_llama_params(cfg, jax.random.PRNGKey(0))
        want, _ = self._serve(cfg, params)
        got, _ = self._serve(cfg, params, stages=2, pp_microbatches=1)
        assert got == want

    def test_combined_under_dp(self):
        """dp×pp: the combined 1F1B dispatch shards its decode batch over
        dp with the replay equalizer hoisted to the dispatch boundary
        (was a fallback to alternating chunk/decode before round 5) —
        token-exact vs single-device AND actually taken."""
        import numpy as np
        from jax.sharding import Mesh

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        cfg = LlamaConfig.toy(num_layers=4, dtype="float32")
        params = init_llama_params(cfg, jax.random.PRNGKey(0))
        want, _ = self._serve(cfg, params)
        mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("dp", "pp"))
        got, eng = self._serve(cfg, params, stages=2, mesh=mesh)
        assert got == want, "dp×pp combined 1F1B dispatch diverged"
        assert eng._combined_dispatches >= 1, (
            "combined path never taken under dp — the gate is back"
        )


class TestDPxPP:
    """dp×pp composition: the decode batch shards over dp, each dp replica
    running the full placed-stage pipeline over its rows; stage-pool
    replicas are re-equalized every dispatch so a row migrating between
    dp shards (a neighbour finishing) still reads its KV."""

    def _run(self, cfg, params, prompts, sp, *, mesh=None, stages=2, **over):
        ecfg = dict(
            max_batch=4, max_model_len=96, page_tokens=16, decode_horizon=4,
            prefill_buckets=(16, 32), num_pages=32, interpret=True,
            kv_dtype="float32",
        )
        ecfg.update(over)
        if mesh is None:
            eng = LLMEngine(cfg, EngineConfig(**ecfg), params=params)
        else:
            eng = LLMEngine(
                PPLlamaAdapter(cfg, num_stages=stages),
                EngineConfig(**ecfg), params=params, mesh=mesh,
            )
        try:
            outs = eng.generate(prompts, sp)
            return [o.output_tokens for o in outs], eng
        finally:
            eng.shutdown()

    def test_dp2_pp2_token_exact(self):
        import numpy as np
        from jax.sharding import Mesh

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        cfg = LlamaConfig.toy(num_layers=4, dtype="float32")
        params = init_llama_params(cfg, jax.random.PRNGKey(0))
        # staggered lengths force a finish + row migration mid-serve
        prompts = [[1, 2, 3, 4, 5], list(range(7, 27)), [9, 9, 9], [4, 5]]
        sps = SamplingParams(max_new_tokens=8)
        want, _ = self._run(cfg, params, prompts, sps)
        mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("dp", "pp"))
        got, _ = self._run(cfg, params, prompts, sps, mesh=mesh)
        assert got == want, "dp2×pp2 engine diverged"

    def test_dp2_pp2_tp2_token_exact(self):
        import numpy as np
        from jax.sharding import Mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        cfg = LlamaConfig.toy(num_layers=4, num_heads=4, num_kv_heads=2,
                              vocab_size=512, dtype="float32")
        params = init_llama_params(cfg, jax.random.PRNGKey(0))
        prompts = [[1, 2, 3, 4, 5], [9, 9, 9], [4, 5], [6] * 7]
        sps = SamplingParams(max_new_tokens=6)
        want, _ = self._run(cfg, params, prompts, sps)
        mesh = Mesh(
            np.array(jax.devices()[:8]).reshape(2, 2, 2), ("dp", "pp", "tp")
        )
        got, eng = self._run(cfg, params, prompts, sps, mesh=mesh)
        assert got == want, "dp2×pp2×tp2 engine diverged"

    def test_dp2_pp2_spec_decode(self):
        import numpy as np
        from jax.sharding import Mesh

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        cfg = LlamaConfig.toy(num_layers=4, dtype="float32")
        params = init_llama_params(cfg, jax.random.PRNGKey(0))
        prompts = [[5, 6, 7, 5, 6, 7, 5, 6], [1, 2, 1, 2, 1, 2],
                   [3, 3, 3, 3], [8, 9]]
        sps = SamplingParams(max_new_tokens=10)
        want, _ = self._run(cfg, params, prompts, sps)
        mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("dp", "pp"))
        got, _ = self._run(cfg, params, prompts, sps, mesh=mesh,
                           spec_decode=True, spec_gamma=2, spec_horizon=2)
        assert got == want, "dp×pp spec decode diverged"

    def test_dp2_pp2_batched_prefill(self):
        import numpy as np
        from jax.sharding import Mesh

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        cfg = LlamaConfig.toy(num_layers=4, dtype="float32")
        params = init_llama_params(cfg, jax.random.PRNGKey(0))
        prompts = [[1, 2, 3], [4, 5, 6, 7], [9, 9], [3, 1, 4, 1, 5]]
        sps = SamplingParams(max_new_tokens=6)
        want, _ = self._run(cfg, params, prompts, sps)
        mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("dp", "pp"))
        got, eng = self._run(cfg, params, prompts, sps, mesh=mesh,
                             prefill_batch=4)
        assert got == want, "dp×pp batched prefill diverged"
        assert eng._pb_dispatches >= 1


class TestColocatedPPOnTPMesh:
    """Colocated pp adapter (stages as layer groups over ONE shared
    arena) composed with a dp×tp mesh — the engine's generic mesh branch
    reads the stage maps from the ADAPTER (PPLlamaAdapter.group_index /
    layer_in_group), so dp replica equalization works for staged
    layer groups too."""

    def test_colocated_pp_dp2_tp2_token_exact(self):
        from kvcached_tpu.parallel.mesh import make_mesh

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        cfg = LlamaConfig.toy(num_layers=4, num_heads=4, num_kv_heads=2,
                              vocab_size=512, dtype="float32")
        params = init_llama_params(cfg, jax.random.PRNGKey(0))
        ecfg = dict(max_batch=4, max_model_len=96, page_tokens=16,
                    decode_horizon=4, prefill_buckets=(16, 32), num_pages=32,
                    interpret=True, kv_dtype="float32")
        prompts = [[1, 2, 3, 4, 5], list(range(7, 27)), [9, 9, 9], [4, 5]]
        sp = SamplingParams(max_new_tokens=8)
        single = LLMEngine(cfg, EngineConfig(**ecfg), params=params)
        try:
            want = [o.output_tokens for o in single.generate(prompts, sp)]
        finally:
            single.shutdown()
        eng = LLMEngine(
            PPLlamaAdapter(cfg, num_stages=2), EngineConfig(**ecfg),
            params=params, mesh=make_mesh(tp=2, dp=2),
        )
        try:
            got = [o.output_tokens for o in eng.generate(prompts, sp)]
            assert eng.num_groups == 2  # stages as layer groups
        finally:
            eng.shutdown()
        assert got == want, "colocated pp on a dp×tp mesh diverged"


class TestPPxTP:
    """pp×tp composition: stages on the pp axis, heads/pools sharded over
    each stage's tp group (Megatron within the stage), token-exact."""

    def test_pp2_tp2_token_exact(self):
        import numpy as np
        from jax.sharding import Mesh

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        cfg = LlamaConfig.toy(num_layers=4, num_heads=4, num_kv_heads=2,
                              vocab_size=512, dtype="float32")
        params = init_llama_params(cfg, jax.random.PRNGKey(0))
        ecfg = dict(max_batch=4, max_model_len=96, page_tokens=16,
                    decode_horizon=4, prefill_buckets=(16, 32), num_pages=32,
                    interpret=True, kv_dtype="float32")
        prompts = [[1, 2, 3, 4, 5], list(range(7, 27)), [9, 9, 9], [4, 5]]
        sp = SamplingParams(max_new_tokens=8)
        single = LLMEngine(cfg, EngineConfig(**ecfg), params=params)
        try:
            want = [o.output_tokens for o in single.generate(prompts, sp)]
        finally:
            single.shutdown()
        mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("pp", "tp"))
        eng = LLMEngine(PPLlamaAdapter(cfg, num_stages=2),
                        EngineConfig(**ecfg), params=params, mesh=mesh)
        try:
            got = [o.output_tokens for o in eng.generate(prompts, sp)]
            assert tuple(eng.k_pools.sharding.spec) == (
                "pp", None, None, "tp")
        finally:
            eng.shutdown()
        assert got == want, "pp×tp engine diverged"

    def test_pp4_tp2_token_exact(self):
        import numpy as np
        from jax.sharding import Mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        cfg = LlamaConfig.toy(num_layers=4, num_heads=4, num_kv_heads=2,
                              vocab_size=512, dtype="float32")
        params = init_llama_params(cfg, jax.random.PRNGKey(0))
        ecfg = dict(max_batch=2, max_model_len=96, page_tokens=16,
                    decode_horizon=4, prefill_buckets=(16, 32), num_pages=32,
                    interpret=True, kv_dtype="float32")
        prompts = [[1, 2, 3, 4, 5], [9, 9, 9]]
        sp = SamplingParams(max_new_tokens=6)
        single = LLMEngine(cfg, EngineConfig(**ecfg), params=params)
        try:
            want = [o.output_tokens for o in single.generate(prompts, sp)]
        finally:
            single.shutdown()
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("pp", "tp"))
        eng = LLMEngine(PPLlamaAdapter(cfg, num_stages=4),
                        EngineConfig(**ecfg), params=params, mesh=mesh)
        try:
            got = [o.output_tokens for o in eng.generate(prompts, sp)]
        finally:
            eng.shutdown()
        assert got == want, "4-stage pp×tp engine diverged"

    def test_prime_page_count_tiling(self):
        """A 3-page (prime) prefill bucket: the microtile divisor logic
        must pick a whole-page tiling (3 tiles at mb>=3, no tiling at
        mb=2) and stay token-exact either way."""
        import numpy as np
        from jax.sharding import Mesh

        if len(jax.devices()) < 2:
            pytest.skip("needs 2 virtual devices")
        cfg = LlamaConfig.toy(num_layers=4, dtype="float32")
        params = init_llama_params(cfg, jax.random.PRNGKey(0))
        prompts = [[1, 2, 3, 4, 5] * 6, [9, 9, 9]]
        sp = SamplingParams(max_new_tokens=6)
        for mb in (2, 4):
            ecfg = dict(max_batch=2, max_model_len=96, page_tokens=16,
                        decode_horizon=4, prefill_buckets=(48,),
                        num_pages=32, interpret=True, kv_dtype="float32",
                        pp_microbatches=mb)
            single = LLMEngine(cfg, EngineConfig(**ecfg), params=params)
            try:
                want = [o.output_tokens
                        for o in single.generate(prompts, sp)]
            finally:
                single.shutdown()
            eng = LLMEngine(
                PPLlamaAdapter(cfg, num_stages=2), EngineConfig(**ecfg),
                params=params,
                mesh=Mesh(np.array(jax.devices()[:2]), ("pp",)),
            )
            try:
                got = [o.output_tokens for o in eng.generate(prompts, sp)]
            finally:
                eng.shutdown()
            assert got == want, f"pp_microbatches={mb} diverged"
