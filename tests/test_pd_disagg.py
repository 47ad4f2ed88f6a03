"""Prefill/decode disaggregation tests.

Reference: NIXL PD compatibility (vllm/nixl_compat.py:104-197).  Here the
transfer itself is implemented: a prefilled sequence's KV pages move to a
different engine (same process or another process over the socket plane),
which continues decoding TOKEN-EXACTLY vs an engine that did everything
locally.
"""

import os
import subprocess
import sys
import uuid

import jax
import pytest

from kvcached_tpu.engine import EngineConfig, LLMEngine, SamplingParams
from kvcached_tpu.models.llama import LlamaConfig, init_llama_params

ECFG = dict(
    max_batch=2, max_model_len=128, page_tokens=16, decode_horizon=2,
    prefill_buckets=(16, 32), num_pages=48, interpret=True,
    enable_prefix_caching=False,
)
PROMPT = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
MAX_NEW = 14


@pytest.fixture(scope="module")
def toy():
    cfg = LlamaConfig.toy()
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def local_reference(cfg, params, ecfg=None):
    eng = LLMEngine(cfg, EngineConfig(**(ecfg or ECFG)), params=params)
    try:
        return eng.generate(
            [PROMPT], SamplingParams(max_new_tokens=MAX_NEW)
        )[0].output_tokens
    finally:
        eng.shutdown()


class TestInProcessHandoff:
    def test_decode_continues_prefill_exactly(self, toy):
        cfg, params = toy
        want = local_reference(cfg, params)

        prefiller = LLMEngine(cfg, EngineConfig(**ECFG), params=params)
        decoder = LLMEngine(cfg, EngineConfig(**ECFG), params=params)
        try:
            rid = prefiller.add_request(
                PROMPT, SamplingParams(max_new_tokens=MAX_NEW)
            )
            prefiller.step()  # prefill only
            assert prefiller.running and prefiller.running[0].num_generated == 1

            handoff = prefiller.export_sequence(rid)
            assert handoff.payload_k.shape[1] == len(handoff.tokens) // 16 + (
                1 if len(handoff.tokens) % 16 else 0
            )
            # prefiller's pages are back in its pool
            assert prefiller.manager.page_allocator.num_in_use <= 1

            new_id = decoder.import_sequence(handoff)
            while decoder.has_unfinished():
                decoder.step()
            out = next(
                o for o in decoder.finished_outputs if o.req_id == new_id
            )
            assert out.output_tokens == want, "PD handoff diverged"
        finally:
            prefiller.shutdown()
            decoder.shutdown()

    def test_spec_decoder_continues_import_exactly(self):
        """A decode engine running SPECULATIVE decoding continues an
        imported prefill token-exactly: the drafting ring seeds from the
        handoff tokens and verify reads the imported pages.  (float32
        weights AND pools: in bf16 the verify forward rounds differently
        than the decode forward, so a greedy near-tie argmax could flip —
        the documented spec-decode caveat, not a PD bug.)"""
        cfg = LlamaConfig.toy(dtype="float32")
        params = init_llama_params(cfg, jax.random.PRNGKey(0))
        ecfg = {**ECFG, "kv_dtype": "float32"}
        want = local_reference(cfg, params, ecfg)

        prefiller = LLMEngine(cfg, EngineConfig(**ecfg), params=params)
        decoder = LLMEngine(
            cfg, EngineConfig(**{**ecfg, "spec_decode": True,
                                 "spec_gamma": 3}),
            params=params,
        )
        try:
            rid = prefiller.add_request(
                PROMPT, SamplingParams(max_new_tokens=MAX_NEW)
            )
            prefiller.step()  # prefill only
            new_id = decoder.import_sequence(prefiller.export_sequence(rid))
            while decoder.has_unfinished():
                decoder.step()
            out = next(
                o for o in decoder.finished_outputs if o.req_id == new_id
            )
            assert out.output_tokens == want, "spec PD continuation diverged"
            assert decoder.kv_metrics()["spec"]["dispatches"] > 0
        finally:
            prefiller.shutdown()
            decoder.shutdown()

    def test_wire_roundtrip(self, toy):
        from kvcached_tpu.parallel.pd import SeqHandoff

        cfg, params = toy
        eng = LLMEngine(cfg, EngineConfig(**ECFG), params=params)
        try:
            rid = eng.add_request(PROMPT, SamplingParams(max_new_tokens=4))
            eng.step()
            h = eng.export_sequence(rid)
            h2 = SeqHandoff.from_wire(h.to_wire())
            assert h2.tokens == h.tokens
            assert h2.payload_k.dtype == h.payload_k.dtype
            import numpy as np

            np.testing.assert_array_equal(
                np.asarray(h2.payload_k, np.float32),
                np.asarray(h.payload_k, np.float32),
            )
        finally:
            eng.shutdown()


class TestDevicePayloadHandoff:
    def test_device_export_stays_on_device_and_matches(self, toy):
        """export_sequence(device=True): payloads are jax arrays (the ICI
        plane between chips); import device_puts them without a host
        bounce and decoding matches the local reference."""
        cfg, params = toy
        want = local_reference(cfg, params)

        prefiller = LLMEngine(cfg, EngineConfig(**ECFG), params=params)
        decoder = LLMEngine(cfg, EngineConfig(**ECFG), params=params)
        try:
            rid = prefiller.add_request(
                PROMPT, SamplingParams(max_new_tokens=MAX_NEW)
            )
            prefiller.step()
            handoff = prefiller.export_sequence(rid, device=True)
            assert isinstance(handoff.payload_k, jax.Array)

            new_id = decoder.import_sequence(handoff)
            while decoder.has_unfinished():
                decoder.step()
            out = next(
                o for o in decoder.finished_outputs if o.req_id == new_id
            )
            assert out.output_tokens == want
            # the device handoff still serializes (lazy gather)
            from kvcached_tpu.parallel.pd import SeqHandoff

            h2 = SeqHandoff.from_wire(handoff.to_wire())
            assert h2.tokens == handoff.tokens
        finally:
            prefiller.shutdown()
            decoder.shutdown()


class TestMeshImportHandoff:
    def test_import_into_meshed_decode_engine(self):
        """PD across parallelism domains: a single-device prefill engine
        hands off to a decode engine serving over a dp×tp mesh (the
        payload shards onto the kv-head axis through a shard-mapped page
        writer)."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")

        from kvcached_tpu.models.llama import LlamaConfig, init_llama_params
        from kvcached_tpu.parallel.mesh import make_mesh

        # float32 for exact token equality across the mesh (bf16 TP rounds
        # partial sums pre-psum; greedy near-ties can flip — inherent)
        cfg = LlamaConfig(
            vocab_size=256, hidden_size=256, num_layers=2,
            num_heads=8, num_kv_heads=4, head_dim=128, intermediate_size=512,
            dtype="float32",
        )
        params = init_llama_params(cfg, jax.random.PRNGKey(0))
        ecfg = {**ECFG, "kv_dtype": "float32"}
        want = local_reference(cfg, params, ecfg)

        prefiller = LLMEngine(cfg, EngineConfig(**ecfg), params=params)
        decoder = LLMEngine(
            cfg, EngineConfig(**ecfg), params=params,
            mesh=make_mesh(tp=4, dp=2),
        )
        try:
            rid = prefiller.add_request(
                PROMPT, SamplingParams(max_new_tokens=MAX_NEW)
            )
            prefiller.step()
            handoff = prefiller.export_sequence(rid, device=True)

            new_id = decoder.import_sequence(handoff)
            assert decoder.k_pools.sharding.spec == (None, None, "tp")
            while decoder.has_unfinished():
                decoder.step()
            out = next(
                o for o in decoder.finished_outputs if o.req_id == new_id
            )
            assert out.output_tokens == want, "mesh PD import diverged"
        finally:
            prefiller.shutdown()
            decoder.shutdown()


class TestStatefulHandoff:
    def test_hybrid_linear_pd_roundtrip(self):
        """Stateful (attention + mamba) PD: the handoff carries the packed
        super cell alongside KV pages; the decode engine continues
        token-exactly (wire round-trip included)."""
        from kvcached_tpu.models.mamba import (
            HybridLinearConfig,
            init_hybrid_linear_params,
        )
        from kvcached_tpu.parallel.pd import SeqHandoff

        cfg = HybridLinearConfig.toy(num_layers=4)
        params = init_hybrid_linear_params(cfg, jax.random.PRNGKey(0))
        want = local_reference(cfg, params)

        prefiller = LLMEngine(cfg, EngineConfig(**ECFG), params=params)
        decoder = LLMEngine(cfg, EngineConfig(**ECFG), params=params)
        try:
            rid = prefiller.add_request(
                PROMPT, SamplingParams(max_new_tokens=MAX_NEW)
            )
            prefiller.step()
            handoff = prefiller.export_sequence(rid)
            assert handoff.payload_state is not None
            assert handoff.payload_state.shape == (
                cfg.num_mamba_layers, cfg.cell_elems,
            )
            # prefiller released its state slot (only the null slot remains)
            assert prefiller.state_manager.page_allocator.num_in_use <= 1

            handoff = SeqHandoff.from_wire(handoff.to_wire())
            new_id = decoder.import_sequence(handoff)
            while decoder.has_unfinished():
                decoder.step()
            out = next(
                o for o in decoder.finished_outputs if o.req_id == new_id
            )
            assert out.output_tokens == want, "stateful PD diverged"
        finally:
            prefiller.shutdown()
            decoder.shutdown()


class TestHybridGroupHandoff:
    def test_multi_group_pd_with_reclaimed_pages(self):
        """Hybrid (full-attn + sliding-window groups) PD: the handoff ships
        each group's LIVE pages with their block-row positions — the SW
        group's reclaimed (None) entries stay dead on the decode side —
        and decoding continues token-exactly, including further window
        reclaim."""
        from kvcached_tpu.models.hybrid import HybridConfig, init_hybrid_params
        from kvcached_tpu.parallel.pd import SeqHandoff

        cfg = HybridConfig.toy(num_layers=4, window=32)
        params = init_hybrid_params(cfg, jax.random.PRNGKey(0))
        prompt = list(range(1, 65))  # 4 pages; window 32 reclaims page 0+
        max_new = 20

        local = LLMEngine(cfg, EngineConfig(**ECFG), params=params)
        try:
            want = local.generate(
                [prompt], SamplingParams(max_new_tokens=max_new)
            )[0].output_tokens
        finally:
            local.shutdown()

        prefiller = LLMEngine(cfg, EngineConfig(**ECFG), params=params)
        decoder = LLMEngine(cfg, EngineConfig(**ECFG), params=params)
        try:
            rid = prefiller.add_request(
                prompt, SamplingParams(max_new_tokens=max_new)
            )
            prefiller.step()  # prefill chunk 1 (interleaved scheduling)
            prefiller.step()  # prefill chunk 2 → sequence running
            prefiller.step()  # one decode horizon → window reclaim kicks in
            h = prefiller.export_sequence(rid)
            assert h.payload_groups is not None
            sw = h.payload_groups[1]  # SW group: some entries reclaimed
            full = h.payload_groups[0]
            assert len(full.indices) == full.n_slots, "full group keeps all"
            assert len(sw.indices) < sw.n_slots, "SW group must have holes"

            h = SeqHandoff.from_wire(h.to_wire())
            new_id = decoder.import_sequence(h)
            while decoder.has_unfinished():
                decoder.step()
            out = next(
                o for o in decoder.finished_outputs if o.req_id == new_id
            )
            assert out.output_tokens == want, "hybrid-group PD diverged"
        finally:
            prefiller.shutdown()
            decoder.shutdown()


class TestMLAHandoff:
    def test_mla_single_buffer_pd(self):
        """MLA's latent pool has one KV buffer (payload_v None): import must
        route through the single-buffer page writer."""
        from kvcached_tpu.models.mla import MLAConfig, init_mla_params

        cfg = MLAConfig.toy()
        params = init_mla_params(cfg, jax.random.PRNGKey(0))
        want = local_reference(cfg, params)

        prefiller = LLMEngine(cfg, EngineConfig(**ECFG), params=params)
        decoder = LLMEngine(cfg, EngineConfig(**ECFG), params=params)
        try:
            rid = prefiller.add_request(
                PROMPT, SamplingParams(max_new_tokens=MAX_NEW)
            )
            prefiller.step()
            handoff = prefiller.export_sequence(rid)
            assert handoff.payload_v is None

            new_id = decoder.import_sequence(handoff)
            while decoder.has_unfinished():
                decoder.step()
            out = next(
                o for o in decoder.finished_outputs if o.req_id == new_id
            )
            assert out.output_tokens == want, "MLA PD diverged"
        finally:
            prefiller.shutdown()
            decoder.shutdown()


DECODE_SERVER_SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import sys
from kvcached_tpu.engine import EngineConfig, LLMEngine
from kvcached_tpu.models.llama import LlamaConfig, init_llama_params
from kvcached_tpu.parallel.pd import PDDecodeServer

cfg = LlamaConfig.toy()
params = init_llama_params(cfg, jax.random.PRNGKey(0))
eng = LLMEngine(cfg, EngineConfig(
    max_batch=2, max_model_len=128, page_tokens=16, decode_horizon=2,
    prefill_buckets=(16, 32), num_pages=48, interpret=True,
    enable_prefix_caching=False,
), params=params)
srv = PDDecodeServer(eng, sys.argv[1])
print("READY", flush=True)
srv.serve_one(timeout=180)
srv.close()
eng.shutdown()
"""


class TestCrossProcessHandoff:
    def test_two_process_pd(self, toy, tmp_path):
        """The reference PD topology: prefill worker and decode worker are
        SEPARATE processes; pages ride the socket plane."""
        from kvcached_tpu.parallel.pd import PDPrefillClient

        cfg, params = toy
        want = local_reference(cfg, params)

        sock = str(tmp_path / f"pd_{uuid.uuid4().hex[:6]}.sock")
        env = dict(os.environ)
        env.update(PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
                   PYTHONPATH=os.path.dirname(os.path.dirname(
                       os.path.abspath(__file__))))
        proc = subprocess.Popen(
            [sys.executable, "-c", DECODE_SERVER_SCRIPT, sock],
            env=env, stdout=subprocess.PIPE, text=True,
        )
        try:
            assert proc.stdout.readline().strip() == "READY"

            prefiller = LLMEngine(cfg, EngineConfig(**ECFG), params=params)
            try:
                rid = prefiller.add_request(
                    PROMPT, SamplingParams(max_new_tokens=MAX_NEW)
                )
                prefiller.step()
                handoff = prefiller.export_sequence(rid)
            finally:
                prefiller.shutdown()

            got = PDPrefillClient(sock).ship(handoff, timeout=180)
            assert got == want, "cross-process PD diverged"
        finally:
            proc.wait(timeout=120)


class TestPlacedPPHandoff:
    """PD under pp PLACEMENT (round 4): export gathers each stage's pages
    from its slice of the stage-stacked pool; import scatters them back
    into the target's stage slices.  A placed-pp prefiller hands off to a
    colocated-pp decoder (same stage structure, one chip) and vice versa
    — both token-exact vs an uninterrupted engine."""

    def _pp_mesh(self):
        import numpy as np
        from jax.sharding import Mesh

        if len(jax.devices()) < 2:
            pytest.skip("needs 2 virtual devices")
        return Mesh(np.array(jax.devices()[:2]), ("pp",))

    def _mk(self, cfg, params, *, placed: bool):
        from kvcached_tpu.parallel.pp import PPLlamaAdapter

        ecfg = dict(
            max_batch=2, max_model_len=128, page_tokens=16,
            decode_horizon=2, prefill_buckets=(16, 32), num_pages=32,
            interpret=True, enable_prefix_caching=False,
            kv_dtype="float32",
        )
        return LLMEngine(
            PPLlamaAdapter(cfg, num_stages=2), EngineConfig(**ecfg),
            params=params, mesh=self._pp_mesh() if placed else None,
        )

    @pytest.mark.parametrize("src_placed,dst_placed",
                             [(True, False), (False, True), (True, True)])
    def test_pp_pd_roundtrip(self, src_placed, dst_placed):
        cfg = LlamaConfig.toy(num_layers=4, dtype="float32")
        params = init_llama_params(cfg, jax.random.PRNGKey(0))

        ref = self._mk(cfg, params, placed=False)
        try:
            want = ref.generate(
                [PROMPT], SamplingParams(max_new_tokens=MAX_NEW)
            )[0].output_tokens
        finally:
            ref.shutdown()

        prefiller = self._mk(cfg, params, placed=src_placed)
        decoder = self._mk(cfg, params, placed=dst_placed)
        try:
            rid = prefiller.add_request(
                PROMPT, SamplingParams(max_new_tokens=MAX_NEW)
            )
            prefiller.step()  # prefill only (one token sampled)
            assert prefiller.running
            handoff = prefiller.export_sequence(rid)
            assert len(handoff.payload_groups) == 2  # one per stage
            new_id = decoder.import_sequence(handoff)
            while decoder.has_unfinished():
                decoder.step()
            got = next(o for o in decoder.finished_outputs
                       if o.req_id == new_id).output_tokens
        finally:
            prefiller.shutdown()
            decoder.shutdown()
        assert got == want, (
            f"pp PD handoff (placed {src_placed}->{dst_placed}) diverged"
        )
