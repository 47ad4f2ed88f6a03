"""Example 10: prefill/decode disaggregation — a prefill engine hands a
sequence's KV pages to a separate decode engine (reference
vllm/nixl_compat.py:44-197, where NIXL ships kvcached pages between
workers; here the transfer itself is implemented).

Two planes:
- socket plane (cross-process): `SeqHandoff.to_wire()` frames metadata +
  page payloads over the same unix-socket transport as the page-table
  broadcast;
- device plane (cross-chip): `export_sequence(device=True)` keeps payloads
  as jax arrays, so an import on another chip rides ICI via device_put
  with no host bounce.

The decode engine continues TOKEN-EXACTLY vs an engine that did
everything locally — the md5-determinism acceptance gate of the
reference's elastic-serving test, applied to disaggregation.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/10_pd_disaggregation.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

ON_TPU = jax.devices()[0].platform == "tpu"

from kvcached_tpu.engine import EngineConfig, LLMEngine, SamplingParams
from kvcached_tpu.models.llama import LlamaConfig, init_llama_params
from kvcached_tpu.parallel.pd import SeqHandoff

PROMPT = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3, 2, 3, 8, 4]
ECFG = dict(
    max_batch=2, max_model_len=256, page_tokens=16, decode_horizon=2,
    prefill_buckets=(16, 32), num_pages=64, interpret=not ON_TPU,
    enable_prefix_caching=False,
)


def main():
    cfg = LlamaConfig.toy()
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    sp = SamplingParams(max_new_tokens=16)

    # local reference: one engine does prefill AND decode
    local = LLMEngine(cfg, EngineConfig(**ECFG), params=params)
    want = local.generate([PROMPT], sp)[0].output_tokens
    local.shutdown()

    # disaggregated: engine A prefills, engine B decodes
    prefiller = LLMEngine(cfg, EngineConfig(**ECFG), params=params)
    decoder = LLMEngine(cfg, EngineConfig(**ECFG), params=params)

    rid = prefiller.add_request(PROMPT, sp)
    prefiller.step()  # runs exactly the prefill
    handoff = prefiller.export_sequence(rid, device=True)
    print(f"prefill engine exported {handoff.payload_k.shape[1]} pages "
          f"(+1 token already sampled); its pool is drained: "
          f"{prefiller.manager.page_allocator.num_in_use} pages in use")

    # the same handoff serializes for the cross-process socket plane
    wire = handoff.to_wire()
    print(f"wire form: {len(wire)} bytes (json header + raw pages)")
    handoff = SeqHandoff.from_wire(wire)

    new_id = decoder.import_sequence(handoff)
    while decoder.has_unfinished():
        decoder.step()
    got = next(o for o in decoder.finished_outputs if o.req_id == new_id)

    assert got.output_tokens == want, "disaggregated decode diverged"
    print(f"decode engine finished the sequence: {len(got.output_tokens)} "
          f"tokens, token-exact vs the local engine ✓")

    prefiller.shutdown()
    decoder.shutdown()


if __name__ == "__main__":
    main()
