"""Example 11: speculative decoding — prompt-lookup drafts + fused verify.

`spec_decode=True` turns each decode dispatch into: draft gamma tokens per
sequence by matching the trailing n-gram against the sequence's own history
(vLLM's ngram speculator scheme — no draft model), then verify ALL of them
plus a bonus token in ONE forward pass through the fused multi-query paged
kernel.  Weights stream once per dispatch instead of once per token, and
acceptance compares the model's own argmax, so outputs are TOKEN-EXACT vs
plain greedy decode.  (Reference context: the host engines' spec-decode
flow the elastic pools accommodate, sglang/patches.py:714-956.)

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/11_speculative_decoding.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

ON_TPU = jax.devices()[0].platform == "tpu"

from kvcached_tpu.engine import EngineConfig, LLMEngine, SamplingParams
from kvcached_tpu.models.llama import LlamaConfig

# repetitive prompts are where prompt lookup shines (code, JSON, quotes,
# retrieval contexts all repeat like this)
PROMPTS = [[((i * 7 + j) % 200) + 1 for j in range(3)] * 16 for i in range(4)]


def run(spec: bool):
    # f32 so the token-exactness assert below is airtight: in bf16 the
    # verify forward and the decode forward round differently (different
    # matmul shapes), and a greedy argmax near-tie can flip — the same
    # numerics caveat as bf16 tensor parallelism, not a spec-decode bug.
    cfg = LlamaConfig.toy(dtype="float32")
    eng = LLMEngine(cfg, EngineConfig(
        max_batch=4, max_model_len=256, page_tokens=16,
        prefill_buckets=(16, 32, 64), num_pages=128,
        decode_horizon=4, interpret=not ON_TPU,
        spec_decode=spec, spec_gamma=4,
    ))
    try:
        sp = SamplingParams(max_new_tokens=48)
        t0 = time.time()
        outs = eng.generate(PROMPTS, sp)
        dt = time.time() - t0
        toks = sum(len(o.output_tokens) for o in outs)
        return [o.output_tokens for o in outs], toks / dt, (
            eng.kv_metrics().get("spec")
        )
    finally:
        eng.shutdown()


def run_sampled():
    """temperature>0 rows ride the same spec path via rejection sampling
    (distribution-exact, not bit-exact — the RNG draw pattern differs from
    plain decode); adaptive gamma walks a power-of-two ladder on observed
    acceptance."""
    cfg = LlamaConfig.toy(dtype="float32")
    eng = LLMEngine(cfg, EngineConfig(
        max_batch=4, max_model_len=256, page_tokens=16,
        prefill_buckets=(16, 32, 64), num_pages=128,
        decode_horizon=4, interpret=not ON_TPU,
        spec_decode=True, spec_gamma=8, spec_adaptive=True,
    ))
    try:
        sps = [
            SamplingParams(max_new_tokens=32, temperature=0.8, top_p=0.9),
            SamplingParams(max_new_tokens=32),
            SamplingParams(max_new_tokens=32, temperature=1.0, top_k=40),
            SamplingParams(max_new_tokens=32),
        ]
        rids = [eng.add_request(list(p), s) for p, s in zip(PROMPTS, sps)]
        while eng.has_unfinished():
            eng.step()
        assert all(
            len(o.output_tokens) == 32 for o in eng.finished_outputs
        ), rids
        return eng.kv_metrics()["spec"]
    finally:
        eng.shutdown()


def main():
    plain, plain_tps, _ = run(False)
    spec, spec_tps, m = run(True)
    assert spec == plain, "spec decode must be token-exact vs plain greedy"
    print(f"plain decode: {plain_tps:8.1f} tok/s")
    print(f"spec decode:  {spec_tps:8.1f} tok/s ({spec_tps / plain_tps:.2f}x)")
    print(f"accepted {m['tokens_per_dispatch']:.2f} tokens per verify "
          f"dispatch ({m['tokens']} tokens / {m['dispatches']} dispatches)")
    print("outputs token-exact vs plain greedy decode ✓")
    sm = run_sampled()
    ema = sm["acceptance_ema"]  # None right after a cooldown expires
    print(f"mixed greedy+sampled batch with adaptive gamma: "
          f"{sm['tokens_per_dispatch']:.2f} tokens/dispatch, "
          f"settled at gamma={sm['gamma']} "
          f"(acceptance EMA {'n/a' if ema is None else f'{ema:.2f}'})")


if __name__ == "__main__":
    main()
