#!/usr/bin/env python
"""Speculative decoding benchmark: verify-dispatch cost vs decode-step cost.

Two measurements on the 1B-class bench model (same config as bench.py):

1. KERNEL RATIO — per-dispatch cost of one fused verify forward (T =
   gamma+1 fed tokens per row) vs one plain decode forward, both measured
   with chained in-jit steps + host-sync slopes (axon tunnel methodology,
   see benchmarks/README.md).  A verify dispatch streams the weights and
   the live KV ONCE for T tokens, so per-dispatch cost close to the decode
   step's means the speedup is ~ the acceptance rate.

2. ENGINE WALL-CLOCK — two engines (spec on / off) serve the same greedy
   requests end-to-end; reports tokens/s and the measured acceptance
   (tokens per dispatch).

Usage: python benchmarks/bench_spec_decode.py [gamma]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

import jax
import jax.numpy as jnp
import numpy as np

from kvcached_tpu.models.llama import (
    LlamaConfig,
    init_llama_params,
    llama_decode_step,
    llama_verify_step,
)

ON_TPU = jax.devices()[0].platform == "tpu"


def kernel_ratio(gamma: int):
    if ON_TPU:
        cfg = LlamaConfig(
            vocab_size=32000, hidden_size=2048, num_layers=16,
            num_heads=16, num_kv_heads=8, head_dim=128,
            intermediate_size=5632,
        )
        B, CTX, P, NPAGES = 8, 2048, 64, 1024  # 2.1 GB/pool, >> VMEM
        live = 512
        lo, hi, reps = 8, 64, 5
        interpret = False
    else:
        cfg = LlamaConfig.toy()
        B, CTX, P, NPAGES = 2, 64, 16, 32
        live = 32
        lo, hi, reps = 2, 4, 1
        interpret = True

    T = gamma + 1
    L, KH, D = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
    n_per = CTX // P
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    perm = rng.permutation(np.arange(1, NPAGES))
    page_tables = jnp.asarray(
        perm[: B * n_per].reshape(B, n_per).astype(np.int32)
    )
    k_pools = jax.random.normal(
        jax.random.PRNGKey(1), (L, NPAGES, KH, P, D), jnp.bfloat16
    )
    v_pools = jax.random.normal(
        jax.random.PRNGKey(2), (L, NPAGES, KH, P, D), jnp.bfloat16
    )
    seq0 = jnp.full((B,), live, jnp.int32)
    tok0 = jnp.ones((B,), jnp.int32)

    import functools

    @functools.partial(jax.jit, static_argnames=("K",))
    def run_decode(params, k_pools, v_pools, K):
        def one(carry, j):
            tokens, k_pools, v_pools = carry
            seq_lens = seq0 + j + 1
            positions = seq_lens - 1
            b_idx = jnp.arange(B)
            sp = page_tables[b_idx, positions // P]
            so = positions % P
            logits, k_pools, v_pools = llama_decode_step(
                params, cfg, tokens, positions, k_pools, v_pools,
                page_tables, sp, so, seq_lens, interpret=interpret,
            )
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (nxt, k_pools, v_pools), None

        (tokens, k_pools, v_pools), _ = jax.lax.scan(
            one, (tok0, k_pools, v_pools), jnp.arange(K)
        )
        return tokens

    @functools.partial(jax.jit, static_argnames=("K",))
    def run_verify(params, k_pools, v_pools, K):
        def one(carry, j):
            tokens, k_pools, v_pools = carry
            # fixed-window re-verify: positions advance by T per dispatch
            base = seq0 + j * T
            jj = jnp.arange(T)
            pos = base[:, None] + jj[None, :]
            b_idx = jnp.arange(B)[:, None]
            sp = page_tables[b_idx, (pos // P) % page_tables.shape[1]]
            so = pos % P
            toks_t = jnp.broadcast_to(tokens[:, None], (B, T))
            logits, k_pools, v_pools = llama_verify_step(
                params, cfg, toks_t, pos, k_pools, v_pools,
                page_tables, sp, so, base + T, interpret=interpret,
            )
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return (nxt, k_pools, v_pools), None

        (tokens, k_pools, v_pools), _ = jax.lax.scan(
            one, (tok0, k_pools, v_pools), jnp.arange(K)
        )
        return tokens

    def timed(fn, K):
        t0 = time.time()
        out = fn(params, k_pools, v_pools, K)
        float(jnp.sum(out))
        return time.time() - t0

    out = {}
    for name, fn in (("decode", run_decode), ("verify", run_verify)):
        timed(fn, lo)  # warm both K variants' compiles
        timed(fn, hi)
        slopes = sorted(
            (timed(fn, hi) - timed(fn, lo)) / (hi - lo) for _ in range(reps)
        )
        out[name] = slopes[reps // 2]
    return out["decode"], out["verify"]


def engine_wallclock(gamma: int):
    from kvcached_tpu.engine import EngineConfig, LLMEngine, SamplingParams

    if ON_TPU:
        cfg = LlamaConfig(
            vocab_size=32000, hidden_size=2048, num_layers=16,
            num_heads=16, num_kv_heads=8, head_dim=128,
            intermediate_size=5632,
        )
        ecfg = dict(
            max_batch=8, max_model_len=2048, page_tokens=64,
            decode_horizon=8, prefill_buckets=(64, 128),
            num_pages=1024, adaptive_horizon=False,
            # identical prompts every rep: prefix caching would let reps
            # 2-3 skip prefill, so the median would select warm-cache
            # throughput instead of filtering tunnel noise (ADVICE r2)
            enable_prefix_caching=False,
            # match the decode horizon: per-token host-dispatch overhead
            # (~30 ms on the axon tunnel) must be amortized over the same
            # number of on-device iterations for a fair wall-clock race
            spec_horizon=8,
        )
        max_new = 128
    else:
        cfg = LlamaConfig.toy()
        ecfg = dict(
            max_batch=2, max_model_len=128, page_tokens=16,
            decode_horizon=4, prefill_buckets=(16, 32), num_pages=64,
            interpret=True,
        )
        max_new = 24

    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    # period-3 prompts: random-weight models latch onto repetition, which
    # is what prompt-lookup exploits (real text repeats similarly in code,
    # JSON, quotes, retrieval contexts)
    prompts = [
        [((i * 7 + j) % 200) + 1 for j in range(3)] * 16
        for i in range(ecfg["max_batch"])
    ]
    sp = SamplingParams(max_new_tokens=max_new)

    results = {}
    for spec in (False, True):
        eng = LLMEngine(
            cfg,
            EngineConfig(**ecfg, spec_decode=spec, spec_gamma=gamma),
            params=params,
        )
        try:
            eng.generate(prompts[:1], SamplingParams(max_new_tokens=8))  # warm
            # median of 3 timed runs: engine wall-clock through the axon
            # tunnel carries ~±10% run-to-run noise (~30 ms/dispatch with
            # high variance), which single runs cannot resolve at the ~10%
            # effect size spec decode produces here
            reps = 3 if ON_TPU else 1
            tps = []
            for _ in range(reps):
                t0 = time.time()
                outs = eng.generate(prompts, sp)
                dt = time.time() - t0
                toks = sum(len(o.output_tokens) for o in outs)
                tps.append(toks / dt)
            results[spec] = (sorted(tps)[reps // 2],
                             eng.kv_metrics().get("spec"))
        finally:
            eng.shutdown()
    return results


def main():
    gamma = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    t_dec, t_ver = kernel_ratio(gamma)
    print(f"decode forward:  {t_dec * 1e3:8.3f} ms/dispatch (1 token/row)")
    print(f"verify forward:  {t_ver * 1e3:8.3f} ms/dispatch "
          f"({gamma + 1} fed tokens/row)")
    print(f"dispatch ratio:  {t_ver / t_dec:.3f}x "
          f"(breakeven acceptance: {t_ver / t_dec:.2f} tokens/dispatch)")
    res = engine_wallclock(gamma)
    base_tps, _ = res[False]
    spec_tps, spec_m = res[True]
    print(f"engine plain:    {base_tps:8.1f} tok/s")
    print(f"engine spec:     {spec_tps:8.1f} tok/s "
          f"({spec_tps / base_tps:.2f}x), "
          f"accepted {spec_m['tokens_per_dispatch']:.2f} tokens/dispatch "
          f"(summed over batch rows and spec_horizon device iterations)")
    if "acceptance_ema" in (spec_m or {}):
        print(f"adaptive state:  gamma={spec_m['gamma']} "
              f"acceptance_ema={spec_m['acceptance_ema']:.2f} "
              f"(accepted drafts/row/iteration)")


if __name__ == "__main__":
    main()
