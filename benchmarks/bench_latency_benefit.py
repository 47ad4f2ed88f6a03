"""Elastic-sharing latency benefit — the reference's headline benchmark.

Reference (README.md:112-122): 3 colocated Llama-8B on one A100, bursty ramp
load → kvcached cuts TTFT 2-28× vs static partitioning, because a bursting
model can borrow HBM pages the idle models aren't using.

Here: THREE colocated engines share one physical pool (the reference's
bench_latency_benefit harness also launches 3 models,
run_benchmark.sh:14-31).  Model A receives a burst while B and C idle (the
serverless-colocation scenario).  We compare:

- **elastic**: all three draw from the shared pool (B/C idle → A can use
  nearly all pages)
- **static**:  each engine's limit is pinned to a third of the pool (the
  partitioned baseline), enforced through the same `resize` path an
  operator would use via `kvctl limit`.

Metric: mean/p99 time-to-first-token and finish time for A's burst,
preemption counts, and aggregate HBM utilization (allocator-exact peak
in-use pages across all engines / pool pages).

Scale: `--tpu` runs a 1B-class model with a **multi-GB pool (1000+ pages)
at the DEFAULT prealloc knobs** — the reference keeps 5-10 pre-mapped
pages warm on an 80 GB pool (<1%), and at this scale ours is the same
ratio, so nothing needs tuning down (round-2's 44-page run needed special
knobs, which itself said the scale was wrong).  Batched prefill is on:
the burst's prompts stack into single dispatches instead of paying ~30 ms
tunnel overhead each.

Run: python benchmarks/bench_latency_benefit.py [--tpu] [--burst N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_burst(elastic: bool, *, num_pages=96, burst=8, max_new=160,
              interpret=True, model_cfg=None, page_tokens=16,
              adaptive_horizon=True, max_model_len=256, hold_frac=0.02,
              max_batch=None, prefill_buckets=(64,), prefill_batch=1,
              prompt_base=32, prompt_step=16, decode_horizon=4,
              n_idle=2, distinct_weights=False):
    import jax

    from kvcached_tpu.engine import EngineConfig, LLMEngine, SamplingParams
    from kvcached_tpu.models.llama import LlamaConfig, init_llama_params

    debug = os.environ.get("KVCACHED_BENCH_DEBUG")

    def _dbg(tag):
        if debug:
            gb = sum(x.nbytes for x in jax.live_arrays()) / 2**30
            print(f"[debug] {tag}: {gb:.2f} GB live", flush=True)

    cfg = model_cfg or LlamaConfig.toy()
    # Init EVERY param tree before building any engine: random init makes
    # GB-scale f32 transients (w_gate f32 alone is 2.8 GB at 3B), and once
    # engine A's pool arenas sit in HBM those transients fragment the
    # space the prefill program's workspace needs — observed as a
    # RESOURCE_EXHAUSTED at warm-up with >2 GB nominally free.
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    idle_params = [
        init_llama_params(cfg, jax.random.PRNGKey(1 + i))
        if distinct_weights else params
        for i in range(n_idle)
    ]
    import jax as _jax
    _jax.block_until_ready(idle_params)
    _dbg("params")
    ec = dict(
        max_batch=max_batch or (4 if interpret else 12),
        max_model_len=max_model_len, page_tokens=page_tokens,
        decode_horizon=decode_horizon, prefill_buckets=prefill_buckets,
        num_pages=num_pages, interpret=interpret,
        enable_prefix_caching=False, adaptive_horizon=adaptive_horizon,
        prefill_batch=prefill_batch,
    )
    # colocated engines over ONE pool; ``distinct_weights`` gives each
    # engine its OWN GB-scale parameter copy (the reference's colocated
    # instances are independent serving processes with their own weights)
    a = LLMEngine(cfg, EngineConfig(**ec), params=params)
    idle = [
        LLMEngine(
            cfg, EngineConfig(**ec), params=idle_params[i],
            shared_pool=a.pool, pool_arrays=a.arrays,
        )
        for i in range(n_idle)
    ]
    _dbg("engines built")

    if not elastic:
        # static partition: pin each model to an equal share of the pool
        n = 1 + n_idle
        share = (num_pages // n) * a.kv_cfg.page_bytes
        a.manager.resize(share)
        for e in idle:
            e.manager.resize(share)

    # idle models hold a small steady-state working set each
    hold_blocks = int(num_pages * hold_frac) * a.kv_cfg.blocks_per_page
    holds = []
    for e in idle:
        if hold_blocks:
            h = e.manager.alloc(min(e.manager.available_size(), hold_blocks))
            if h:
                holds.append((e, h))

    # warm compile on A — including the BATCHED prefill program: its
    # first execution costs seconds (trace + executable load through the
    # tunnel), which would otherwise land inside the measured burst's
    # first step and dominate every request's TTFT
    _dbg("pre warm gen")
    a.generate([[1] * prompt_base] * max(1, prefill_batch),
               SamplingParams(max_new_tokens=2))
    _dbg("post warm gen")

    # burst on A: submit all at once, measure TTFT per request.
    # staggered request shapes (real traces aren't lockstep): varied prompt
    # and generation lengths so page-boundary crossings spread out in time
    submit_t = time.perf_counter()
    ids = [
        a.add_request(
            [i + 2] * (prompt_base + prompt_step * (i % 4)),
            SamplingParams(
                # clamp so prompt+max_new fits max_model_len at any i
                max_new_tokens=min(
                    max(16, max_new - (max_new // 12) * (i % 5)),
                    max_model_len - (prompt_base + prompt_step * (i % 4)),
                )
            ),
        )
        for i in range(burst)
    ]
    ttft: dict[int, float] = {}
    pool_bytes = num_pages * a.kv_cfg.page_bytes
    nstep = 0
    while a.has_unfinished():
        t0 = time.perf_counter()
        a.step()
        now = time.perf_counter()
        nstep += 1
        if debug and nstep <= 24:
            print(f"[debug] step {nstep}: {now - submit_t:6.2f}s "
                  f"(+{now - t0:5.2f}s) running={len(a.running)} "
                  f"waiting={len(a.waiting)}", flush=True)
        for seq in a.running:
            if seq.req.req_id not in ttft and seq.num_generated > 0:
                ttft[seq.req.req_id] = now - submit_t
        for out in a.finished_outputs:
            ttft.setdefault(out.req_id, now - submit_t)
    finish = time.perf_counter() - submit_t

    # utilization = pages that actually SERVED requests (allocator-exact
    # high-water mark of in_use; the prealloc reserve doesn't count)
    peak_mapped = sum(
        e.manager.page_allocator.peak_in_use for e in (a, *idle)
    ) * a.kv_cfg.page_bytes

    if debug:
        print("[debug] per-req TTFT:",
              [round(ttft.get(i, finish), 2) for i in ids], flush=True)
    lat = sorted(ttft.get(i, finish) for i in ids)
    mean = sum(lat) / len(lat)
    p99 = lat[min(len(lat) - 1, int(0.99 * len(lat)))]
    preempts = a._preempt_count
    for e, h in holds:
        e.manager.free(h)
    a.shutdown()
    for e in idle:
        e.shutdown()
    return {"mean_ttft_s": mean, "p99_ttft_s": p99,
            "finish_s": finish, "preemptions": preempts,
            "hbm_util": peak_mapped / pool_bytes}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--tpu3b", action="store_true",
                    help="2 colocated 3B-class models with DISTINCT "
                         "GB-scale weight copies (BASELINE.md north-star "
                         "scale on one v5e)")
    ap.add_argument("--burst", type=int, default=None)
    ap.add_argument("--max-batch", type=int, default=None)
    ap.add_argument("--num-pages", type=int, default=None)
    args = ap.parse_args()

    kw = {}
    burst = args.burst or 12
    if args.tpu3b:
        from kvcached_tpu.models.llama import LlamaConfig

        # Llama-3.2-3B geometry (hidden 3072, 28 layers, 24/8 heads, ffn
        # 8192) at 32k vocab: 3.0B params, 6.0 GB bf16 — TWO DISTINCT
        # copies (12 GB) + a 1.6 GB shared pool fill the v5e's 16 GB like
        # the reference's 3×8B fill an A100-80G (a 2.1 GB pool OOMs once
        # the prefill program's workspace lands on top of the weights).
        # One engine bursts while the other idles; page_tokens 32 halves
        # page-table overhead at this depth (page = 28L × 8KH × 32 × 128
        # × 2B × 2 = 3.7 MB).  Long prompts (768-960 tokens ≈ 24-30 pages
        # each) make the burst's PROMPTS alone (~270 pages) exceed the
        # static half (220) — the reference's long-context regime where
        # TTFT itself is memory-bound — while total demand (~395 pages
        # incl. generation) stays inside the elastic pool (440), so
        # static queues/preempts at admission and elastic absorbs the
        # whole burst.
        burst = args.burst or 10
        kw = dict(
            interpret=False, page_tokens=32,
            num_pages=args.num_pages or 440,  # ≈1.6 GB pool
            adaptive_horizon=False, max_model_len=2048, max_new=480,
            hold_frac=0.02, prefill_buckets=(512,), prefill_batch=4,
            prompt_base=768, prompt_step=64, decode_horizon=8,
            max_batch=args.max_batch or 12,
            n_idle=1, distinct_weights=True,
            model_cfg=LlamaConfig(
                vocab_size=32000, hidden_size=3072, num_layers=28,
                num_heads=24, num_kv_heads=8, head_dim=128,
                intermediate_size=8192,
            ),
        )
    elif args.tpu:
        from kvcached_tpu.models.llama import LlamaConfig

        # 1B-class model, multi-GB pool, DEFAULT prealloc knobs (5-10
        # reserved of 1000+ pages ≈ the reference's production ratio on an
        # 80 GB pool — no special tuning).  Burst demand ≈ 60% of the pool:
        # far beyond a static third (pressure: queuing/preemption) but
        # absorbable elastically.  adaptive_horizon off: one decode program
        # per engine (tunnel compiles are minutes each; overflow masking
        # keeps fixed-K exact).  Batched prefill: the burst's prompts stack
        # 8 per dispatch.
        # Sizing: 16-token pages → 1.44 MB/page × 2200 pages ≈ 3.2 GB pool
        # (thousands of pages).  Concurrent demand = max_batch 20 × ~100
        # pages/seq ≈ 2000 pages — far beyond the static third (733) but
        # inside the elastic pool, so the static run queues/preempts while
        # elastic absorbs the whole batch.
        burst = args.burst or 24
        kw = dict(
            interpret=False, page_tokens=16,
            num_pages=args.num_pages or 2200,
            adaptive_horizon=False, max_model_len=2048, max_new=1400,
            hold_frac=0.02, prefill_buckets=(512,), prefill_batch=8,
            prompt_base=256, prompt_step=64, decode_horizon=8,
            max_batch=args.max_batch or 20,
            model_cfg=LlamaConfig(
                vocab_size=32000, hidden_size=2048, num_layers=22,
                num_heads=16, num_kv_heads=8, head_dim=128,
                intermediate_size=5632,
            ),
        )
    elif args.max_batch:
        kw["max_batch"] = args.max_batch

    print("== latency benefit: elastic shared pool vs static partition ==")
    static = run_burst(elastic=False, burst=burst, **kw)
    elastic = run_burst(elastic=True, burst=burst, **kw)
    for name, r in (("static", static), ("elastic", elastic)):
        print(f"{name:8}: mean TTFT {r['mean_ttft_s']*1e3:8.1f} ms  "
              f"p99 {r['p99_ttft_s']*1e3:8.1f} ms  "
              f"finish {r['finish_s']:.2f} s  preempts {r['preemptions']}  "
              f"peak HBM util {r['hbm_util']:.2f}")
    print(f"TTFT improvement: mean {static['mean_ttft_s']/elastic['mean_ttft_s']:.2f}x, "
          f"p99 {static['p99_ttft_s']/elastic['p99_ttft_s']:.2f}x; "
          f"aggregate HBM utilization {elastic['hbm_util']/max(static['hbm_util'],1e-9):.2f}x")


if __name__ == "__main__":
    main()
