"""Elastic-sharing latency benefit — the reference's headline benchmark.

Reference (README.md:112-122): 3 colocated Llama-8B on one A100, bursty ramp
load → kvcached cuts TTFT 2-28× vs static partitioning, because a bursting
model can borrow HBM pages the idle models aren't using.

Here: two colocated engines share one physical pool.  Model A receives a
burst while model B idles.  We compare:

- **elastic**: both draw from the shared pool (B idle → A can use ~all pages)
- **static**:  each engine's limit is pinned to half the pool (the
  partitioned baseline), enforced through the same `resize` path an
  operator would use via `kvctl limit`.

Metric: mean/p99 time-to-first-token and finish time for A's burst, plus
preemption counts.  Runs on CPU toy models by default; pass --tpu for the
real chip.

Run: python benchmarks/bench_latency_benefit.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_burst(elastic: bool, *, num_pages=64, burst=8, max_new=160,
              interpret=True, model_cfg=None, page_tokens=16,
              adaptive_horizon=True, max_model_len=256, hold_frac=0.125,
              max_batch=None):
    import jax

    from kvcached_tpu.engine import EngineConfig, LLMEngine, SamplingParams
    from kvcached_tpu.models.llama import LlamaConfig, init_llama_params

    cfg = model_cfg or LlamaConfig.toy()
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    ec = dict(
        max_batch=max_batch or (4 if interpret else 8),
        max_model_len=max_model_len, page_tokens=page_tokens,
        decode_horizon=4, prefill_buckets=(64,), num_pages=num_pages,
        interpret=interpret, enable_prefix_caching=False,
        adaptive_horizon=adaptive_horizon,
    )
    a = LLMEngine(cfg, EngineConfig(**ec), params=params)
    b = LLMEngine(cfg, EngineConfig(**ec), params=params,
                  shared_pool=a.pool, pool_arrays=a.arrays)

    if not elastic:
        # static partition: pin each model to half the pool
        half = (num_pages // 2) * a.kv_cfg.page_bytes
        a.manager.resize(half)
        b.manager.resize(half)

    # model B idles but holds a working set (a long sequence's worth of pages
    # pinned via try_to_reserve — simulating its steady-state footprint)
    # B idles with a small steady-state working set (~12% of the pool)
    hold_blocks = int(num_pages * hold_frac) * a.kv_cfg.blocks_per_page
    b_hold = (
        b.manager.alloc(min(b.manager.available_size(), hold_blocks))
        if hold_blocks else None
    )

    # warm compile on A
    a.generate([[1] * 48], SamplingParams(max_new_tokens=2))

    # burst on A: submit all at once, measure TTFT per request
    # staggered request shapes (real traces aren't lockstep): varied prompt
    # and generation lengths so page-boundary crossings spread out in time
    submit_t = time.perf_counter()
    ids = [
        a.add_request(
            [i + 2] * (32 + 16 * (i % 4)),
            SamplingParams(
                # clamp so prompt+max_new fits max_model_len at any i
                max_new_tokens=min(
                    max(16, max_new - 24 * (i % 5)),
                    max_model_len - (32 + 16 * (i % 4)),
                )
            ),
        )
        for i in range(burst)
    ]
    ttft: dict[int, float] = {}
    pool_bytes = num_pages * a.kv_cfg.page_bytes
    while a.has_unfinished():
        a.step()
        now = time.perf_counter()
        for seq in a.running:
            if seq.req.req_id not in ttft and seq.num_generated > 0:
                ttft[seq.req.req_id] = now - submit_t
        for out in a.finished_outputs:
            ttft.setdefault(out.req_id, now - submit_t)
    finish = time.perf_counter() - submit_t

    # utilization = pages that actually SERVED requests (allocator-exact
    # high-water mark of in_use; the prealloc reserve doesn't count)
    peak_mapped = (
        a.manager.page_allocator.peak_in_use
        + b.manager.page_allocator.peak_in_use
    ) * a.kv_cfg.page_bytes

    lat = sorted(ttft.get(i, finish) for i in ids)
    mean = sum(lat) / len(lat)
    p99 = lat[min(len(lat) - 1, int(0.99 * len(lat)))]
    preempts = a._preempt_count
    if b_hold:
        b.manager.free(b_hold)
    a.shutdown()
    b.shutdown()
    return {"mean_ttft_s": mean, "p99_ttft_s": p99,
            "finish_s": finish, "preemptions": preempts,
            "hbm_util": peak_mapped / pool_bytes}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--burst", type=int, default=12)
    ap.add_argument("--max-batch", type=int, default=None)
    args = ap.parse_args()

    kw = {}
    if args.tpu:
        # Scale the prealloc reserve to this bench's deliberately tiny pool
        # (44 pages).  The reference keeps 5-10 pre-mapped pages warm on an
        # 80 GB pool (thousands of pages, <1%); 5-10 of 44 would withhold up
        # to 23% of the pool from serving and distort the utilization
        # numerator for BOTH runs.  1-2 pages preserves the same
        # map-off-critical-path behavior at the production ratio.
        os.environ.setdefault("KVCACHED_MIN_RESERVED_PAGES", "1")
        os.environ.setdefault("KVCACHED_MAX_RESERVED_PAGES", "2")
        from kvcached_tpu.models.llama import LlamaConfig

        # memory-pressured pool: burst demand ≈ pool size, so the static
        # half-partition queues/preempts while elastic absorbs the burst.
        # adaptive_horizon off: one decode program per engine (tunnel
        # compiles are minutes each; overflow masking keeps fixed-K exact)
        # 8 pages/request so the elastic pool genuinely fills while the
        # static half stays capped (≥1.5x aggregate-utilization target)
        # B fully idle: the serverless-colocation scenario — static strands
        # B's half of the pool, elastic lends it to A's burst
        kw = dict(interpret=False, page_tokens=64, num_pages=44,
                  adaptive_horizon=False, max_model_len=512, max_new=440,
                  hold_frac=0.0,
                  model_cfg=LlamaConfig(
                      hidden_size=1024, num_layers=8, num_heads=8,
                      num_kv_heads=4, intermediate_size=2816))

    print("== latency benefit: elastic shared pool vs static partition ==")
    static = run_burst(elastic=False, burst=args.burst,
                       max_batch=args.max_batch, **kw)
    elastic = run_burst(elastic=True, burst=args.burst,
                        max_batch=args.max_batch, **kw)
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
