"""Load generator against the controller frontend (reference: controller/benchmark.py).

Drives per-model request streams at configurable rates over HTTP and reports
throughput + latency percentiles per model.

Run (against a live launcher):
    python -m kvcached_tpu.controller.benchmark --url http://localhost:8080 \
        --model llama-a --rate 4 --duration 30
"""

from __future__ import annotations

import argparse
import asyncio
import time

import numpy as np


async def one_request(session, url: str, model: str, prompt_len: int,
                      max_tokens: int) -> tuple[float, bool]:
    t0 = time.perf_counter()
    try:
        async with session.post(f"{url}/v1/completions", json={
            "model": model,
            "prompt_token_ids": [int(t) for t in np.random.default_rng().integers(3, 250, prompt_len)],
            "max_tokens": max_tokens,
        }) as resp:
            await resp.json()
            return time.perf_counter() - t0, resp.status == 200
    except Exception:
        return time.perf_counter() - t0, False


async def drive(url: str, model: str, rate: float, duration: float,
                prompt_len: int, max_tokens: int) -> dict:
    import aiohttp

    latencies: list[float] = []
    errors = 0
    tasks: list[asyncio.Task] = []
    async with aiohttp.ClientSession() as session:
        end = time.perf_counter() + duration
        while time.perf_counter() < end:
            tasks.append(asyncio.create_task(
                one_request(session, url, model, prompt_len, max_tokens)))
            await asyncio.sleep(1.0 / rate)
        results = await asyncio.gather(*tasks)
    for lat, ok in results:
        if ok:
            latencies.append(lat)
        else:
            errors += 1
    lat = sorted(latencies)
    pick = lambda p: lat[min(len(lat) - 1, int(p * len(lat)))] if lat else 0
    return {
        "model": model,
        "completed": len(lat),
        "errors": errors,
        "throughput_rps": len(lat) / duration,
        "p50_s": pick(0.5),
        "p99_s": pick(0.99),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--url", default="http://localhost:8080")
    ap.add_argument("--model", action="append", required=True,
                    help="model name (repeat for several)")
    ap.add_argument("--rate", type=float, default=2.0, help="req/s per model")
    ap.add_argument("--duration", type=float, default=30.0)
    ap.add_argument("--prompt-len", type=int, default=64)
    ap.add_argument("--max-tokens", type=int, default=32)
    args = ap.parse_args(argv)

    async def run_all():
        results = await asyncio.gather(*(
            drive(args.url, m, args.rate, args.duration,
                  args.prompt_len, args.max_tokens)
            for m in args.model
        ))
        for r in results:
            print(f"{r['model']:>16}: {r['throughput_rps']:.2f} req/s  "
                  f"p50 {r['p50_s']*1e3:.0f} ms  p99 {r['p99_s']*1e3:.0f} ms  "
                  f"errors {r['errors']}")

    asyncio.run(run_all())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
