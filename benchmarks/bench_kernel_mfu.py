#!/usr/bin/env python
"""MFU of the compute-bound kernels: batched prefill and spec-decode verify.

The decode kernel's absolute number is bandwidth (bench_kernel_bw.py: GB/s
vs the chip's streaming ceiling).  This bench gives the MXU-bound paths
their absolute number: achieved FLOPs/s as a fraction of the v5e bf16 peak
(MFU), plus the HARD relative baseline — XLA's own dense causal attention
at identical shapes (``jax.nn.dot_product_attention``, implementation
"xla"), the compute path a non-paged TPU engine would use.  This mirrors
what vs_kernel_static does for decode in bench.py: an apples-to-apples
"what does the paging indirection cost" ratio, here for prefill/verify.

Methodology matches the reference's kernel-level attribution
(/root/reference/benchmarks/bench_layout/README.md §2): time ONLY the
attention op, chained inside one jit with a real data dependency so the
axon tunnel's ~30 ms/dispatch noise amortizes; per-call cost is the slope
between two chain lengths, median of 5.

FLOP convention (flash-attention papers): useful causal FLOPs only,
  4 * QH * D * sum_t (kv visible to query t)
(QK^T and PV, 2 matmuls x 2 FLOPs/MAC); softmax/masking excluded.  The
dense baseline is charged the SAME useful FLOPs, so `vs_xla_dense` is a
pure time ratio (>= 1.0 means the paged kernel is at least as fast as
XLA's dense attention on the identical problem).

Usage: python benchmarks/bench_kernel_mfu.py [--json]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from kvcached_tpu.ops.paged_attention import paged_attention_verify
from kvcached_tpu.ops.paged_prefill import paged_prefill_attention_batch

ON_TPU = jax.devices()[0].platform == "tpu"

# v5e (TPU v5 lite) bf16 peak: 197 TFLOP/s per chip
# (public spec, cloud.google.com/tpu/docs/v5e).
PEAK_FLOPS = {"TPU v5 lite": 197e12}


def _peak() -> float:
    kind = jax.devices()[0].device_kind
    return PEAK_FLOPS.get(kind, 197e12)


def _median_slope(call, k_lo, k_hi, reps=5):
    call(k_lo)  # warm both compiles
    call(k_hi)
    slopes = sorted((call(k_hi) - call(k_lo)) / (k_hi - k_lo) for _ in range(reps))
    return max(slopes[len(slopes) // 2], 1e-9)


def causal_flops(qh: int, d: int, q_starts, kv_lens, T: int) -> float:
    """Useful FLOPs of one batched causal attention call."""
    total = 0
    for qs, kl in zip(np.asarray(q_starts), np.asarray(kv_lens)):
        for i in range(T):
            vis = min(int(qs) + i + 1, int(kl))
            total += max(vis, 0)
    return 4.0 * qh * d * total


def bench_prefill(N: int, T: int, q_start: int, *, QH=16, KH=8, D=128, P=64,
                  L=1, reps=5):
    """One batched-prefill config; returns a result dict."""
    kv_len = q_start + T
    n_per = (kv_len + P - 1) // P
    NPAGES = max(N * n_per + 8, 8192 if ON_TPU else 64)
    rng = np.random.default_rng(0)
    perm = rng.permutation(np.arange(1, NPAGES))
    pt = jnp.asarray(perm[: N * n_per].reshape(N, n_per).astype(np.int32))
    k_pool = jax.random.normal(jax.random.PRNGKey(1), (L, NPAGES, KH, P, D), jnp.bfloat16)
    v_pool = jax.random.normal(jax.random.PRNGKey(2), (L, NPAGES, KH, P, D), jnp.bfloat16)
    q0 = jax.random.normal(jax.random.PRNGKey(3), (N, T, QH, D), jnp.bfloat16)
    q_starts = jnp.full((N,), q_start, jnp.int32)
    kv_lens = jnp.full((N,), kv_len, jnp.int32)

    @functools.partial(jax.jit, static_argnames=("K",))
    def chain_paged(q0, k_pool, v_pool, K):
        def one(q, _):
            out = paged_prefill_attention_batch(
                q, k_pool, v_pool, pt, q_starts, kv_lens, 0,
                interpret=not ON_TPU,
            )
            return (out * 1e-3 + q0).astype(q0.dtype), None
        q, _ = jax.lax.scan(one, q0, None, length=K)
        return q

    # Dense baseline at identical shapes: gather this sequence's KV into
    # contiguous [N, kv_len, KH, D] OUTSIDE the timed region (a dense
    # engine holds KV contiguously already), then XLA dense causal
    # attention.  Chunked prefill (q_start > 0) is expressed via an
    # explicit additive bias mask, the XLA-idiomatic form.
    #
    # Fairness: a single small cache would persist in VMEM across the
    # chained scan and clock impossible >1 TB/s effective reads (serving
    # caches are GB-scale and always stream from HBM — the paged side
    # streams a multi-GB pool).  The dense chain therefore rotates over R
    # distinct copies sized to bust VMEM; the leading-axis dynamic slice
    # fuses into the attention read (no extra copy).
    k_dense = (
        k_pool[0][pt].transpose(0, 1, 3, 2, 4)  # [N, n_per, P, KH, D]
        .reshape(N, n_per * P, KH, D)[:, :kv_len]
    )
    v_dense = (
        v_pool[0][pt].transpose(0, 1, 3, 2, 4)
        .reshape(N, n_per * P, KH, D)[:, :kv_len]
    )
    copy_bytes = 2 * N * kv_len * KH * D * 2  # K+V bf16
    R = max(1, min(-(-512_000_000 // copy_bytes), 256)) if ON_TPU else 1
    jitter = (1.0 + 1e-6 * jnp.arange(R, dtype=jnp.float32)).astype(jnp.bfloat16)
    k_all = k_dense[None] * jitter[:, None, None, None, None]
    v_all = v_dense[None] * jitter[:, None, None, None, None]

    neg = jnp.finfo(jnp.float32).min
    qpos = q_start + jnp.arange(T)
    kpos = jnp.arange(kv_len)
    bias = jnp.where(kpos[None, :] <= qpos[:, None], 0.0, neg).astype(jnp.float32)
    bias4 = bias[None, None]  # [1, 1, T, S]

    @functools.partial(jax.jit, static_argnames=("K",))
    def chain_dense(q0, k_all, v_all, K):
        def one(q, j):
            out = jax.nn.dot_product_attention(
                q, k_all[j % R], v_all[j % R], bias=bias4,
                implementation="xla",
            )
            return (out * 1e-3 + q0).astype(q0.dtype), None
        q, _ = jax.lax.scan(one, q0, jnp.arange(K))
        return q

    def call_paged(K):
        t0 = time.time()
        out = chain_paged(q0, k_pool, v_pool, K=K)
        float(jnp.sum(out.astype(jnp.float32)))
        return time.time() - t0

    def call_dense(K):
        t0 = time.time()
        out = chain_dense(q0, k_all, v_all, K=K)
        float(jnp.sum(out.astype(jnp.float32)))
        return time.time() - t0

    flops = causal_flops(QH, D, q_starts, kv_lens, T)
    # size chains so each leg has >=100 ms of work on the chip
    if ON_TPU:
        est = flops / (0.3 * _peak())
        k_lo = max(4, int(0.1 / max(est, 1e-6)))
        k_hi = 4 * k_lo
    else:
        k_lo, k_hi = 1, 2
    t_paged = _median_slope(call_paged, k_lo, k_hi, reps)
    t_dense = _median_slope(call_dense, k_lo, k_hi, reps)
    mfu = flops / t_paged / _peak()
    mfu_dense = flops / t_dense / _peak()
    return {
        "kernel": "batched_prefill",
        "N": N, "T": T, "q_start": q_start, "QH": QH, "KH": KH, "D": D,
        "us_per_call": round(t_paged * 1e6, 1),
        "tflops": round(flops / t_paged / 1e12, 2),
        "mfu_pct": round(100 * mfu, 1),
        "xla_dense_us": round(t_dense * 1e6, 1),
        "xla_dense_mfu_pct": round(100 * mfu_dense, 1),
        "vs_xla_dense": round(t_dense / t_paged, 3),
    }


def bench_verify(B: int, T: int, seq_len: int, *, QH=16, KH=8, D=128, P=64,
                 L=1, reps=5):
    """Spec-decode verify: T fed tokens against seq_len context per row.
    The paged kernel FUSES the KV write; the dense baseline is charged its
    own scatter-write into a dense cache (what a dense engine pays)."""
    n_per = (seq_len + P - 1) // P
    NPAGES = max(B * n_per + 8, 8192 if ON_TPU else 64)
    rng = np.random.default_rng(0)
    perm = rng.permutation(np.arange(1, NPAGES))
    pt = jnp.asarray(perm[: B * n_per].reshape(B, n_per).astype(np.int32))
    k_pool = jax.random.normal(jax.random.PRNGKey(1), (L, NPAGES, KH, P, D), jnp.bfloat16)
    v_pool = jax.random.normal(jax.random.PRNGKey(2), (L, NPAGES, KH, P, D), jnp.bfloat16)
    q0 = jax.random.normal(jax.random.PRNGKey(3), (B, T, QH, D), jnp.bfloat16)
    k_new = jax.random.normal(jax.random.PRNGKey(4), (B, T, KH, D), jnp.bfloat16)
    v_new = jax.random.normal(jax.random.PRNGKey(5), (B, T, KH, D), jnp.bfloat16)
    seq_lens = jnp.full((B,), seq_len, jnp.int32)
    positions = seq_len - T + jnp.arange(T)[None] + jnp.zeros((B, 1), jnp.int32)
    slot_pages = pt[jnp.arange(B)[:, None], positions // P]
    slot_offsets = positions % P

    @functools.partial(jax.jit, static_argnames=("K",))
    def chain_paged(q0, k_pool, v_pool, K):
        def one(carry, _):
            q, k_pool, v_pool = carry
            out, k_pool, v_pool = paged_attention_verify(
                q, k_pool, v_pool, pt, seq_lens, 0, k_new, v_new,
                slot_pages, slot_offsets, interpret=not ON_TPU,
            )
            return ((out * 1e-3 + q0).astype(q0.dtype), k_pool, v_pool), None
        (q, k_pool, v_pool), _ = jax.lax.scan(
            one, (q0, k_pool, v_pool), None, length=K)
        return q

    # rotating dense copies: same VMEM-persistence fairness fix as
    # bench_prefill (a 67 MB cache would otherwise sit in VMEM across the
    # chain and clock >1 TB/s); the dense engine's scatter-write of the T
    # fed tokens stays in the timed region, mirroring the fused write the
    # paged kernel performs
    k_dense0 = (
        k_pool[0][pt].transpose(0, 1, 3, 2, 4)
        .reshape(B, n_per * P, KH, D)[:, :seq_len]
    )
    v_dense0 = (
        v_pool[0][pt].transpose(0, 1, 3, 2, 4)
        .reshape(B, n_per * P, KH, D)[:, :seq_len]
    )
    copy_bytes = 2 * B * seq_len * KH * D * 2
    R = max(1, min(-(-512_000_000 // copy_bytes), 64)) if ON_TPU else 1
    jitter = (1.0 + 1e-6 * jnp.arange(R, dtype=jnp.float32)).astype(jnp.bfloat16)
    k_all0 = k_dense0[None] * jitter[:, None, None, None, None]
    v_all0 = v_dense0[None] * jitter[:, None, None, None, None]
    neg = jnp.finfo(jnp.float32).min
    qpos = seq_len - T + jnp.arange(T)
    kpos = jnp.arange(seq_len)
    bias4 = jnp.where(
        kpos[None, :] <= qpos[:, None], 0.0, neg
    ).astype(jnp.float32)[None, None]

    # no donation: repeated timed calls reuse k_all0/v_all0, so the first
    # in-chain write pays one full copy — a fixed per-call cost that
    # cancels in the two-chain-length slope
    @functools.partial(jax.jit, static_argnames=("K",))
    def chain_dense(q0, k_all, v_all, K):
        b_idx = jnp.arange(B)[:, None]
        def one(carry, j):
            q, k_all, v_all = carry
            jm = j % R
            k_all = k_all.at[jm, b_idx, positions].set(k_new)
            v_all = v_all.at[jm, b_idx, positions].set(v_new)
            out = jax.nn.dot_product_attention(
                q, k_all[jm], v_all[jm], bias=bias4, implementation="xla",
            )
            return ((out * 1e-3 + q0).astype(q0.dtype), k_all, v_all), None
        (q, k_all, v_all), _ = jax.lax.scan(
            one, (q0, k_all, v_all), jnp.arange(K))
        return q

    def call_paged(K):
        t0 = time.time()
        out = chain_paged(q0, k_pool, v_pool, K=K)
        float(jnp.sum(out.astype(jnp.float32)))
        return time.time() - t0

    def call_dense(K):
        t0 = time.time()
        out = chain_dense(q0, k_all0, v_all0, K=K)
        float(jnp.sum(out.astype(jnp.float32)))
        return time.time() - t0

    q_starts = jnp.full((B,), seq_len - T, jnp.int32)
    flops = causal_flops(QH, D, q_starts, seq_lens, T)
    # verify at small T is BANDWIDTH-bound (like decode): both sides read
    # the whole live KV once per call — report effective GB/s too
    live_bytes = 2 * B * seq_len * KH * D * 2
    k_lo, k_hi = (64, 512) if ON_TPU else (1, 2)
    t_paged = _median_slope(call_paged, k_lo, k_hi, reps)
    t_dense = _median_slope(call_dense, k_lo, k_hi, reps)
    return {
        "kernel": "verify",
        "B": B, "T": T, "seq_len": seq_len, "QH": QH, "KH": KH, "D": D,
        "us_per_call": round(t_paged * 1e6, 1),
        "tflops": round(flops / t_paged / 1e12, 2),
        "mfu_pct": round(100 * flops / t_paged / _peak(), 1),
        "gbps": round(live_bytes / t_paged / 1e9, 1),
        "xla_dense_us": round(t_dense * 1e6, 1),
        "xla_dense_gbps": round(live_bytes / t_dense / 1e9, 1),
        "xla_dense_mfu_pct": round(100 * flops / t_dense / _peak(), 1),
        "vs_xla_dense": round(t_dense / t_paged, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    if ON_TPU:
        prefill_cases = [
            (1, 512, 0), (8, 512, 0), (1, 2048, 0), (8, 2048, 0),
            (8, 512, 1536),  # chunked-prefill tail chunk (cache-hit shape)
        ]
        verify_cases = [(8, 8, 512), (8, 8, 2048), (8, 4, 2048)]
        kw: dict = {}
    else:  # smoke mode: interpret-mode kernels, minimum shapes
        prefill_cases = [(1, 32, 0)]
        verify_cases = [(1, 4, 32)]
        kw = dict(QH=2, KH=1, reps=1)

    rows = []
    for N, T, qs in prefill_cases:
        r = bench_prefill(N, T, qs, **kw)
        rows.append(r)
        print(json.dumps(r) if args.json else
              f"prefill N={N} T={T:5d} qs={qs:5d}: {r['us_per_call']:9.1f} us  "
              f"{r['tflops']:6.2f} TFLOP/s  MFU {r['mfu_pct']:5.1f}%  "
              f"(xla dense {r['xla_dense_us']:9.1f} us, "
              f"MFU {r['xla_dense_mfu_pct']:5.1f}%)  "
              f"vs_xla_dense {r['vs_xla_dense']:5.2f}x")
    for B, T, s in verify_cases:
        r = bench_verify(B, T, s, **kw)
        rows.append(r)
        print(json.dumps(r) if args.json else
              f"verify  B={B} T={T} seq={s:5d}: {r['us_per_call']:9.1f} us  "
              f"{r['gbps']:6.1f} GB/s  MFU {r['mfu_pct']:5.1f}%  "
              f"(xla dense {r['xla_dense_us']:9.1f} us, "
              f"{r['xla_dense_gbps']:6.1f} GB/s)  "
              f"vs_xla_dense {r['vs_xla_dense']:5.2f}x")
    return rows


if __name__ == "__main__":
    main()
