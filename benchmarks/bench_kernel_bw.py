#!/usr/bin/env python
"""Effective KV bandwidth of the paged decode kernel (kernel-only).

Chained decode steps inside one jit (the axon tunnel adds ~30 ms per
dispatch and block_until_ready is unreliable — see verify skill); the
per-step cost is the slope between two chain lengths, and effective
bandwidth = live KV bytes read per step / step time.

Usage: python benchmarks/bench_kernel_bw.py [seq_len ...]
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from kvcached_tpu.ops.paged_attention import paged_attention_decode

ON_TPU = jax.devices()[0].platform == "tpu"


def bench_seq(seq_len: int, B: int = 8, KH: int = 8, QH: int = 16,
              P: int = 64, D: int = 128, reps: int = 3):
    n_per = seq_len // P
    # pool must dwarf VMEM (~128 MB on v5e) or XLA promotes it and the
    # "HBM" bandwidth reads come from VMEM — a 2 GB-class arena per buffer
    # matches real serving pools
    NPAGES = max(B * n_per + 8, 8192 if ON_TPU else 64)
    rng = np.random.default_rng(0)
    perm = rng.permutation(np.arange(1, NPAGES))
    pt = jnp.asarray(perm[: B * n_per].reshape(B, n_per).astype(np.int32))
    k_pool = jax.random.normal(jax.random.PRNGKey(1), (1, NPAGES, KH, P, D), jnp.bfloat16)
    v_pool = jax.random.normal(jax.random.PRNGKey(2), (1, NPAGES, KH, P, D), jnp.bfloat16)
    q0 = jax.random.normal(jax.random.PRNGKey(3), (B, QH, D), jnp.bfloat16)
    seq_lens = jnp.full((B,), seq_len, jnp.int32)
    slot_pages = pt[:, -1]
    slot_offsets = jnp.full((B,), (seq_len - 1) % P, jnp.int32)
    kv_new = jax.random.normal(jax.random.PRNGKey(4), (B, KH, D), jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("K",))
    def chain(q0, k_pool, v_pool, K):
        def one(carry, _):
            q, k_pool, v_pool = carry
            out, k_pool, v_pool = paged_attention_decode(
                q, k_pool, v_pool, pt, seq_lens, 0,
                kv_new, kv_new, slot_pages, slot_offsets,
                interpret=not ON_TPU,
            )
            # real data dependency so the loop cannot be hoisted
            q = (out * 1e-3 + q0).astype(q0.dtype)
            return (q, k_pool, v_pool), None
        (q, k_pool, v_pool), _ = jax.lax.scan(
            one, (q0, k_pool, v_pool), None, length=K)
        return q

    def call(K):
        t0 = time.time()
        out = chain(q0, k_pool, v_pool, K=K)
        float(jnp.sum(out.astype(jnp.float32)))
        return time.time() - t0

    # long chains: kernel steps are ~50 µs, tunnel jitter is ±5 ms — the
    # short-chain slope estimator is noise below ~100 ms of signal
    K_LO, K_HI = (256, 2048) if ON_TPU else (2, 4)
    call(K_LO)  # warm both compiles
    call(K_HI)
    slopes = sorted(
        (call(K_HI) - call(K_LO)) / (K_HI - K_LO) for _ in range(reps)
    )
    t_step = slopes[len(slopes) // 2]
    live_bytes = B * n_per * (KH * P * D * 2) * 2  # K+V, bf16
    bw = live_bytes / t_step
    print(f"B={B} seq={seq_len}: {t_step*1e6:8.1f} us/step  "
          f"{live_bytes/1e6:7.1f} MB live  ->  {bw/1e9:6.1f} GB/s effective")
    return bw


if __name__ == "__main__":
    seqs = [int(a) for a in sys.argv[1:]] or ([2048, 4096, 8192] if ON_TPU else [64])
    for s in seqs:
        bench_seq(s)
