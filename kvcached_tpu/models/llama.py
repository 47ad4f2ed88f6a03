"""Llama-family decoder (MHA/GQA + RoPE + SwiGLU) over the paged KV pool.

Written TPU-first as pure functions on parameter pytrees:

- layer parameters are **stacked** along a leading layer axis and the
  forward pass is a single ``lax.scan`` over layers — one layer traced once,
  so compile time is O(1) in depth;
- KV pools are functional state threaded through the scan and donated by the
  caller's jit, so writes lower to in-place scatters;
- tensor parallelism is explicit: run the step inside ``shard_map`` with
  ``tp_axis`` set and heads/ffn sharded; the two ``psum``s (after attention
  output proj and after MLP down proj) are the only collectives — the
  Megatron pattern expressed the JAX way.

The reference performs no model compute (it elasticizes vLLM/SGLang's KV);
here the model is part of the framework, consuming the same elastic pool.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.paged_attention import (
    paged_attention,
    paged_attention_decode,
    paged_attention_reference,
    paged_attention_verify,
    write_prefill_kv,
)
from ..ops.paged_prefill import (
    paged_prefill_attention,
    paged_prefill_attention_batch,
)


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 2048
    num_layers: int = 16
    num_heads: int = 16
    num_kv_heads: int = 8
    head_dim: int = 128
    intermediate_size: int = 5632
    rope_theta: float = 500000.0
    rms_eps: float = 1e-5
    dtype: str = "bfloat16"
    #: Mistral-style sliding-window attention (tokens); None = full attention.
    #: The engine reclaims pages that slide fully out of every window.
    sliding_window: int | None = None
    #: Qwen2-style additive biases on the q/k/v projections (the only
    #: architectural delta between Qwen2- and Llama-class checkpoints).
    attention_bias: bool = False
    #: Qwen3-style per-head RMSNorm on q/k (over head_dim, before rope) —
    #: the only architectural delta between Qwen3- and Llama-class
    #: checkpoints (Qwen3 drops Qwen2's qkv biases).
    qk_norm: bool = False
    #: RoPE frequency scaling (long-context checkpoints):
    #: ("linear", factor) or Llama-3.1's ("llama3", factor,
    #: low_freq_factor, high_freq_factor, original_max_position_embeddings).
    #: None = unscaled.  A tuple keeps the frozen config hashable.
    rope_scaling: tuple | None = None

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    @classmethod
    def toy(cls, **kw):
        base = dict(
            vocab_size=512,
            hidden_size=256,
            num_layers=2,
            num_heads=4,
            num_kv_heads=2,
            head_dim=128,
            intermediate_size=512,
        )
        base.update(kw)
        return cls(**base)

    @classmethod
    def llama3_8b(cls):
        return cls(
            vocab_size=128256,
            hidden_size=4096,
            num_layers=32,
            num_heads=32,
            num_kv_heads=8,
            head_dim=128,
            intermediate_size=14336,
        )

    @classmethod
    def llama31_8b(cls):
        """Llama-3.1-8B: the 3.0 geometry + the llama3 long-context rope
        scaling its checkpoints are trained with."""
        import dataclasses

        return dataclasses.replace(
            cls.llama3_8b(),
            rope_scaling=("llama3", 8.0, 1.0, 4.0, 8192.0),
        )


def init_llama_params(cfg: LlamaConfig, key: jax.Array) -> dict:
    """Random-init parameters; layer weights stacked on a leading axis."""
    k = jax.random.split(key, 10)
    E, H, KH, D, F, L = (
        cfg.hidden_size,
        cfg.num_heads,
        cfg.num_kv_heads,
        cfg.head_dim,
        cfg.intermediate_size,
        cfg.num_layers,
    )
    dt = cfg.jdtype

    def init(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32) / math.sqrt(fan_in)).astype(dt)

    layers = {
        "attn_norm": jnp.ones((L, E), dt),
        "wq": init(k[1], (L, E, H * D), E),
        "wk": init(k[2], (L, E, KH * D), E),
        "wv": init(k[3], (L, E, KH * D), E),
        "wo": init(k[4], (L, H * D, E), H * D),
        "mlp_norm": jnp.ones((L, E), dt),
        "w_gate": init(k[5], (L, E, F), E),
        "w_up": init(k[6], (L, E, F), E),
        "w_down": init(k[7], (L, F, E), F),
    }
    # getattr: duck-typed configs (HybridConfig) reuse this initializer
    if getattr(cfg, "attention_bias", False):
        layers["bq"] = init(k[9], (L, H * D), H * D)
        bk, bv = jax.random.split(k[9])
        layers["bk"] = init(bk, (L, KH * D), KH * D)
        layers["bv"] = init(bv, (L, KH * D), KH * D)
    if getattr(cfg, "qk_norm", False):
        layers["q_norm"] = jnp.ones((L, D), dt)
        layers["k_norm"] = jnp.ones((L, D), dt)
    return {
        "embed": init(k[0], (cfg.vocab_size, E), E),
        "layers": layers,
        "final_norm": jnp.ones((E,), dt),
        "lm_head": init(k[8], (E, cfg.vocab_size), E),
    }


def rms_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def rope_inv_freqs(d: int, theta: float, scaling: tuple | None) -> jax.Array:
    """Inverse frequencies with optional long-context scaling.

    ``("llama3", factor, low_f, high_f, orig_max)`` is transformers'
    _compute_llama3_parameters: long wavelengths (> orig/low_f) divide by
    factor, short ones (< orig/high_f) stay, the band between blends —
    Llama-3.1/3.2 checkpoints are trained WITH this; loading them unscaled
    skews every position past ~orig_max/2pi cycles."""
    freqs = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    if scaling is None:
        return freqs
    kind = scaling[0]
    if kind == "linear":
        return freqs / scaling[1]
    if kind == "llama3":
        _, factor, low_f, high_f, orig = scaling
        wavelen = 2.0 * math.pi / freqs
        smooth = (orig / wavelen - low_f) / (high_f - low_f)
        blended = (1.0 - smooth) * freqs / factor + smooth * freqs
        return jnp.where(
            wavelen > orig / low_f, freqs / factor,
            jnp.where(wavelen < orig / high_f, freqs, blended),
        )
    raise ValueError(f"unsupported rope scaling {kind!r}")


def rope(
    x: jax.Array, positions: jax.Array, theta: float,
    scaling: tuple | None = None,
) -> jax.Array:
    """Rotary embedding. x: [..., T, heads, head_dim], positions: [..., T]."""
    d = x.shape[-1]
    freqs = rope_inv_freqs(d, theta, scaling)
    angles = positions[..., :, None].astype(jnp.float32) * freqs  # [..., T, d/2]
    cos = jnp.cos(angles)[..., :, None, :]  # broadcast over heads
    sin = jnp.sin(angles)[..., :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def _maybe_psum(x: jax.Array, tp_axis: str | None) -> jax.Array:
    return jax.lax.psum(x, tp_axis) if tp_axis else x


def qkv_proj(h: jax.Array, lp: dict) -> tuple[jax.Array, jax.Array, jax.Array]:
    """q/k/v projections, flat on the last axis ([..., H*D] / [..., KH*D]).

    Adds the Qwen2-class additive biases when the layer tree carries them
    (``bq``/``bk``/``bv``); the pytree structure is static per trace, so the
    branch costs nothing under jit.  Under TP the biases are column-sharded
    exactly like their matrices' output axes."""
    q, k, v = h @ lp["wq"], h @ lp["wk"], h @ lp["wv"]
    if "bq" in lp:
        q, k, v = q + lp["bq"], k + lp["bk"], v + lp["bv"]
    return q, k, v


def qkv_heads(
    h: jax.Array, lp: dict, H: int, KH: int, D: int, eps: float
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-head q/k/v, PRE-rope: projection (+Qwen2 biases via
    :func:`qkv_proj`), head split, and the Qwen3-class per-head RMSNorm on
    q/k when the layer tree carries ``q_norm``/``k_norm`` ([D] vectors
    normalizing over head_dim, shared by all heads).  ``h``'s leading dims
    are preserved: [B,E] → [B,H,D], [N,T,E] → [N,T,H,D], etc."""
    q, k, v = qkv_proj(h, lp)
    lead = h.shape[:-1]
    q = q.reshape(*lead, H, D)
    k = k.reshape(*lead, KH, D)
    v = v.reshape(*lead, KH, D)
    if "q_norm" in lp:
        q = rms_norm(q, lp["q_norm"], eps)
        k = rms_norm(k, lp["k_norm"], eps)
    return q, k, v


def lm_head_logits(
    x: jax.Array, lm_head: jax.Array, tp_axis: str | None
) -> jax.Array:
    """Project to vocab logits.  Under TP the LM head is column-sharded on
    the vocab axis (PartitionSpec (None, tp)): each shard computes its
    logit slice and the slices are all-gathered — bitwise identical to the
    replicated matmul (each output column is the same dot product), at
    1/tp the per-chip weight memory (≈1 GB saved on a 128k-vocab 8B)."""
    logits = (x @ lm_head).astype(jnp.float32)
    if tp_axis:
        logits = jax.lax.all_gather(logits, tp_axis, axis=-1, tiled=True)
    return logits


def llama_decode_step(
    params: dict,
    cfg: LlamaConfig,
    tokens: jax.Array,  # [B] int32
    positions: jax.Array,  # [B] int32 (0-based index of this token)
    k_pools: jax.Array,  # [L, num_pages, KH, page_tokens, D]
    v_pools: jax.Array,
    page_tables: jax.Array,  # [B, max_pages] int32 PHYSICAL page ids
    slot_pages: jax.Array,  # [B] int32 physical page for this token
    slot_offsets: jax.Array,  # [B] int32 slot within that page
    seq_lens: jax.Array,  # [B] int32 length INCLUDING this token
    *,
    tp_axis: str | None = None,
    interpret: bool = False,
    quant_scales: tuple | None = None,  # (k_scales, v_scales) [L, KH] f32
    collect_kv: bool = False,
):
    """One decode token for each of B sequences.

    Returns (logits [B, vocab], k_pools, v_pools).  Page tables hold physical
    ids — the host translated virtual blocks through the allocator's page
    table before dispatch, so the device never sees the indirection cost.

    int8 pools: pass ``quant_scales`` — K/V reach the kernel unquantized
    and are quantized in-kernel with the per-head scales.

    ``collect_kv``: also return the per-layer (k, v) written this step —
    ``(ks, vs)`` each [L, B, KH, D] in compute dtype — so a dp-meshed
    caller can replay them into every dp replica (ops/paged_attention.py
    write_decode_tokens keeps replicas bit-identical).
    """
    B = tokens.shape[0]
    # per-shard head counts come from the (possibly tp-sharded) weight
    # shapes, not cfg//tp: under MQA the kv head REPLICATES across tp
    # (wk/wv full-width on every shard) while q heads shard
    D = cfg.head_dim
    H = params["layers"]["wq"].shape[-1] // D
    KH = params["layers"]["wk"].shape[-1] // D
    int8_kv = jnp.dtype(k_pools.dtype) == jnp.int8
    k_scales, v_scales = quant_scales if quant_scales else (None, None)

    x = params["embed"][tokens]  # [B, E]

    def layer_fn(carry, layer):
        x, k_pools, v_pools = carry
        lp, l_idx = layer["p"], layer["i"]

        h = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
        q, k, v = qkv_heads(h, lp, H, KH, D, cfg.rms_eps)
        # rope expects [..., T, heads, D]; decode has T folded into batch
        q = rope(q[:, None], positions[:, None], cfg.rope_theta,
                 getattr(cfg, "rope_scaling", None))[:, 0]
        k = rope(k[:, None], positions[:, None], cfg.rope_theta,
                 getattr(cfg, "rope_scaling", None))[:, 0]

        # fused kernel: write this token's K/V into its page (in-place via
        # buffer aliasing), then attend over everything incl. itself.
        # int8 pools: K/V stay unquantized here — quantize-on-write happens
        # in-kernel with the per-head scales
        attn, k_pools, v_pools = paged_attention_decode(
            q,
            k_pools,
            v_pools,
            page_tables,
            seq_lens,
            l_idx,
            k if int8_kv else k.astype(k_pools.dtype),
            v if int8_kv else v.astype(v_pools.dtype),
            slot_pages,
            slot_offsets,
            interpret=interpret,
            window=cfg.sliding_window,
            k_scales=k_scales,
            v_scales=v_scales,
        )  # [B, H, D]
        attn_out = attn.reshape(B, H * D) @ lp["wo"]
        x = x + _maybe_psum(attn_out, tp_axis)

        h = rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
        mlp = (jax.nn.silu(h @ lp["w_gate"]) * (h @ lp["w_up"])) @ lp["w_down"]
        x = x + _maybe_psum(mlp, tp_axis)
        return (x, k_pools, v_pools), ((k, v) if collect_kv else None)

    layers = {"p": params["layers"], "i": jnp.arange(cfg.num_layers)}
    (x, k_pools, v_pools), kv = jax.lax.scan(
        layer_fn, (x, k_pools, v_pools), layers
    )

    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    logits = lm_head_logits(x, params["lm_head"], tp_axis)
    if collect_kv:
        return logits, k_pools, v_pools, kv  # ([L,B,KH,D], [L,B,KH,D])
    return logits, k_pools, v_pools


def llama_verify_step(
    params: dict,
    cfg: LlamaConfig,
    tokens: jax.Array,  # [B, T] int32: [last_token, draft_1 .. draft_{T-1}]
    positions: jax.Array,  # [B, T] int32
    k_pools: jax.Array,
    v_pools: jax.Array,
    page_tables: jax.Array,  # [B, max_pages] PHYSICAL ids
    slot_pages: jax.Array,  # [B, T] write page per fed token (0 = discard)
    slot_offsets: jax.Array,  # [B, T]
    seq_lens: jax.Array,  # [B] int32 length INCLUDING all T fed tokens
    *,
    tp_axis: str | None = None,
    interpret: bool = False,
    quant_scales: tuple | None = None,
    collect_kv: bool = False,
):
    """Speculative-decode verification: process T tokens per sequence in ONE
    forward pass (weights stream once for T tokens instead of T times),
    writing their KV and returning logits at every position —
    (logits [B, T, vocab], k_pools, v_pools).  The host accepts the longest
    draft prefix matching the model's own argmax (reference context: the
    host engines' spec-decode flow the elastic pools must accommodate,
    sglang/patches.py:714-956)."""
    B, T = tokens.shape
    # per-shard head counts come from the (possibly tp-sharded) weight
    # shapes, not cfg//tp: under MQA the kv head REPLICATES across tp
    # (wk/wv full-width on every shard) while q heads shard
    D = cfg.head_dim
    H = params["layers"]["wq"].shape[-1] // D
    KH = params["layers"]["wk"].shape[-1] // D
    int8_kv = jnp.dtype(k_pools.dtype) == jnp.int8
    k_scales, v_scales = quant_scales if quant_scales else (None, None)

    x = params["embed"][tokens]  # [B, T, E]

    def layer_fn(carry, layer):
        x, k_pools, v_pools = carry
        lp, l_idx = layer["p"], layer["i"]

        h = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
        q, k, v = qkv_heads(h, lp, H, KH, D, cfg.rms_eps)
        q = rope(q, positions, cfg.rope_theta,
                 getattr(cfg, "rope_scaling", None))
        k = rope(k, positions, cfg.rope_theta,
                 getattr(cfg, "rope_scaling", None))

        attn, k_pools, v_pools = paged_attention_verify(
            q,
            k_pools,
            v_pools,
            page_tables,
            seq_lens,
            l_idx,
            k if int8_kv else k.astype(k_pools.dtype),
            v if int8_kv else v.astype(v_pools.dtype),
            slot_pages,
            slot_offsets,
            interpret=interpret,
            window=cfg.sliding_window,
            k_scales=k_scales,
            v_scales=v_scales,
        )  # [B, T, H, D]
        attn_out = attn.reshape(B, T, H * D) @ lp["wo"]
        x = x + _maybe_psum(attn_out, tp_axis)

        h = rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
        mlp = (jax.nn.silu(h @ lp["w_gate"]) * (h @ lp["w_up"])) @ lp["w_down"]
        x = x + _maybe_psum(mlp, tp_axis)
        return (x, k_pools, v_pools), ((k, v) if collect_kv else None)

    layers = {"p": params["layers"], "i": jnp.arange(cfg.num_layers)}
    (x, k_pools, v_pools), kv = jax.lax.scan(
        layer_fn, (x, k_pools, v_pools), layers
    )

    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    logits = lm_head_logits(x, params["lm_head"], tp_axis)  # [B, T, V]
    if collect_kv:
        return logits, k_pools, v_pools, kv  # ([L,B,T,KH,D], same)
    return logits, k_pools, v_pools


def llama_prefill_step(
    params: dict,
    cfg: LlamaConfig,
    tokens: jax.Array,  # [T] int32: the NEW chunk (after any prefix-cache hit),
    #                      padded to a bucket; T % page_tokens == 0
    positions: jax.Array,  # [T] int32 = q_start + arange(T)
    k_pools: jax.Array,
    v_pools: jax.Array,
    chunk_pages: jax.Array,  # [T // page_tokens] int32 physical page per chunk
    page_table: jax.Array,  # [max_pages] int32: FULL sequence physical pages
    q_start: jax.Array,  # [] int32: global position of tokens[0] (page-aligned)
    true_len: jax.Array,  # [] int32: actual number of new tokens in the chunk
    *,
    tp_axis: str | None = None,
    interpret: bool = False,
    quant_scales: tuple | None = None,  # (k_scales, v_scales) [L, KH] f32
):
    """Prefill one chunk of one sequence through the unified paged path:
    write the chunk's K/V into its pages (in place), then run causal paged
    flash attention over the whole sequence so far (cached prefix pages +
    this chunk).  Returns (logits_last [vocab], k_pools, v_pools).

    Because cache-hit and recompute share this exact code path, prefix
    caching is bit-identical to recomputation.  Padding chunks write to the
    zero page (defined-write discard, reference csrc/ftensor.cpp:160-176).
    """
    T = tokens.shape[0]
    # per-shard head counts come from the (possibly tp-sharded) weight
    # shapes, not cfg//tp: under MQA the kv head REPLICATES across tp
    # (wk/wv full-width on every shard) while q heads shard
    D = cfg.head_dim
    H = params["layers"]["wq"].shape[-1] // D
    KH = params["layers"]["wk"].shape[-1] // D
    kv_len = q_start + true_len

    x = params["embed"][tokens]  # [T, E]

    def layer_fn(carry, layer):
        x, k_pools, v_pools = carry
        lp, l_idx = layer["p"], layer["i"]

        h = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
        q, k, v = qkv_heads(h, lp, H, KH, D, cfg.rms_eps)
        q = rope(q, positions, cfg.rope_theta,
                 getattr(cfg, "rope_scaling", None))
        k = rope(k, positions, cfg.rope_theta,
                 getattr(cfg, "rope_scaling", None))

        k_sc, v_sc = (
            (quant_scales[0][l_idx], quant_scales[1][l_idx])
            if quant_scales else (None, None)
        )
        k_pools, v_pools = write_prefill_kv(
            k_pools, v_pools,
            k.transpose(1, 0, 2),  # [KH, T, D]
            v.transpose(1, 0, 2),
            chunk_pages, l_idx,
            interpret=interpret,
            k_scale=k_sc, v_scale=v_sc,
        )

        attn = paged_prefill_attention(
            q, k_pools, v_pools, page_table, q_start, kv_len, l_idx,
            interpret=interpret, window=cfg.sliding_window,
            k_scales=quant_scales[0] if quant_scales else None,
            v_scales=quant_scales[1] if quant_scales else None,
        )  # [T, H, D]
        attn_out = attn.reshape(T, H * D) @ lp["wo"]
        x = x + _maybe_psum(attn_out, tp_axis)

        h = rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
        mlp = (jax.nn.silu(h @ lp["w_gate"]) * (h @ lp["w_up"])) @ lp["w_down"]
        x = x + _maybe_psum(mlp, tp_axis)
        return (x, k_pools, v_pools), None

    layers = {"p": params["layers"], "i": jnp.arange(cfg.num_layers)}
    (x, k_pools, v_pools), _ = jax.lax.scan(layer_fn, (x, k_pools, v_pools), layers)

    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    last = x[jnp.maximum(true_len - 1, 0)]
    logits = lm_head_logits(last, params["lm_head"], tp_axis)
    return logits, k_pools, v_pools


def llama_prefill_batch_step(
    params: dict,
    cfg: LlamaConfig,
    tokens: jax.Array,  # [N, T] int32: N chunks padded to a shared bucket
    positions: jax.Array,  # [N, T] int32 = q_starts[:, None] + arange(T)
    k_pools: jax.Array,
    v_pools: jax.Array,
    chunk_pages: jax.Array,  # [N, T // page_tokens] int32 (0 = discard)
    page_tables: jax.Array,  # [N, max_pages] int32 full-sequence pages
    q_starts: jax.Array,  # [N] int32 global position of tokens[:, 0]
    true_lens: jax.Array,  # [N] int32 real new tokens per row (0 = pad row)
    *,
    tp_axis: str | None = None,
    interpret: bool = False,
    quant_scales: tuple | None = None,  # (k_scales, v_scales) [L, KH] f32
):
    """Prefill N sequences' chunks in ONE forward pass: the weights stream
    through HBM once for all N prompts and the host pays one dispatch
    instead of N (the reference's host engines batch prefills the same
    way).  Rows are independent — each writes through its own chunk_pages
    and masks with its own (q_start, true_len) — so the result is
    bit-identical to N serial :func:`llama_prefill_step` calls.  Padding
    rows (true_len 0, chunk_pages 0) write to the zero page and produce
    discarded logits.  Returns (logits_last [N, vocab], k_pools, v_pools).
    """
    N, T = tokens.shape
    # per-shard head counts come from the (possibly tp-sharded) weight
    # shapes, not cfg//tp: under MQA the kv head REPLICATES across tp
    # (wk/wv full-width on every shard) while q heads shard
    D = cfg.head_dim
    H = params["layers"]["wq"].shape[-1] // D
    KH = params["layers"]["wk"].shape[-1] // D
    kv_lens = q_starts + true_lens

    x = params["embed"][tokens]  # [N, T, E]

    def layer_fn(carry, layer):
        x, k_pools, v_pools = carry
        lp, l_idx = layer["p"], layer["i"]

        h = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
        q, k, v = qkv_heads(h, lp, H, KH, D, cfg.rms_eps)
        q = rope(q, positions, cfg.rope_theta,
                 getattr(cfg, "rope_scaling", None))
        k = rope(k, positions, cfg.rope_theta,
                 getattr(cfg, "rope_scaling", None))

        k_sc, v_sc = (
            (quant_scales[0][l_idx], quant_scales[1][l_idx])
            if quant_scales else (None, None)
        )
        # page writes don't care which sequence a page belongs to: flatten
        # the batch into one [KH, N*T, D] stream over [N * T/P] pages and
        # reuse the single-sequence writer kernel unchanged
        k_pools, v_pools = write_prefill_kv(
            k_pools, v_pools,
            k.transpose(2, 0, 1, 3).reshape(KH, N * T, D),
            v.transpose(2, 0, 1, 3).reshape(KH, N * T, D),
            chunk_pages.reshape(-1), l_idx,
            interpret=interpret,
            k_scale=k_sc, v_scale=v_sc,
        )

        attn = paged_prefill_attention_batch(
            q, k_pools, v_pools, page_tables, q_starts, kv_lens, l_idx,
            interpret=interpret, window=cfg.sliding_window,
            k_scales=quant_scales[0] if quant_scales else None,
            v_scales=quant_scales[1] if quant_scales else None,
        )  # [N, T, H, D]
        attn_out = attn.reshape(N, T, H * D) @ lp["wo"]
        x = x + _maybe_psum(attn_out, tp_axis)

        h = rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
        mlp = (jax.nn.silu(h @ lp["w_gate"]) * (h @ lp["w_up"])) @ lp["w_down"]
        x = x + _maybe_psum(mlp, tp_axis)
        return (x, k_pools, v_pools), None

    layers = {"p": params["layers"], "i": jnp.arange(cfg.num_layers)}
    (x, k_pools, v_pools), _ = jax.lax.scan(layer_fn, (x, k_pools, v_pools), layers)

    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    last = x[jnp.arange(N), jnp.maximum(true_lens - 1, 0)]  # [N, E]
    logits = lm_head_logits(last, params["lm_head"], tp_axis)
    return logits, k_pools, v_pools
