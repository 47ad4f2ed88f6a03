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

from ..ops.paged_attention import paged_attention, paged_attention_reference


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

    return {
        "embed": init(k[0], (cfg.vocab_size, E), E),
        "layers": {
            "attn_norm": jnp.ones((L, E), dt),
            "wq": init(k[1], (L, E, H * D), E),
            "wk": init(k[2], (L, E, KH * D), E),
            "wv": init(k[3], (L, E, KH * D), E),
            "wo": init(k[4], (L, H * D, E), H * D),
            "mlp_norm": jnp.ones((L, E), dt),
            "w_gate": init(k[5], (L, E, F), E),
            "w_up": init(k[6], (L, E, F), E),
            "w_down": init(k[7], (L, F, E), F),
        },
        "final_norm": jnp.ones((E,), dt),
        "lm_head": init(k[8], (E, cfg.vocab_size), E),
    }


def rms_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def rope(x: jax.Array, positions: jax.Array, theta: float) -> jax.Array:
    """Rotary embedding. x: [..., T, heads, head_dim], positions: [..., T]."""
    d = x.shape[-1]
    freqs = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    angles = positions[..., :, None].astype(jnp.float32) * freqs  # [..., T, d/2]
    cos = jnp.cos(angles)[..., :, None, :]  # broadcast over heads
    sin = jnp.sin(angles)[..., :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def _maybe_psum(x: jax.Array, tp_axis: str | None) -> jax.Array:
    return jax.lax.psum(x, tp_axis) if tp_axis else x


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
):
    """One decode token for each of B sequences.

    Returns (logits [B, vocab], k_pools, v_pools).  Page tables hold physical
    ids — the host translated virtual blocks through the allocator's page
    table before dispatch, so the device never sees the indirection cost.
    """
    B = tokens.shape[0]
    H, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    if tp_axis:
        tp = jax.lax.axis_size(tp_axis)
        H, KH = H // tp, KH // tp

    x = params["embed"][tokens]  # [B, E]

    def layer_fn(carry, layer):
        x, k_pools, v_pools = carry
        lp, l_idx = layer["p"], layer["i"]

        h = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
        q = (h @ lp["wq"]).reshape(B, H, D)
        k = (h @ lp["wk"]).reshape(B, KH, D)
        v = (h @ lp["wv"]).reshape(B, KH, D)
        # rope expects [..., T, heads, D]; decode has T folded into batch
        q = rope(q[:, None], positions[:, None], cfg.rope_theta)[:, 0]
        k = rope(k[:, None], positions[:, None], cfg.rope_theta)[:, 0]

        # write this token's K/V, then attend over everything incl. itself
        k_pools = k_pools.at[l_idx, slot_pages, :, slot_offsets, :].set(
            k.astype(k_pools.dtype)
        )
        v_pools = v_pools.at[l_idx, slot_pages, :, slot_offsets, :].set(
            v.astype(v_pools.dtype)
        )

        attn = paged_attention(
            q,
            k_pools[l_idx],
            v_pools[l_idx],
            page_tables,
            seq_lens,
            interpret=interpret,
        )  # [B, H, D]
        attn_out = attn.reshape(B, H * D) @ lp["wo"]
        x = x + _maybe_psum(attn_out, tp_axis)

        h = rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
        mlp = (jax.nn.silu(h @ lp["w_gate"]) * (h @ lp["w_up"])) @ lp["w_down"]
        x = x + _maybe_psum(mlp, tp_axis)
        return (x, k_pools, v_pools), None

    layers = {"p": params["layers"], "i": jnp.arange(cfg.num_layers)}
    (x, k_pools, v_pools), _ = jax.lax.scan(
        layer_fn, (x, k_pools, v_pools), layers
    )

    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    logits = (x @ params["lm_head"]).astype(jnp.float32)
    return logits, k_pools, v_pools


def llama_prefill_step(
    params: dict,
    cfg: LlamaConfig,
    tokens: jax.Array,  # [T] int32 (one sequence, padded)
    positions: jax.Array,  # [T] int32
    k_pools: jax.Array,
    v_pools: jax.Array,
    slot_pages: jax.Array,  # [T] int32 physical page per token
    slot_offsets: jax.Array,  # [T] int32
    true_len: jax.Array,  # [] int32 actual prompt length
    *,
    tp_axis: str | None = None,
):
    """Prefill one sequence: causal self-attention over the prompt, writing
    K/V into its pages.  Returns (logits_last [vocab], k_pools, v_pools).

    Padding tokens (index ≥ true_len) are causally masked out and their KV
    writes are redirected to the zero page (page 0) so the pool stays clean.
    """
    T = tokens.shape[0]
    H, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    if tp_axis:
        tp = jax.lax.axis_size(tp_axis)
        H, KH = H // tp, KH // tp
    group = H // KH
    sm_scale = 1.0 / math.sqrt(D)

    valid = jnp.arange(T) < true_len
    safe_pages = jnp.where(valid, slot_pages, 0)

    x = params["embed"][tokens]  # [T, E]
    causal = jnp.tril(jnp.ones((T, T), bool))
    mask = causal & valid[None, :]

    def layer_fn(carry, layer):
        x, k_pools, v_pools = carry
        lp, l_idx = layer["p"], layer["i"]

        h = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
        q = (h @ lp["wq"]).reshape(T, H, D)
        k = (h @ lp["wk"]).reshape(T, KH, D)
        v = (h @ lp["wv"]).reshape(T, KH, D)
        q = rope(q, positions, cfg.rope_theta)
        k = rope(k, positions, cfg.rope_theta)

        k_pools = k_pools.at[l_idx, safe_pages, :, slot_offsets, :].set(
            k.astype(k_pools.dtype)
        )
        v_pools = v_pools.at[l_idx, safe_pages, :, slot_offsets, :].set(
            v.astype(v_pools.dtype)
        )

        # dense causal attention over the prompt (fp32 softmax)
        qg = q.reshape(T, KH, group, D).astype(jnp.float32)
        kf = k.astype(jnp.float32)
        vf = v.astype(jnp.float32)
        s = jnp.einsum("tkgd,skd->ktgs", qg, kf) * sm_scale
        # s: [KH, T, group, T_kv] — mask over the kv axis
        s = jnp.where(mask[None, :, None, :], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        attn = jnp.einsum("ktgs,skd->tkgd", p, vf)  # [T, KH, group, D]
        attn_out = attn.reshape(T, H * D).astype(x.dtype) @ lp["wo"]
        x = x + _maybe_psum(attn_out, tp_axis)

        h = rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
        mlp = (jax.nn.silu(h @ lp["w_gate"]) * (h @ lp["w_up"])) @ lp["w_down"]
        x = x + _maybe_psum(mlp, tp_axis)
        return (x, k_pools, v_pools), None

    layers = {"p": params["layers"], "i": jnp.arange(cfg.num_layers)}
    (x, k_pools, v_pools), _ = jax.lax.scan(layer_fn, (x, k_pools, v_pools), layers)

    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    last = x[jnp.maximum(true_len - 1, 0)]
    logits = (last @ params["lm_head"]).astype(jnp.float32)
    return logits, k_pools, v_pools
