"""MLA (Multi-head Latent Attention) model family — DeepSeek-V2/V3 style.

The KV cache stores ONE compressed latent per token: ``c_kv`` (kv_lora_rank)
concatenated with the shared RoPE key — a single buffer, the reference's
``num_kv_buffers = 1`` MLA pool (``ElasticMLATokenToKVPool``,
sglang/patches.py:523-702).  Attention runs in the **absorbed** form:

    score_h(t) = (W_UK[h]ᵀ q_nope_h) · c_t  +  q_rope_h · k_rope_t
    out_h      = W_UV[h]ᵀ (Σ_t p_t c_t)

so the paged kernels see an MQA problem with one shared "kv head" whose
head_dim is ``kv_lora_rank + rope_dim`` (padded to a lane multiple) and
whose values are the first ``kv_lora_rank`` lanes of the same buffer —
``mla_v_dim`` mode in ops/paged_attention.py (half the DMA traffic of MHA).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.paged_attention import (
    paged_attention_decode,
    paged_attention_verify,
    write_prefill_kv_single,
)
from ..ops.paged_prefill import (
    paged_prefill_attention,
    paged_prefill_attention_batch,
)
from .llama import _maybe_psum, lm_head_logits, rms_norm, rope


def _pad128(x: int) -> int:
    return (x + 127) // 128 * 128


@dataclass(frozen=True)
class MLAConfig:
    vocab_size: int = 32000
    hidden_size: int = 2048
    num_layers: int = 16
    num_heads: int = 16
    kv_lora_rank: int = 512
    qk_nope_head_dim: int = 128
    qk_rope_head_dim: int = 64
    v_head_dim: int = 128
    q_lora_rank: int | None = None  # None = direct q projection
    intermediate_size: int = 5632
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5
    dtype: str = "bfloat16"

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    @property
    def latent_dim(self) -> int:
        """Unpadded cache entry: c_kv ++ k_rope."""
        return self.kv_lora_rank + self.qk_rope_head_dim

    @property
    def cache_head_dim(self) -> int:
        """Pool head_dim: latent padded to a 128-lane multiple."""
        return _pad128(self.latent_dim)

    @property
    def sm_scale(self) -> float:
        return 1.0 / math.sqrt(self.qk_nope_head_dim + self.qk_rope_head_dim)

    # kv geometry for the engine/pool
    @property
    def num_kv_heads(self) -> int:
        return 1

    @property
    def head_dim(self) -> int:
        return self.cache_head_dim

    @property
    def num_kv_buffers(self) -> int:
        return 1

    @classmethod
    def toy(cls, **kw):
        base = dict(
            vocab_size=512,
            hidden_size=256,
            num_layers=2,
            num_heads=4,
            kv_lora_rank=128,
            qk_nope_head_dim=64,
            qk_rope_head_dim=64,
            v_head_dim=64,
            intermediate_size=512,
        )
        base.update(kw)
        return cls(**base)


def init_mla_params(cfg: MLAConfig, key: jax.Array) -> dict:
    k = jax.random.split(key, 16)
    E, H, L = cfg.hidden_size, cfg.num_heads, cfg.num_layers
    R, NP, RP, V = (
        cfg.kv_lora_rank,
        cfg.qk_nope_head_dim,
        cfg.qk_rope_head_dim,
        cfg.v_head_dim,
    )
    F = cfg.intermediate_size
    dt = cfg.jdtype

    def init(key, shape, fan_in):
        return (
            jax.random.normal(key, shape, jnp.float32) / math.sqrt(fan_in)
        ).astype(dt)

    return {
        "embed": init(k[0], (cfg.vocab_size, E), E),
        "layers": {
            "attn_norm": jnp.ones((L, E), dt),
            # query path (direct, no q-lora for simplicity of the base family)
            "wq": init(k[1], (L, E, H * (NP + RP)), E),
            # kv latent path
            "w_dkv": init(k[2], (L, E, R), E),  # -> c_kv
            "w_kr": init(k[3], (L, E, RP), E),  # -> shared rope key
            "kv_norm": jnp.ones((L, R), dt),
            "w_uk": init(k[4], (L, H, NP, R), NP),  # absorb: nope -> latent
            "w_uv": init(k[5], (L, H, R, V), R),  # latent -> value
            "wo": init(k[6], (L, H * V, E), H * V),
            "mlp_norm": jnp.ones((L, E), dt),
            "w_gate": init(k[7], (L, E, F), E),
            "w_up": init(k[8], (L, E, F), E),
            "w_down": init(k[9], (L, F, E), F),
        },
        "final_norm": jnp.ones((E,), dt),
        "lm_head": init(k[10], (E, cfg.vocab_size), E),
    }


def _local_heads(cfg: MLAConfig, tp_axis: str | None) -> int:
    """Per-shard head count: under TP the q/uk/uv/wo projections shard on
    the head axis (the latent path and pool stay replicated — one shared
    kv head can't split)."""
    H = cfg.num_heads
    if tp_axis:
        H //= jax.lax.axis_size(tp_axis)
    return H


def _q_effective(cfg: MLAConfig, lp: dict, h: jax.Array, positions: jax.Array,
                 H: int | None = None):
    """Project hidden states to absorbed queries [T, H, cache_head_dim]."""
    T = h.shape[0]
    NP, RP, R = (
        cfg.qk_nope_head_dim,
        cfg.qk_rope_head_dim,
        cfg.kv_lora_rank,
    )
    H = cfg.num_heads if H is None else H
    q = (h @ lp["wq"]).reshape(T, H, NP + RP)
    q_nope, q_rope = q[..., :NP], q[..., NP:]
    q_rope = rope(q_rope, positions, cfg.rope_theta)
    # absorb W_UK: q_lat[t, h, r] = sum_n q_nope[t, h, n] * w_uk[h, n, r]
    q_lat = jnp.einsum("thn,hnr->thr", q_nope.astype(jnp.float32),
                       lp["w_uk"].astype(jnp.float32)).astype(h.dtype)
    pad = cfg.cache_head_dim - cfg.latent_dim
    q_eff = jnp.concatenate(
        [q_lat, q_rope]
        + ([jnp.zeros((T, H, pad), h.dtype)] if pad else []),
        axis=-1,
    )
    return q_eff


def _latent_entry(cfg: MLAConfig, lp: dict, h: jax.Array, positions: jax.Array):
    """Per-token cache entry [T, 1, cache_head_dim] = norm(c_kv) ++ rope(k_r)."""
    T = h.shape[0]
    c = rms_norm(h @ lp["w_dkv"], lp["kv_norm"], cfg.rms_eps)  # [T, R]
    k_r = (h @ lp["w_kr"]).reshape(T, 1, cfg.qk_rope_head_dim)
    k_r = rope(k_r, positions, cfg.rope_theta)[:, 0]
    pad = cfg.cache_head_dim - cfg.latent_dim
    ent = jnp.concatenate(
        [c, k_r] + ([jnp.zeros((T, pad), h.dtype)] if pad else []), axis=-1
    )
    return ent[:, None, :]  # kv-head axis of size 1


def _out_proj(cfg: MLAConfig, lp: dict, attn_lat: jax.Array,
              H: int | None = None) -> jax.Array:
    """attn_lat [T, H, kv_lora_rank] -> [T, H*v_head_dim] via W_UV."""
    o = jnp.einsum("thr,hrv->thv", attn_lat.astype(jnp.float32),
                   lp["w_uv"].astype(jnp.float32))
    T = attn_lat.shape[0]
    H = cfg.num_heads if H is None else H
    return o.reshape(T, H * cfg.v_head_dim).astype(attn_lat.dtype)


def mla_decode_step(
    params: dict,
    cfg: MLAConfig,
    tokens: jax.Array,  # [B]
    positions: jax.Array,  # [B]
    k_pools: jax.Array,  # [L, num_pages, 1, page_tokens, cache_head_dim]
    v_pools,  # ignored (None)
    page_tables: jax.Array,
    slot_pages: jax.Array,
    slot_offsets: jax.Array,
    seq_lens: jax.Array,
    *,
    tp_axis: str | None = None,
    interpret: bool = False,
    quant_scales: tuple | None = None,  # (k_scales, v_scales) [L, 1] f32
    collect_kv: bool = False,
):
    B = tokens.shape[0]
    R = cfg.kv_lora_rank
    H = _local_heads(cfg, tp_axis)
    k_scales, v_scales = quant_scales if quant_scales else (None, None)

    x = params["embed"][tokens]
    # tiny dummy: the MLA kernel variant never reads/aliases a V pool, but
    # the call signature is shared with MHA
    dummy_v = jnp.zeros((1, 1, 1, 1, 128), k_pools.dtype)

    def layer_fn(carry, layer):
        x, k_pools = carry
        lp, l_idx = layer["p"], layer["i"]

        h = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
        q_eff = _q_effective(cfg, lp, h, positions, H)  # [B, H, cache_dim]
        ent = _latent_entry(cfg, lp, h, positions)  # [B, 1, cache_dim]

        attn, k_pools, _ = paged_attention_decode(
            q_eff, k_pools, dummy_v, page_tables, seq_lens, l_idx,
            ent, ent, slot_pages, slot_offsets,
            sm_scale=cfg.sm_scale, interpret=interpret, mla_v_dim=R,
            k_scales=k_scales, v_scales=v_scales,
        )  # [B, H, cache_dim]; valid value lanes = [:R]
        attn_lat = attn[..., :R]
        attn_out = _out_proj(cfg, lp, attn_lat, H) @ lp["wo"]
        x = x + _maybe_psum(attn_out, tp_axis)

        h = rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
        mlp = (jax.nn.silu(h @ lp["w_gate"]) * (h @ lp["w_up"])) @ lp["w_down"]
        x = x + _maybe_psum(mlp, tp_axis)
        # the latent entry is the MLA analogue of (k, v) for dp-replica
        # equalization: it's computed from replicated inputs, so every tp
        # shard collects identical entries
        return (x, k_pools), (ent if collect_kv else None)

    layers = {"p": params["layers"], "i": jnp.arange(cfg.num_layers)}
    (x, k_pools), ents = jax.lax.scan(layer_fn, (x, k_pools), layers)

    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    logits = lm_head_logits(x, params["lm_head"], tp_axis)
    if collect_kv:
        return logits, k_pools, None, (ents, None)  # [L, B, 1, cache_dim]
    return logits, k_pools, None


def mla_verify_step(
    params: dict,
    cfg: MLAConfig,
    tokens: jax.Array,  # [B, T]: [last_token, draft_1 .. draft_{T-1}]
    positions: jax.Array,  # [B, T]
    k_pools: jax.Array,  # [L, num_pages, 1, page_tokens, cache_head_dim]
    v_pools,  # ignored (None)
    page_tables: jax.Array,
    slot_pages: jax.Array,  # [B, T] (0 = discard)
    slot_offsets: jax.Array,  # [B, T]
    seq_lens: jax.Array,  # [B] INCLUDING all T fed tokens
    *,
    tp_axis: str | None = None,
    interpret: bool = False,
    quant_scales: tuple | None = None,
    collect_kv: bool = False,
):
    """Speculative-decode verification for the MLA family: T tokens per
    sequence in one absorbed-attention pass over the single latent buffer
    (the spec-decode flow the reference's MLA pools accommodate,
    sglang/patches.py:523-702 + :714-956).  Returns
    (logits [B, T, vocab], k_pools, None)."""
    B, T = tokens.shape
    R = cfg.kv_lora_rank
    H = _local_heads(cfg, tp_axis)
    k_scales, v_scales = quant_scales if quant_scales else (None, None)

    x = params["embed"][tokens]  # [B, T, E]
    dummy_v = jnp.zeros((1, 1, 1, 1, 128), k_pools.dtype)

    def layer_fn(carry, layer):
        x, k_pools = carry
        lp, l_idx = layer["p"], layer["i"]

        h = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
        # the projection helpers are written over a single leading token
        # axis — flatten (B, T) through them
        h2 = h.reshape(B * T, -1)
        pos2 = positions.reshape(B * T)
        q_eff = _q_effective(cfg, lp, h2, pos2, H).reshape(
            B, T, H, cfg.cache_head_dim
        )
        ent = _latent_entry(cfg, lp, h2, pos2).reshape(
            B, T, 1, cfg.cache_head_dim
        )

        attn, k_pools, _ = paged_attention_verify(
            q_eff, k_pools, dummy_v, page_tables, seq_lens, l_idx,
            ent, ent, slot_pages, slot_offsets,
            sm_scale=cfg.sm_scale, interpret=interpret, mla_v_dim=R,
            k_scales=k_scales, v_scales=v_scales,
        )  # [B, T, H, cache_dim]; valid value lanes = [:R]
        attn_lat = attn[..., :R].reshape(B * T, H, R)
        attn_out = _out_proj(cfg, lp, attn_lat, H).reshape(B, T, -1) @ lp["wo"]
        x = x + _maybe_psum(attn_out, tp_axis)

        h = rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
        mlp = (jax.nn.silu(h @ lp["w_gate"]) * (h @ lp["w_up"])) @ lp["w_down"]
        x = x + _maybe_psum(mlp, tp_axis)
        return (x, k_pools), (ent if collect_kv else None)

    layers = {"p": params["layers"], "i": jnp.arange(cfg.num_layers)}
    (x, k_pools), ents = jax.lax.scan(layer_fn, (x, k_pools), layers)

    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    logits = lm_head_logits(x, params["lm_head"], tp_axis)
    if collect_kv:
        return logits, k_pools, None, (ents, None)  # [L, B, T, 1, cache_dim]
    return logits, k_pools, None


def mla_prefill_step(
    params: dict,
    cfg: MLAConfig,
    tokens: jax.Array,  # [T]
    positions: jax.Array,
    k_pools: jax.Array,
    v_pools,  # ignored (None)
    chunk_pages: jax.Array,
    page_table: jax.Array,
    q_start: jax.Array,
    true_len: jax.Array,
    *,
    tp_axis: str | None = None,
    interpret: bool = False,
    quant_scales: tuple | None = None,
):
    T = tokens.shape[0]
    R = cfg.kv_lora_rank
    H = _local_heads(cfg, tp_axis)
    kv_len = q_start + true_len
    k_scales, v_scales = quant_scales if quant_scales else (None, None)

    x = params["embed"][tokens]
    dummy_v = jnp.zeros((1, 1, 1, 1, 128), k_pools.dtype)

    def layer_fn(carry, layer):
        x, k_pools = carry
        lp, l_idx = layer["p"], layer["i"]

        h = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
        q_eff = _q_effective(cfg, lp, h, positions, H)  # [T, H, cache_dim]
        ent = _latent_entry(cfg, lp, h, positions)  # [T, 1, cache_dim]

        k_pools = write_prefill_kv_single(
            k_pools, ent.transpose(1, 0, 2), chunk_pages, l_idx,
            interpret=interpret,
            scale=k_scales[l_idx] if k_scales is not None else None,
        )
        attn = paged_prefill_attention(
            q_eff, k_pools, dummy_v, page_table, q_start, kv_len, l_idx,
            sm_scale=cfg.sm_scale, interpret=interpret, mla_v_dim=R,
            k_scales=k_scales, v_scales=v_scales,
        )  # [T, H, cache_dim]
        attn_lat = attn[..., :R]
        attn_out = _out_proj(cfg, lp, attn_lat, H) @ lp["wo"]
        x = x + _maybe_psum(attn_out, tp_axis)

        h = rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
        mlp = (jax.nn.silu(h @ lp["w_gate"]) * (h @ lp["w_up"])) @ lp["w_down"]
        x = x + _maybe_psum(mlp, tp_axis)
        return (x, k_pools), None

    layers = {"p": params["layers"], "i": jnp.arange(cfg.num_layers)}
    (x, k_pools), _ = jax.lax.scan(layer_fn, (x, k_pools), layers)

    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    last = x[jnp.maximum(true_len - 1, 0)]
    logits = lm_head_logits(last, params["lm_head"], tp_axis)
    return logits, k_pools, None


def mla_prefill_batch_step(
    params: dict,
    cfg: MLAConfig,
    tokens: jax.Array,  # [N, T] int32: N chunks padded to a shared bucket
    positions: jax.Array,  # [N, T]
    k_pools: jax.Array,
    v_pools,  # ignored (None)
    chunk_pages: jax.Array,  # [N, T // page_tokens] (0 = discard)
    page_tables: jax.Array,  # [N, max_pages]
    q_starts: jax.Array,  # [N]
    true_lens: jax.Array,  # [N] (0 = pad row)
    *,
    tp_axis: str | None = None,
    interpret: bool = False,
    quant_scales: tuple | None = None,
):
    """Batched MLA prefill: N sequences' chunks in one dispatch over the
    single latent buffer (same batching as llama_prefill_batch_step —
    rows are independent, pad rows discard via the zero page).  Returns
    (logits_last [N, vocab], k_pools, None)."""
    N, T = tokens.shape
    R = cfg.kv_lora_rank
    H = _local_heads(cfg, tp_axis)
    kv_lens = q_starts + true_lens
    k_scales, v_scales = quant_scales if quant_scales else (None, None)

    x = params["embed"][tokens]  # [N, T, E]
    dummy_v = jnp.zeros((1, 1, 1, 1, 128), k_pools.dtype)

    def layer_fn(carry, layer):
        x, k_pools = carry
        lp, l_idx = layer["p"], layer["i"]

        h = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
        h2 = h.reshape(N * T, -1)
        pos2 = positions.reshape(N * T)
        q_eff = _q_effective(cfg, lp, h2, pos2, H).reshape(
            N, T, H, cfg.cache_head_dim
        )
        ent = _latent_entry(cfg, lp, h2, pos2)  # [N*T, 1, cache_dim]

        k_pools = write_prefill_kv_single(
            k_pools, ent.transpose(1, 0, 2), chunk_pages.reshape(-1), l_idx,
            interpret=interpret,
            scale=k_scales[l_idx] if k_scales is not None else None,
        )
        attn = paged_prefill_attention_batch(
            q_eff, k_pools, dummy_v, page_tables, q_starts, kv_lens, l_idx,
            sm_scale=cfg.sm_scale, interpret=interpret, mla_v_dim=R,
            k_scales=k_scales, v_scales=v_scales,
        )  # [N, T, H, cache_dim]
        attn_lat = attn[..., :R].reshape(N * T, H, R)
        attn_out = _out_proj(cfg, lp, attn_lat, H).reshape(N, T, -1) @ lp["wo"]
        x = x + _maybe_psum(attn_out, tp_axis)

        h = rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
        mlp = (jax.nn.silu(h @ lp["w_gate"]) * (h @ lp["w_up"])) @ lp["w_down"]
        x = x + _maybe_psum(mlp, tp_axis)
        return (x, k_pools), None

    layers = {"p": params["layers"], "i": jnp.arange(cfg.num_layers)}
    (x, k_pools), _ = jax.lax.scan(layer_fn, (x, k_pools), layers)

    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    last = x[jnp.arange(N), jnp.maximum(true_lens - 1, 0)]
    logits = lm_head_logits(last, params["lm_head"], tp_axis)
    return logits, k_pools, None
