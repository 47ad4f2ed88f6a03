"""Hybrid-attention decoder: per-layer-group KV pools (full attention +
sliding-window groups).

The reference's hybrid story (gpt-oss-style models) runs one elastic KV pool
*per layer group*, each with its own geometry and lifetime: sliding-window
layers free pages that slid out of the window while full-attention layers
keep theirs (reference group multiton `csrc/allocator.cpp:101-114`, group
validation + attention-type inference
`kvcached/integration/vllm/patches.py:674-789`).

TPU-native form:

- Groups with identical per-page geometry (same layers-per-group, kv heads,
  page_tokens, head_dim) share ONE physical arena `[L_g, pages, KH, P, D]`
  and ONE free-list — pages are fungible across groups, so elasticity
  between groups is automatic.  Each group still has its own
  :class:`KVCacheManager` (virtual block space, page table, shm segment
  ``_g<id>``) — the reference's per-group accounting surface.
- The layer scan carries per-layer ``(group_idx, layer_in_group)`` arrays;
  attention dispatches through ``lax.switch`` over per-group branches, each
  closing over its group's STATIC window (Pallas kernels need static
  windows) and selecting its group's page table / write slot row.
- Config: ``layer_windows[l]`` = None (full attention) or window size.
  Groups are the distinct window values in order of first appearance.

The residual stream passes through layers in their original interleaved
order — only the KV bookkeeping is grouped.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.paged_attention import (
    paged_attention_decode,
    paged_attention_verify,
    write_prefill_kv,
)
from ..ops.paged_prefill import (
    paged_prefill_attention,
    paged_prefill_attention_batch,
)
from .llama import (
    init_llama_params,
    lm_head_logits,
    qkv_heads,
    rms_norm,
    rope,
)


@dataclass(frozen=True)
class HybridConfig:
    """Llama-shaped decoder with per-layer attention windows."""

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
    #: per-layer window: None = full attention, int = sliding window tokens.
    layer_windows: tuple = ()
    # ---- Gemma2-class structural knobs (all default to the Llama shape) --
    #: MLP activation: "silu" (Llama) or "gelu_tanh" (Gemma's
    #: gelu_pytorch_tanh)
    act: str = "silu"
    #: RMSNorm weight convention: effective weight = 1 + stored weight
    #: (Gemma); init stores zeros so the effective init is ones
    norm_offset: bool = False
    #: scale embeddings by sqrt(hidden_size) after lookup (Gemma)
    embed_scale: bool = False
    #: sandwich norms: post-attention and post-feedforward RMSNorms on the
    #: residual branches (Gemma2/3; params add post_attn_norm /
    #: post_ffw_norm, and mlp_norm maps to pre_feedforward_layernorm)
    post_norms: bool = False
    #: attention logit soft-capping cap*tanh(logits/cap) inside the paged
    #: kernels, pre-mask (Gemma2's attn_logit_softcapping)
    attn_softcap: float | None = None
    #: final LM-head logit soft-capping (Gemma2's final_logit_softcapping)
    final_softcap: float | None = None
    #: softmax scale = query_scale**-0.5 when set (Gemma2's
    #: query_pre_attn_scalar; None = 1/sqrt(head_dim))
    query_scale: float | None = None
    #: Qwen3/Gemma3-style per-head q/k RMSNorm (init_llama_params adds
    #: q_norm/k_norm, qkv_heads applies them)
    qk_norm: bool = False
    #: Qwen2-style additive qkv biases (init_llama_params adds bq/bk/bv,
    #: qkv_proj applies them) — lets per-layer-window Qwen2 checkpoints be
    #: expressed as this family, as the loader's mixed-window error suggests
    attention_bias: bool = False
    #: RoPE frequency scaling ("linear", factor) / ("llama3", ...) — see
    #: llama.rope_inv_freqs
    rope_scaling: tuple | None = None
    #: Gemma3-class per-group RoPE: sliding-window (local) layers use this
    #: base frequency UNSCALED, full-attention (global) layers use
    #: rope_theta + rope_scaling (HF rope_local_base_freq).  None = all
    #: layers share rope_theta/rope_scaling (Gemma2/Qwen shape).
    local_rope_theta: float | None = None

    def __post_init__(self):
        if len(self.layer_windows) != self.num_layers:
            raise ValueError(
                f"layer_windows must have {self.num_layers} entries, got "
                f"{len(self.layer_windows)}"
            )

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    @classmethod
    def toy(cls, num_layers: int = 4, window: int = 32, **kw):
        """Alternating full / sliding-window layers (the gpt-oss pattern)."""
        base = dict(
            vocab_size=512,
            hidden_size=256,
            num_layers=num_layers,
            num_heads=4,
            num_kv_heads=2,
            head_dim=128,
            intermediate_size=512,
            layer_windows=tuple(
                None if i % 2 == 0 else window for i in range(num_layers)
            ),
        )
        base.update(kw)
        return cls(**base)

    # ---- group structure ---------------------------------------------------

    @property
    def group_windows(self) -> tuple:
        """Distinct windows in order of first appearance (group g's window)."""
        seen: list = []
        for w in self.layer_windows:
            if w not in seen:
                seen.append(w)
        return tuple(seen)

    @property
    def group_index(self) -> tuple:
        """group id of each layer."""
        gw = self.group_windows
        return tuple(gw.index(w) for w in self.layer_windows)

    @property
    def layer_in_group(self) -> tuple:
        """Arena layer index of each layer (position within its group)."""
        counts = [0] * len(self.group_windows)
        out = []
        for g in self.group_index:
            out.append(counts[g])
            counts[g] += 1
        return tuple(out)

    @property
    def group_layer_counts(self) -> tuple:
        """Layers per group, in group order (Gemma3's 5:1 pattern gives
        e.g. (20, 4))."""
        gi = self.group_index
        return tuple(gi.count(g) for g in range(len(self.group_windows)))

    @property
    def equal_groups(self) -> bool:
        return len(set(self.group_layer_counts)) <= 1

    @property
    def layers_per_group(self) -> int:
        counts = self.group_layer_counts
        if len(set(counts)) != 1:
            raise ValueError(
                f"groups must have equal layer counts to share one arena, "
                f"got {counts}; unequal groups use per-group arenas "
                f"(engine allocates one pool per group)"
            )
        return counts[0]

    def rope_for_group(self, g: int) -> tuple:
        """(theta, scaling) for group g's layers: Gemma3-class local
        (sliding) groups use local_rope_theta unscaled; global groups —
        and every group when local_rope_theta is unset — use
        rope_theta + rope_scaling."""
        if self.local_rope_theta is not None and self.group_windows[g] is not None:
            return self.local_rope_theta, None
        return self.rope_theta, self.rope_scaling


def init_hybrid_params(cfg: HybridConfig, key: jax.Array) -> dict:
    # Llama-family pytree (stacked layers) + the Gemma extras
    p = init_llama_params(cfg, key)
    dt = cfg.jdtype
    L, E = cfg.num_layers, cfg.hidden_size
    if cfg.post_norms:
        p["layers"]["post_attn_norm"] = jnp.ones((L, E), dt)
        p["layers"]["post_ffw_norm"] = jnp.ones((L, E), dt)
    if cfg.norm_offset:
        # stored weight w acts as (1 + w): zeros give an effective init of 1.
        # q_norm/k_norm are exempt: qkv_heads applies them WITHOUT the
        # offset (the llama/qwen3 convention), so ones is their identity.
        for key_ in list(p["layers"]):
            if key_.endswith("norm") and key_ not in ("q_norm", "k_norm"):
                p["layers"][key_] = jnp.zeros_like(p["layers"][key_])
        p["final_norm"] = jnp.zeros_like(p["final_norm"])
    return p


def _maybe_psum(x, tp_axis):
    return jax.lax.psum(x, tp_axis) if tp_axis else x


def _norm(x, w, cfg):
    return rms_norm(x, (1.0 + w) if cfg.norm_offset else w, cfg.rms_eps)


def _embed(params, tokens, cfg):
    x = params["embed"][tokens]
    if cfg.embed_scale:
        x = x * jnp.asarray(math.sqrt(cfg.hidden_size)).astype(x.dtype)
    return x


def _sm_scale(cfg):
    return None if cfg.query_scale is None else cfg.query_scale ** -0.5


def _attn_residual(x, attn_flat, lp, cfg, tp_axis):
    """wo projection (+psum) with the optional Gemma post-attention norm
    on the BRANCH (norm after the full tp sum -- norms are nonlinear)."""
    out = _maybe_psum(attn_flat @ lp["wo"], tp_axis)
    if cfg.post_norms:
        out = _norm(out, lp["post_attn_norm"], cfg)
    return x + out


def _mlp_residual(x, lp, cfg, tp_axis):
    h = _norm(x, lp["mlp_norm"], cfg)
    act = (
        partial(jax.nn.gelu, approximate=True)
        if cfg.act == "gelu_tanh" else jax.nn.silu
    )
    mlp = _maybe_psum((act(h @ lp["w_gate"]) * (h @ lp["w_up"])) @ lp["w_down"],
                      tp_axis)
    if cfg.post_norms:
        mlp = _norm(mlp, lp["post_ffw_norm"], cfg)
    return x + mlp


def _cap_logits(logits, cfg):
    if cfg.final_softcap is not None:
        logits = cfg.final_softcap * jnp.tanh(logits / cfg.final_softcap)
    return logits


def _final_logits(x, params, cfg, tp_axis):
    x = _norm(x, params["final_norm"], cfg)
    return _cap_logits(lm_head_logits(x, params["lm_head"], tp_axis), cfg)


def _pool_g(pools, g: int):
    """Group g's arena: pools is either ONE shared arena array (equal
    layer groups) or a per-group tuple (unequal groups, e.g. Gemma3's
    5:1 local:global pattern — each group owns its own arena)."""
    return pools[g] if isinstance(pools, tuple) else pools


def _set_pool_g(pools, g: int, new):
    if isinstance(pools, tuple):
        return tuple(new if i == g else p for i, p in enumerate(pools))
    return new


def _group_scales(cfg, quant_scales, G: int):
    """int8 KV: split per-MODEL-layer scales ([L_model, KH] each) into
    per-group ARENA-shaped arrays ([L_g, KH]) the kernels index by
    arena layer.  Within a group, arena layer <-> model layer is a
    bijection (groups PARTITION the layer list — unlike colocated pp
    stages, nothing aliases), so a static gather per group is exact."""
    if quant_scales is None:
        return None, None
    gi = cfg.group_index
    ks, vs = quant_scales
    ksg, vsg = [], []
    for g in range(G):
        sel = jnp.asarray([i for i, gx in enumerate(gi) if gx == g],
                          jnp.int32)
        ksg.append(ks[sel])
        vsg.append(vs[sel])
    return tuple(ksg), tuple(vsg)


def hybrid_decode_step(
    params: dict,
    cfg: HybridConfig,
    tokens: jax.Array,  # [B]
    positions: jax.Array,  # [B]
    k_pools: jax.Array,  # [L_g, pages, KH, P, D] shared arena
    v_pools: jax.Array,
    page_tables: jax.Array,  # [G, B, max_pages] PHYSICAL ids per group
    slot_pages: jax.Array,  # [G, B] write page per group (0 = discard)
    slot_offsets: jax.Array,  # [B]
    seq_lens: jax.Array,  # [B] incl. current token
    *,
    tp_axis: str | None = None,
    interpret: bool = False,
    quant_scales: tuple | None = None,  # (k, v) scales [L_model, KH] f32
    collect_kv: bool = False,
):
    B = tokens.shape[0]
    # per-shard head counts come from the (possibly tp-sharded) weight
    # shapes, not cfg//tp: under MQA the single kv head REPLICATES across
    # tp (wk/wv full-width on every shard) while q heads shard — same
    # derivation as the llama step fns (models/llama.py)
    D = cfg.head_dim
    H = params["layers"]["wq"].shape[-1] // D
    KH = params["layers"]["wk"].shape[-1] // D
    windows = cfg.group_windows
    G = len(windows)
    int8_kv = jnp.dtype(_pool_g(k_pools, 0).dtype) == jnp.int8
    ksg, vsg = _group_scales(cfg, quant_scales, G)

    x = _embed(params, tokens, cfg)

    def layer_fn(carry, layer):
        x, k_pools, v_pools = carry
        lp = layer["p"]
        l_in_g = layer["lg"]
        g_idx = layer["g"]

        h = _norm(x, lp["attn_norm"], cfg)
        q, k, v = qkv_heads(h, lp, H, KH, D, cfg.rms_eps)

        def make_branch(g: int):
            w = windows[g]  # STATIC per branch (as are theta/scaling)
            theta, scaling = cfg.rope_for_group(g)

            def branch(ops):
                q, k, v, k_pools, v_pools = ops
                q = rope(q[:, None], positions[:, None], theta, scaling)[:, 0]
                k = rope(k[:, None], positions[:, None], theta, scaling)[:, 0]
                kp, vp = _pool_g(k_pools, g), _pool_g(v_pools, g)
                # int8: K/V stay unquantized — quantize-on-write happens
                # in-kernel with group g's per-(arena-layer, head) scales
                attn, kp, vp = paged_attention_decode(
                    q, kp, vp,
                    page_tables[g], seq_lens, l_in_g,
                    k if int8_kv else k.astype(kp.dtype),
                    v if int8_kv else v.astype(vp.dtype),
                    slot_pages[g], slot_offsets,
                    interpret=interpret, window=w,
                    sm_scale=_sm_scale(cfg),
                    logit_softcap=cfg.attn_softcap,
                    k_scales=ksg[g] if ksg else None,
                    v_scales=vsg[g] if vsg else None,
                )
                return (attn, k,
                        _set_pool_g(k_pools, g, kp),
                        _set_pool_g(v_pools, g, vp))

            return branch

        attn, k_roped, k_pools, v_pools = jax.lax.switch(
            g_idx, [make_branch(g) for g in range(G)],
            (q, k, v, k_pools, v_pools),
        )
        x = _attn_residual(x, attn.reshape(B, H * D), lp, cfg, tp_axis)
        x = _mlp_residual(x, lp, cfg, tp_axis)
        return (x, k_pools, v_pools), ((k_roped, v) if collect_kv else None)

    layers = {
        "p": params["layers"],
        "g": jnp.asarray(cfg.group_index, jnp.int32),
        "lg": jnp.asarray(cfg.layer_in_group, jnp.int32),
    }
    (x, k_pools, v_pools), kv = jax.lax.scan(
        layer_fn, (x, k_pools, v_pools), layers
    )

    logits = _final_logits(x, params, cfg, tp_axis)
    if collect_kv:
        return logits, k_pools, v_pools, kv  # per GLOBAL layer [L,B,KH,D]
    return logits, k_pools, v_pools


def hybrid_verify_step(
    params: dict,
    cfg: HybridConfig,
    tokens: jax.Array,  # [B, T]: [last_token, draft_1 .. draft_{T-1}]
    positions: jax.Array,  # [B, T]
    k_pools: jax.Array,  # [L_g, pages, KH, P, D] shared arena
    v_pools: jax.Array,
    page_tables: jax.Array,  # [G, B, max_pages] PHYSICAL ids per group
    slot_pages: jax.Array,  # [G, B, T] write page per group (0 = discard)
    slot_offsets: jax.Array,  # [B, T]
    seq_lens: jax.Array,  # [B] INCLUDING all T fed tokens
    *,
    tp_axis: str | None = None,
    interpret: bool = False,
    quant_scales: tuple | None = None,  # (k, v) scales [L_model, KH] f32
    collect_kv: bool = False,
):
    """Speculative-decode verification for hybrid layer groups: each layer
    verifies T tokens per row through its group's pages with the group's
    STATIC window (full-attention and sliding-window groups both draft —
    the per-query window mask in the verify kernel is the multi-token
    sibling of the decode branch above).  Returns
    (logits [B, T, vocab], k_pools, v_pools[, (k, v) per global layer])."""
    B, T = tokens.shape
    # per-shard head counts come from the (possibly tp-sharded) weight
    # shapes, not cfg//tp: under MQA the single kv head REPLICATES across
    # tp (wk/wv full-width on every shard) while q heads shard — same
    # derivation as the llama step fns (models/llama.py)
    D = cfg.head_dim
    H = params["layers"]["wq"].shape[-1] // D
    KH = params["layers"]["wk"].shape[-1] // D
    windows = cfg.group_windows
    G = len(windows)
    int8_kv = jnp.dtype(_pool_g(k_pools, 0).dtype) == jnp.int8
    ksg, vsg = _group_scales(cfg, quant_scales, G)

    x = _embed(params, tokens, cfg)  # [B, T, E]

    def layer_fn(carry, layer):
        x, k_pools, v_pools = carry
        lp = layer["p"]
        l_in_g = layer["lg"]
        g_idx = layer["g"]

        h = _norm(x, lp["attn_norm"], cfg)
        q, k, v = qkv_heads(h, lp, H, KH, D, cfg.rms_eps)

        def make_branch(g: int):
            w = windows[g]  # STATIC per branch (as are theta/scaling)
            theta, scaling = cfg.rope_for_group(g)

            def branch(ops):
                q, k, v, k_pools, v_pools = ops
                q = rope(q, positions, theta, scaling)
                k = rope(k, positions, theta, scaling)
                kp, vp = _pool_g(k_pools, g), _pool_g(v_pools, g)
                attn, kp, vp = paged_attention_verify(
                    q, kp, vp,
                    page_tables[g], seq_lens, l_in_g,
                    k if int8_kv else k.astype(kp.dtype),
                    v if int8_kv else v.astype(vp.dtype),
                    slot_pages[g], slot_offsets,
                    interpret=interpret, window=w,
                    sm_scale=_sm_scale(cfg),
                    logit_softcap=cfg.attn_softcap,
                    k_scales=ksg[g] if ksg else None,
                    v_scales=vsg[g] if vsg else None,
                )
                return (attn, k,
                        _set_pool_g(k_pools, g, kp),
                        _set_pool_g(v_pools, g, vp))

            return branch

        attn, k_roped, k_pools, v_pools = jax.lax.switch(
            g_idx, [make_branch(g) for g in range(G)],
            (q, k, v, k_pools, v_pools),
        )
        x = _attn_residual(x, attn.reshape(B, T, H * D), lp, cfg, tp_axis)
        x = _mlp_residual(x, lp, cfg, tp_axis)
        return (x, k_pools, v_pools), ((k_roped, v) if collect_kv else None)

    layers = {
        "p": params["layers"],
        "g": jnp.asarray(cfg.group_index, jnp.int32),
        "lg": jnp.asarray(cfg.layer_in_group, jnp.int32),
    }
    (x, k_pools, v_pools), kv = jax.lax.scan(
        layer_fn, (x, k_pools, v_pools), layers
    )

    logits = _final_logits(x, params, cfg, tp_axis)
    if collect_kv:
        return logits, k_pools, v_pools, kv  # per GLOBAL layer [L,B,T,KH,D]
    return logits, k_pools, v_pools


def hybrid_prefill_step(
    params: dict,
    cfg: HybridConfig,
    tokens: jax.Array,  # [T]
    positions: jax.Array,  # [T]
    k_pools: jax.Array,
    v_pools: jax.Array,
    chunk_pages: jax.Array,  # [G, T // page_tokens] per-group write pages
    page_table: jax.Array,  # [G, max_pages]
    q_start: jax.Array,
    true_len: jax.Array,
    *,
    tp_axis: str | None = None,
    interpret: bool = False,
    quant_scales: tuple | None = None,  # (k, v) scales [L_model, KH] f32
):
    T = tokens.shape[0]
    # per-shard head counts come from the (possibly tp-sharded) weight
    # shapes, not cfg//tp: under MQA the single kv head REPLICATES across
    # tp (wk/wv full-width on every shard) while q heads shard — same
    # derivation as the llama step fns (models/llama.py)
    D = cfg.head_dim
    H = params["layers"]["wq"].shape[-1] // D
    KH = params["layers"]["wk"].shape[-1] // D
    windows = cfg.group_windows
    G = len(windows)
    kv_len = q_start + true_len
    ksg, vsg = _group_scales(cfg, quant_scales, G)

    x = _embed(params, tokens, cfg)

    def layer_fn(carry, layer):
        x, k_pools, v_pools = carry
        lp = layer["p"]
        l_in_g = layer["lg"]
        g_idx = layer["g"]

        h = _norm(x, lp["attn_norm"], cfg)
        q, k, v = qkv_heads(h, lp, H, KH, D, cfg.rms_eps)

        def make_branch(g: int):
            w = windows[g]
            theta, scaling = cfg.rope_for_group(g)

            def branch(ops):
                q, k, v, k_pools, v_pools = ops
                q = rope(q, positions, theta, scaling)
                k = rope(k, positions, theta, scaling)
                kp, vp = _pool_g(k_pools, g), _pool_g(v_pools, g)
                kp, vp = write_prefill_kv(
                    kp, vp,
                    k.transpose(1, 0, 2), v.transpose(1, 0, 2),
                    chunk_pages[g], l_in_g, interpret=interpret,
                    k_scale=ksg[g][l_in_g] if ksg else None,
                    v_scale=vsg[g][l_in_g] if vsg else None,
                )
                attn = paged_prefill_attention(
                    q, kp, vp, page_table[g], q_start, kv_len,
                    l_in_g, interpret=interpret, window=w,
                    sm_scale=_sm_scale(cfg),
                    logit_softcap=cfg.attn_softcap,
                    k_scales=ksg[g] if ksg else None,
                    v_scales=vsg[g] if vsg else None,
                )
                return (attn,
                        _set_pool_g(k_pools, g, kp),
                        _set_pool_g(v_pools, g, vp))

            return branch

        attn, k_pools, v_pools = jax.lax.switch(
            g_idx, [make_branch(g) for g in range(G)],
            (q, k, v, k_pools, v_pools),
        )
        x = _attn_residual(x, attn.reshape(T, H * D), lp, cfg, tp_axis)
        x = _mlp_residual(x, lp, cfg, tp_axis)
        return (x, k_pools, v_pools), None

    layers = {
        "p": params["layers"],
        "g": jnp.asarray(cfg.group_index, jnp.int32),
        "lg": jnp.asarray(cfg.layer_in_group, jnp.int32),
    }
    (x, k_pools, v_pools), _ = jax.lax.scan(layer_fn, (x, k_pools, v_pools), layers)

    last = _norm(x, params["final_norm"], cfg)[jnp.maximum(true_len - 1, 0)]
    logits = _cap_logits(lm_head_logits(last, params["lm_head"], tp_axis), cfg)
    return logits, k_pools, v_pools


def hybrid_prefill_batch_step(
    params: dict,
    cfg: HybridConfig,
    tokens: jax.Array,  # [N, T] int32: N chunks padded to a shared bucket
    positions: jax.Array,  # [N, T]
    k_pools: jax.Array,
    v_pools: jax.Array,
    chunk_pages: jax.Array,  # [N, G, T // page_tokens] (0 = discard)
    page_tables: jax.Array,  # [N, G, max_pages]
    q_starts: jax.Array,  # [N]
    true_lens: jax.Array,  # [N] (0 = pad row)
    *,
    tp_axis: str | None = None,
    interpret: bool = False,
    quant_scales: tuple | None = None,  # (k, v) scales [L_model, KH] f32
):
    """Batched prefill across hybrid layer groups: N sequences' chunks in
    one dispatch, each layer writing through its GROUP's page row and
    masking with its group's static window — bit-identical to N serial
    hybrid_prefill_step calls (rows are independent in the kernel)."""
    N, T = tokens.shape
    # per-shard head counts come from the (possibly tp-sharded) weight
    # shapes, not cfg//tp: under MQA the single kv head REPLICATES across
    # tp (wk/wv full-width on every shard) while q heads shard — same
    # derivation as the llama step fns (models/llama.py)
    D = cfg.head_dim
    H = params["layers"]["wq"].shape[-1] // D
    KH = params["layers"]["wk"].shape[-1] // D
    windows = cfg.group_windows
    G = len(windows)
    kv_lens = q_starts + true_lens
    ksg, vsg = _group_scales(cfg, quant_scales, G)

    x = _embed(params, tokens, cfg)  # [N, T, E]

    def layer_fn(carry, layer):
        x, k_pools, v_pools = carry
        lp = layer["p"]
        l_in_g = layer["lg"]
        g_idx = layer["g"]

        h = _norm(x, lp["attn_norm"], cfg)
        q, k, v = qkv_heads(h, lp, H, KH, D, cfg.rms_eps)

        def make_branch(g: int):
            w = windows[g]
            theta, scaling = cfg.rope_for_group(g)

            def branch(ops):
                q, k, v, k_pools, v_pools = ops
                q = rope(q, positions, theta, scaling)
                k = rope(k, positions, theta, scaling)
                kp, vp = _pool_g(k_pools, g), _pool_g(v_pools, g)
                # batch flattens into one page stream (write pages are
                # sequence-agnostic; pad entries discard via page 0)
                kp, vp = write_prefill_kv(
                    kp, vp,
                    k.transpose(2, 0, 1, 3).reshape(KH, N * T, D),
                    v.transpose(2, 0, 1, 3).reshape(KH, N * T, D),
                    chunk_pages[:, g].reshape(-1), l_in_g,
                    interpret=interpret,
                    k_scale=ksg[g][l_in_g] if ksg else None,
                    v_scale=vsg[g][l_in_g] if vsg else None,
                )
                attn = paged_prefill_attention_batch(
                    q, kp, vp, page_tables[:, g],
                    q_starts, kv_lens, l_in_g,
                    interpret=interpret, window=w,
                    sm_scale=_sm_scale(cfg),
                    logit_softcap=cfg.attn_softcap,
                    k_scales=ksg[g] if ksg else None,
                    v_scales=vsg[g] if vsg else None,
                )
                return (attn,
                        _set_pool_g(k_pools, g, kp),
                        _set_pool_g(v_pools, g, vp))

            return branch

        attn, k_pools, v_pools = jax.lax.switch(
            g_idx, [make_branch(g) for g in range(G)],
            (q, k, v, k_pools, v_pools),
        )
        x = _attn_residual(x, attn.reshape(N, T, H * D), lp, cfg, tp_axis)
        x = _mlp_residual(x, lp, cfg, tp_axis)
        return (x, k_pools, v_pools), None

    layers = {
        "p": params["layers"],
        "g": jnp.asarray(cfg.group_index, jnp.int32),
        "lg": jnp.asarray(cfg.layer_in_group, jnp.int32),
    }
    (x, k_pools, v_pools), _ = jax.lax.scan(layer_fn, (x, k_pools, v_pools), layers)

    x = _norm(x, params["final_norm"], cfg)
    last = x[jnp.arange(N), jnp.maximum(true_lens - 1, 0)]  # [N, E]
    logits = _cap_logits(lm_head_logits(last, params["lm_head"], tp_axis), cfg)
    return logits, k_pools, v_pools
