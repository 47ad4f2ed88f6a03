"""Hybrid-linear (attention + mamba) family: elastic per-sequence state
slots over the paged allocator.

The reference's largest integration block (ElasticMambaPool,
`kvcached/integration/sglang/patches.py:705-1111`; super-cell packing
`interfaces.py:178-401`): mamba layers hold per-SEQUENCE state (conv window
+ SSM state), not per-token KV, so the elastic unit is a **state slot**:

- Each sequence owns one slot for the whole model; a slot packs every mamba
  layer's conv+SSM state as one **super cell**, padded so an integer number
  of cells tiles each allocator page (`interfaces.py:257-293` — promised
  capacity must be deliverable).  Here the padding rounds the cell to the
  TPU lane width (128 elements) — the same divisibility contract in TPU
  units.
- Slots are blocks of a :class:`KVCacheManager` (block_tokens=1, page =
  ``slots_per_page`` slots), so `kvctl limit` elasticity, shm accounting,
  prealloc, and deferred shrink all apply to mamba state unchanged.
- Slot 0 is the null slot (reference slot-0 null block): padded batch rows
  point at it; writes there are dropped via scatter index -1.

State updates are pure XLA gather/update/scatter — states are tiny relative
to KV and are NOT consumed by Pallas kernels, so the scatter aliases in
place under donation (the pallas-aliasing restriction only binds pool
buffers fed to kernels).

The mamba mixer is a deliberately minimal selective-SSM (conv window +
diagonal state recurrence); the pool machinery, not the mixer flavor, is
the product here.  Prefill runs the recurrence as a ``lax.scan`` over
tokens.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.paged_attention import paged_attention_decode, write_prefill_kv
from ..ops.paged_prefill import paged_prefill_attention
from .llama import _maybe_psum, lm_head_logits, rms_norm, rope


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@dataclass(frozen=True)
class HybridLinearConfig:
    """Interleaved full-attention and mamba layers (Jamba-style)."""

    vocab_size: int = 32000
    hidden_size: int = 2048
    num_heads: int = 16
    num_kv_heads: int = 8
    head_dim: int = 128
    intermediate_size: int = 5632
    rope_theta: float = 500000.0
    rms_eps: float = 1e-5
    dtype: str = "bfloat16"
    #: per-layer kind: "attn" or "mamba"
    layer_types: tuple = ()
    # mamba mixer geometry
    d_inner: int = 512
    d_state: int = 16
    d_conv: int = 4

    def __post_init__(self):
        if not self.layer_types:
            raise ValueError("layer_types must be non-empty")
        bad = set(self.layer_types) - {"attn", "mamba"}
        if bad:
            raise ValueError(f"unknown layer types {bad}")

    @property
    def num_layers(self) -> int:
        return len(self.layer_types)

    @property
    def num_attn_layers(self) -> int:
        return self.layer_types.count("attn")

    @property
    def num_mamba_layers(self) -> int:
        return self.layer_types.count("mamba")

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    @classmethod
    def toy(cls, num_layers: int = 4, **kw):
        base = dict(
            vocab_size=512,
            hidden_size=256,
            num_heads=4,
            num_kv_heads=2,
            head_dim=128,
            intermediate_size=512,
            d_inner=128,
            d_state=8,
            d_conv=4,
            layer_types=tuple(
                "attn" if i % 2 == 0 else "mamba" for i in range(num_layers)
            ),
        )
        base.update(kw)
        return cls(**base)

    # ---- super-cell geometry (reference interfaces.py:178-401) ------------

    @property
    def conv_elems(self) -> int:
        return (self.d_conv - 1) * self.d_inner

    @property
    def ssm_elems(self) -> int:
        return self.d_inner * self.d_state

    @property
    def cell_elems(self) -> int:
        """Padded super cell: conv ++ ssm, rounded to the TPU lane width so
        cells tile pages exactly (the divisor-of-page padding contract)."""
        return _round_up(self.conv_elems + self.ssm_elems, 128)


@dataclass(frozen=True)
class StateSpec:
    """Geometry the engine needs to build the elastic state pool."""

    num_layers: int  # mamba layers
    cell_elems: int  # padded super-cell length (fp32 elements)
    slots_per_page: int = 8  # allocator page granularity (multiple of 8)


def init_hybrid_linear_params(cfg: HybridLinearConfig, key: jax.Array) -> dict:
    E, H, KH, D, F = (
        cfg.hidden_size, cfg.num_heads, cfg.num_kv_heads, cfg.head_dim,
        cfg.intermediate_size,
    )
    DI, DS, DC = cfg.d_inner, cfg.d_state, cfg.d_conv
    dt = cfg.jdtype
    keys = iter(jax.random.split(key, 8 * cfg.num_layers + 4))

    def init(shape, fan_in):
        return (
            jax.random.normal(next(keys), shape, jnp.float32) / math.sqrt(fan_in)
        ).astype(dt)

    layers = []
    for kind in cfg.layer_types:
        if kind == "attn":
            layers.append({
                "attn_norm": jnp.ones((E,), dt),
                "wq": init((E, H * D), E),
                "wk": init((E, KH * D), E),
                "wv": init((E, KH * D), E),
                "wo": init((H * D, E), H * D),
                "mlp_norm": jnp.ones((E,), dt),
                "w_gate": init((E, F), E),
                "w_up": init((E, F), E),
                "w_down": init((F, E), F),
            })
        else:
            layers.append({
                "norm": jnp.ones((E,), dt),
                "in_proj": init((E, 2 * DI), E),  # -> (x, gate)
                "conv_w": init((DC, DI), DC),
                "a_log": jnp.zeros((DI, DS), jnp.float32),
                "dt_proj": init((DI, DI), DI),
                "b_proj": init((DI, DS), DI),
                "c_proj": init((DI, DS), DI),
                "out_proj": init((DI, E), DI),
            })
    return {
        "embed": init((cfg.vocab_size, E), E),
        "layers": layers,  # heterogeneous: python list, loop-unrolled
        "final_norm": jnp.ones((E,), dt),
        "lm_head": init((E, cfg.vocab_size), E),
    }


# ---------------------------------------------------------------------------
# super-cell pack/unpack
# ---------------------------------------------------------------------------


def pack_cell(cfg, conv_state, ssm_state):
    """conv [.., DC-1, DI] + ssm [.., DI, DS] -> padded cell [.., cell]."""
    lead = conv_state.shape[:-2]
    flat = jnp.concatenate(
        [conv_state.reshape(*lead, -1), ssm_state.reshape(*lead, -1)], -1
    )
    pad = cfg.cell_elems - flat.shape[-1]
    if pad:
        flat = jnp.pad(flat, [(0, 0)] * len(lead) + [(0, pad)])
    return flat


def unpack_cell(cfg, cell):
    lead = cell.shape[:-1]
    conv = cell[..., : cfg.conv_elems].reshape(
        *lead, cfg.d_conv - 1, cfg.d_inner
    )
    ssm = cell[..., cfg.conv_elems : cfg.conv_elems + cfg.ssm_elems].reshape(
        *lead, cfg.d_inner, cfg.d_state
    )
    return conv, ssm


# ---------------------------------------------------------------------------
# mamba mixer (single layer)
# ---------------------------------------------------------------------------


def _mixer_decode(cfg, lp, h, conv_state, ssm_state):
    """One token through the mixer.  h: [B, E].  States per batch row."""
    xz = h @ lp["in_proj"]  # [B, 2*DI]
    x, gate = jnp.split(xz, 2, axis=-1)
    x = x.astype(jnp.float32)
    # conv window: state holds the last DC-1 inputs
    window = jnp.concatenate([conv_state, x[:, None, :]], axis=1)  # [B, DC, DI]
    y = jnp.einsum("bcd,cd->bd", window, lp["conv_w"].astype(jnp.float32))
    y = jax.nn.silu(y)
    new_conv = window[:, 1:, :]
    # selective SSM (diagonal): s' = exp(-dt*A) * s + dt * (y ⊗ B); out = s'·C
    dt_ = jax.nn.softplus(y @ lp["dt_proj"].astype(jnp.float32))  # [B, DI]
    B_ = y @ lp["b_proj"].astype(jnp.float32)  # [B, DS]
    C_ = y @ lp["c_proj"].astype(jnp.float32)  # [B, DS]
    decay = jnp.exp(-dt_[..., None] * jnp.exp(lp["a_log"])[None])  # [B, DI, DS]
    new_ssm = decay * ssm_state + (dt_ * y)[..., None] * B_[:, None, :]
    out = jnp.einsum("bds,bs->bd", new_ssm, C_)
    out = out * jax.nn.silu(gate.astype(jnp.float32))
    return (out @ lp["out_proj"].astype(jnp.float32)).astype(h.dtype), new_conv, new_ssm


def _mixer_prefill(cfg, lp, hs, conv0, ssm0):
    """T tokens through the mixer from ``(conv0, ssm0)``.  hs: [T, E].
    Returns (out [T, E], per-position conv states, per-position ssm states)
    — the caller selects the state at the last REAL token of a padded
    chunk (chunked prefill resumes from the stored slot state)."""
    xz = hs @ lp["in_proj"]
    x, gate = jnp.split(xz, 2, axis=-1)
    x = x.astype(jnp.float32)

    def step(carry, xt):
        conv_state, ssm_state = carry
        window = jnp.concatenate([conv_state, xt[None]], axis=0)  # [DC, DI]
        y = jnp.einsum("cd,cd->d", window, lp["conv_w"].astype(jnp.float32))
        y = jax.nn.silu(y)
        dt_ = jax.nn.softplus(y @ lp["dt_proj"].astype(jnp.float32))
        B_ = y @ lp["b_proj"].astype(jnp.float32)
        C_ = y @ lp["c_proj"].astype(jnp.float32)
        decay = jnp.exp(-dt_[:, None] * jnp.exp(lp["a_log"]))
        ssm_state = decay * ssm_state + (dt_ * y)[:, None] * B_[None]
        out = ssm_state @ C_
        return (window[1:], ssm_state), (out, window[1:], ssm_state)

    _, (outs, convs, ssms) = jax.lax.scan(step, (conv0, ssm0), x)
    outs = outs * jax.nn.silu(gate.astype(jnp.float32))
    return (
        (outs @ lp["out_proj"].astype(jnp.float32)).astype(hs.dtype),
        convs,
        ssms,
    )


# ---------------------------------------------------------------------------
# full steps
# ---------------------------------------------------------------------------


def hybrid_linear_decode_step(
    params: dict,
    cfg: HybridLinearConfig,
    tokens: jax.Array,  # [B]
    positions: jax.Array,  # [B]
    k_pools: jax.Array,  # [L_attn, pages, KH, P, D]
    v_pools: jax.Array,
    states: jax.Array,  # [L_mamba, num_slots, cell] fp32 — donated
    page_tables: jax.Array,  # [B, max_pages]
    slot_pages: jax.Array,  # [B]
    slot_offsets: jax.Array,  # [B]
    seq_lens: jax.Array,  # [B]
    state_slots: jax.Array,  # [B] PHYSICAL slot ids; -1 = discard row
    *,
    tp_axis: str | None = None,
    interpret: bool = False,
    collect_kv: bool = False,
    quant_scales: tuple | None = None,  # (k_scales, v_scales) [L_attn, KH]
):
    B = tokens.shape[0]
    kv_collected = []
    int8_kv = jnp.dtype(k_pools.dtype) == jnp.int8
    k_scales, v_scales = quant_scales if quant_scales else (None, None)
    H, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    # TP sharding (under shard_map): attention layers are Megatron-sharded
    # like the Llama family; mamba mixers run REPLICATED — the state cells
    # and mixer matmuls are tiny next to attention+MLP, so replicating them
    # costs ~nothing while keeping the packed super-cell layout intact (a
    # d_inner shard would have to restripe conv++ssm packing per shard).
    if tp_axis:
        tp = jax.lax.axis_size(tp_axis)
        H, KH = H // tp, KH // tp
    x = params["embed"][tokens]

    attn_i = mamba_i = 0
    for kind, lp in zip(cfg.layer_types, params["layers"]):
        if kind == "attn":
            h = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
            q = (h @ lp["wq"]).reshape(B, H, D)
            k = (h @ lp["wk"]).reshape(B, KH, D)
            v = (h @ lp["wv"]).reshape(B, KH, D)
            q = rope(q[:, None], positions[:, None], cfg.rope_theta)[:, 0]
            k = rope(k[:, None], positions[:, None], cfg.rope_theta)[:, 0]
            if collect_kv:
                kv_collected.append((k, v))
            attn, k_pools, v_pools = paged_attention_decode(
                q, k_pools, v_pools, page_tables, seq_lens, attn_i,
                k if int8_kv else k.astype(k_pools.dtype),
                v if int8_kv else v.astype(v_pools.dtype),
                slot_pages, slot_offsets, interpret=interpret,
                k_scales=k_scales, v_scales=v_scales,
            )
            x = x + _maybe_psum(attn.reshape(B, H * D) @ lp["wo"], tp_axis)
            h = rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
            x = x + _maybe_psum(
                (jax.nn.silu(h @ lp["w_gate"]) * (h @ lp["w_up"])) @ lp["w_down"],
                tp_axis,
            )
            attn_i += 1
        else:
            h = rms_norm(x, lp["norm"], cfg.rms_eps)
            cells = states[mamba_i, jnp.maximum(state_slots, 0)]  # [B, cell]
            conv_s, ssm_s = unpack_cell(cfg, cells)
            out, conv_s, ssm_s = _mixer_decode(cfg, lp, h, conv_s, ssm_s)
            new_cells = pack_cell(cfg, conv_s, ssm_s)
            # scatter back; -1 slots drop (null-slot discard semantics)
            states = states.at[mamba_i, state_slots].set(
                new_cells, mode="drop"
            )
            x = x + out
            mamba_i += 1

    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    logits = lm_head_logits(x, params["lm_head"], tp_axis)
    if collect_kv:
        ks = jnp.stack([k for k, _ in kv_collected])  # [L_attn, B, KH, D]
        vs = jnp.stack([v for _, v in kv_collected])
        return logits, k_pools, v_pools, states, (ks, vs)
    return logits, k_pools, v_pools, states


def hybrid_linear_prefill_step(
    params: dict,
    cfg: HybridLinearConfig,
    tokens: jax.Array,  # [T]
    positions: jax.Array,
    k_pools: jax.Array,
    v_pools: jax.Array,
    states: jax.Array,
    chunk_pages: jax.Array,  # [T // page_tokens]
    page_table: jax.Array,  # [max_pages]
    q_start: jax.Array,
    true_len: jax.Array,
    state_slot: jax.Array,  # [] physical slot id (-1 = discard)
    *,
    tp_axis: str | None = None,
    interpret: bool = False,
    quant_scales: tuple | None = None,  # (k_scales, v_scales) [L_attn, KH]
):
    """Prefill ONE chunk.  NOTE: mamba state is recomputed from position 0,
    so chunked prefill requires q_start==0 chunks to carry state — the
    engine passes resume state via the slot (written at chunk end, read at
    chunk start)."""
    T = tokens.shape[0]
    H, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    if tp_axis:  # attention sharded, mixers replicated (see decode step)
        tp = jax.lax.axis_size(tp_axis)
        H, KH = H // tp, KH // tp
    k_scales, v_scales = quant_scales if quant_scales else (None, None)
    x = params["embed"][tokens]

    attn_i = mamba_i = 0
    for kind, lp in zip(cfg.layer_types, params["layers"]):
        if kind == "attn":
            h = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
            q = (h @ lp["wq"]).reshape(T, H, D)
            k = (h @ lp["wk"]).reshape(T, KH, D)
            v = (h @ lp["wv"]).reshape(T, KH, D)
            q = rope(q, positions, cfg.rope_theta)
            k = rope(k, positions, cfg.rope_theta)
            k_pools, v_pools = write_prefill_kv(
                k_pools, v_pools, k.transpose(1, 0, 2), v.transpose(1, 0, 2),
                chunk_pages, attn_i, interpret=interpret,
                k_scale=k_scales[attn_i] if k_scales is not None else None,
                v_scale=v_scales[attn_i] if v_scales is not None else None,
            )
            attn = paged_prefill_attention(
                q, k_pools, v_pools, page_table, q_start, q_start + true_len,
                attn_i, interpret=interpret,
                k_scales=k_scales, v_scales=v_scales,
            )
            x = x + _maybe_psum(attn.reshape(T, H * D) @ lp["wo"], tp_axis)
            h = rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
            x = x + _maybe_psum(
                (jax.nn.silu(h @ lp["w_gate"]) * (h @ lp["w_up"])) @ lp["w_down"],
                tp_axis,
            )
            attn_i += 1
        else:
            h = rms_norm(x, lp["norm"], cfg.rms_eps)
            # chunked prefill: resume from the stored slot state unless this
            # is the sequence's first chunk (fresh slots may hold a previous
            # sequence's stale state — zero explicitly)
            cells = states[mamba_i, jnp.maximum(state_slot, 0)]
            conv_st, ssm_st = unpack_cell(cfg, cells)
            fresh = q_start == 0
            conv0 = jnp.where(fresh, 0.0, conv_st.astype(jnp.float32))
            ssm0 = jnp.where(fresh, 0.0, ssm_st.astype(jnp.float32))
            out, conv_all, ssm_all = _mixer_prefill(cfg, lp, h, conv0, ssm0)
            # the stored state is the one after the last REAL token of the
            # (padded) chunk
            convT = conv_all[jnp.maximum(true_len - 1, 0)]
            ssmT = ssm_all[jnp.maximum(true_len - 1, 0)]
            cell = pack_cell(cfg, convT, ssmT)
            states = states.at[mamba_i, state_slot].set(cell, mode="drop")
            x = x + out
            mamba_i += 1

    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    last = x[jnp.maximum(true_len - 1, 0)]
    logits = lm_head_logits(last, params["lm_head"], tp_axis)
    return logits, k_pools, v_pools, states


