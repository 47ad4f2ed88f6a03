"""Pipeline-parallel stage execution: per-stage elastic KV pools.

The reference's PP surface (first-class since 2026-03, README:51): each PP
stage manages its KV independently — per-stage FTensor groups, sockets
namespaced ``pp{rank}/`` (tp_ipc_util.py:35-53), and the "stage size is
tp_size, NOT tp×pp" invariant (vllm/patches.py:654-664).

TPU-native form: a pipeline stage is a LAYER GROUP of the engine —

- stage ``s`` owns layers ``[s·L/S, (s+1)·L/S)`` with its own
  :class:`KVCacheManager`, page table, and shm control segment (so `kvctl`
  can limit each stage independently, the per-stage elasticity of the
  reference), all over ONE shared physical arena on a chip (pages are
  fungible between stages — cross-stage elasticity is automatic);
- the decode/prefill steps walk layers in order, selecting each layer's
  stage page table dynamically (all stages share kernel geometry, so no
  per-stage recompilation);
- across HOSTS, stage metadata rides the existing pp-namespaced socket
  plane (`parallel/ipc.py`: ``socket_path(..., pp_rank=r)``).

``PPLlamaAdapter`` plugs straight into :class:`LLMEngine`; requests flow
through the normal scheduler with per-stage block accounting.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ..models.llama import lm_head_logits, qkv_heads, rms_norm, rope
from ..ops.paged_attention import (
    paged_attention_decode,
    paged_attention_verify,
    write_prefill_kv,
)
from ..ops.paged_prefill import (
    paged_prefill_attention,
    paged_prefill_attention_batch,
)


def _maybe_psum(x, tp_axis):
    return jax.lax.psum(x, tp_axis) if tp_axis else x


@dataclass
class PPLlamaAdapter:
    """Llama family with layers partitioned into ``num_stages`` pipeline
    stages, one elastic pool per stage."""

    cfg: Any  # LlamaConfig
    num_stages: int = 2

    def __post_init__(self):
        c = self.cfg
        if c.num_layers % self.num_stages:
            raise ValueError(
                f"num_layers={c.num_layers} not divisible by "
                f"num_stages={self.num_stages}"
            )
        if getattr(c, "sliding_window", None):
            raise ValueError("PP adapter covers full-attention models")
        self.vocab_size = c.vocab_size
        self.num_layers = c.num_layers
        self.num_kv_heads = c.num_kv_heads
        self.head_dim = c.head_dim
        self.num_kv_buffers = 2
        self.window = None
        # stage = layer group: the engine builds one manager per stage over
        # a shared arena of layers_per_group layers
        self.group_windows = (None,) * self.num_stages
        self.layers_per_group = c.num_layers // self.num_stages
        # per-layer group maps for the engine's dp replica equalizer
        # (stage s == layer group s; arena index == layer-in-stage)
        Lp = self.layers_per_group
        self.group_index = tuple(l // Lp for l in range(c.num_layers))
        self.layer_in_group = tuple(l % Lp for l in range(c.num_layers))

    def init_params(self, key):
        from ..models.llama import init_llama_params

        return init_llama_params(self.cfg, key)

    # each layer's stage and its arena index within the stage
    def _stage_maps(self):
        Lp = self.layers_per_group
        stage = [l // Lp for l in range(self.cfg.num_layers)]
        in_stage = [l % Lp for l in range(self.cfg.num_layers)]
        return stage, in_stage

    def _per_model_scales(self, quant_scales) -> bool:
        """True when the scales are keyed by MODEL layer ([L, KH]) rather
        than arena layer ([Lp, KH]) — static shape switch at trace time."""
        return (
            quant_scales is not None
            and self.num_stages > 1
            and quant_scales[0].shape[0] == self.cfg.num_layers
        )

    def decode_step(self, params, tokens, positions, k_pools, v_pools,
                    page_tables, slot_pages, slot_offsets, seq_lens,
                    *, tp_axis=None, interpret=False, quant_scales=None,
                    collect_kv=False):
        """page_tables: [S, B, max_pages]; slot_pages: [S, B].

        ``quant_scales``: int8 pools.  Two accepted shapes, keyed by the
        leading dim (static at trace time):

        - ([Lp, KH], [Lp, KH]) keyed by ARENA layer — one scale set
          shared by every stage (the pre-round-5 contract);
        - ([L, KH], [L, KH]) keyed by MODEL layer — true per-stage
          calibration under the shared arena.  Each layer's scale row
          rides the scan and is broadcast to the arena shape, so the
          kernel's arena-layer lookup reads THIS layer's own scale even
          though stages alias arena indices (stage PLACEMENT gets the
          same resolution from stage-stacked scales: parallel/pp_mesh.py).
        """
        cfg = self.cfg
        B = tokens.shape[0]
        H, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        if tp_axis:
            tp = jax.lax.axis_size(tp_axis)
            H, KH = H // tp, KH // tp
        stage_of, in_stage = self._stage_maps()
        int8_kv = jnp.dtype(k_pools.dtype) == jnp.int8
        k_scales, v_scales = quant_scales if quant_scales else (None, None)
        per_model = self._per_model_scales(quant_scales)
        Lp = self.layers_per_group

        x = params["embed"][tokens]

        def layer_fn(carry, layer):
            x, k_pools, v_pools = carry
            lp = layer["p"]
            s_idx, l_in_s = layer["s"], layer["ls"]
            k_sc, v_sc = (
                (jnp.broadcast_to(layer["ksc"][None], (Lp, layer["ksc"].shape[0])),
                 jnp.broadcast_to(layer["vsc"][None], (Lp, layer["vsc"].shape[0])))
                if per_model else (k_scales, v_scales)
            )

            h = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
            q, k, v = qkv_heads(h, lp, H, KH, D, cfg.rms_eps)
            q = rope(q[:, None], positions[:, None], cfg.rope_theta,
                 getattr(cfg, "rope_scaling", None))[:, 0]
            k = rope(k[:, None], positions[:, None], cfg.rope_theta,
                 getattr(cfg, "rope_scaling", None))[:, 0]

            # dynamic stage select: geometry is identical across stages, so
            # the kernel compiles once and the table row is a cheap gather
            attn, k_pools, v_pools = paged_attention_decode(
                q, k_pools, v_pools,
                page_tables[s_idx], seq_lens, l_in_s,
                k if int8_kv else k.astype(k_pools.dtype),
                v if int8_kv else v.astype(v_pools.dtype),
                slot_pages[s_idx], slot_offsets,
                interpret=interpret,
                k_scales=k_sc, v_scales=v_sc,
            )
            x = x + _maybe_psum(attn.reshape(B, H * D) @ lp["wo"], tp_axis)
            h = rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
            mlp = (jax.nn.silu(h @ lp["w_gate"]) * (h @ lp["w_up"])) @ lp["w_down"]
            x = x + _maybe_psum(mlp, tp_axis)
            return (x, k_pools, v_pools), ((k, v) if collect_kv else None)

        layers = {
            "p": params["layers"],
            "s": jnp.asarray(stage_of, jnp.int32),
            "ls": jnp.asarray(in_stage, jnp.int32),
        }
        if per_model:
            layers["ksc"], layers["vsc"] = k_scales, v_scales
        (x, k_pools, v_pools), kv = jax.lax.scan(
            layer_fn, (x, k_pools, v_pools), layers
        )
        x = rms_norm(x, params["final_norm"], cfg.rms_eps)
        logits = lm_head_logits(x, params["lm_head"], tp_axis)
        if collect_kv:
            return logits, k_pools, v_pools, kv
        return logits, k_pools, v_pools

    def prefill_step(self, params, tokens, positions, k_pools, v_pools,
                     chunk_pages, page_table, q_start, true_len,
                     *, tp_axis=None, interpret=False, quant_scales=None):
        """chunk_pages: [S, n]; page_table: [S, max_pages]."""
        cfg = self.cfg
        T = tokens.shape[0]
        H, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        if tp_axis:
            tp = jax.lax.axis_size(tp_axis)
            H, KH = H // tp, KH // tp
        stage_of, in_stage = self._stage_maps()
        per_model = self._per_model_scales(quant_scales)
        Lp = self.layers_per_group
        kv_len = q_start + true_len

        x = params["embed"][tokens]

        def layer_fn(carry, layer):
            x, k_pools, v_pools = carry
            lp = layer["p"]
            s_idx, l_in_s = layer["s"], layer["ls"]

            h = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
            q, k, v = qkv_heads(h, lp, H, KH, D, cfg.rms_eps)
            q = rope(q, positions, cfg.rope_theta,
                 getattr(cfg, "rope_scaling", None))
            k = rope(k, positions, cfg.rope_theta,
                 getattr(cfg, "rope_scaling", None))

            if per_model:
                k_w, v_w = layer["ksc"], layer["vsc"]
                k_sc = jnp.broadcast_to(k_w[None], (Lp, k_w.shape[0]))
                v_sc = jnp.broadcast_to(v_w[None], (Lp, v_w.shape[0]))
            elif quant_scales:
                k_w, v_w = quant_scales[0][l_in_s], quant_scales[1][l_in_s]
                k_sc, v_sc = quant_scales
            else:
                k_w = v_w = k_sc = v_sc = None
            k_pools, v_pools = write_prefill_kv(
                k_pools, v_pools, k.transpose(1, 0, 2), v.transpose(1, 0, 2),
                chunk_pages[s_idx], l_in_s, interpret=interpret,
                k_scale=k_w, v_scale=v_w,
            )
            attn = paged_prefill_attention(
                q, k_pools, v_pools, page_table[s_idx], q_start, kv_len,
                l_in_s, interpret=interpret,
                k_scales=k_sc, v_scales=v_sc,
            )
            x = x + _maybe_psum(attn.reshape(T, H * D) @ lp["wo"], tp_axis)
            h = rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
            mlp = (jax.nn.silu(h @ lp["w_gate"]) * (h @ lp["w_up"])) @ lp["w_down"]
            x = x + _maybe_psum(mlp, tp_axis)
            return (x, k_pools, v_pools), None

        layers = {
            "p": params["layers"],
            "s": jnp.asarray(stage_of, jnp.int32),
            "ls": jnp.asarray(in_stage, jnp.int32),
        }
        if per_model:
            layers["ksc"], layers["vsc"] = quant_scales
        (x, k_pools, v_pools), _ = jax.lax.scan(
            layer_fn, (x, k_pools, v_pools), layers
        )
        x = rms_norm(x, params["final_norm"], cfg.rms_eps)
        last = x[jnp.maximum(true_len - 1, 0)]
        logits = lm_head_logits(last, params["lm_head"], tp_axis)
        return logits, k_pools, v_pools

    def prefill_batch_step(self, params, tokens, positions, k_pools,
                           v_pools, chunk_pages, page_tables, q_starts,
                           true_lens, *, tp_axis=None, interpret=False,
                           quant_scales=None):
        """Batched prefill with per-stage tables: chunk_pages [N, S, n],
        page_tables [N, S, max_pages] (the engine's multi-group layout).
        Bit-identical to N serial prefill_step calls."""
        cfg = self.cfg
        N, T = tokens.shape
        H, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        if tp_axis:
            tp = jax.lax.axis_size(tp_axis)
            H, KH = H // tp, KH // tp
        stage_of, in_stage = self._stage_maps()
        per_model = self._per_model_scales(quant_scales)
        Lp = self.layers_per_group
        kv_lens = q_starts + true_lens

        x = params["embed"][tokens]  # [N, T, E]

        def layer_fn(carry, layer):
            x, k_pools, v_pools = carry
            lp = layer["p"]
            s_idx, l_in_s = layer["s"], layer["ls"]

            h = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
            q, k, v = qkv_heads(h, lp, H, KH, D, cfg.rms_eps)
            q = rope(q, positions, cfg.rope_theta,
                 getattr(cfg, "rope_scaling", None))
            k = rope(k, positions, cfg.rope_theta,
                 getattr(cfg, "rope_scaling", None))

            if per_model:
                k_w, v_w = layer["ksc"], layer["vsc"]
                k_sc = jnp.broadcast_to(k_w[None], (Lp, k_w.shape[0]))
                v_sc = jnp.broadcast_to(v_w[None], (Lp, v_w.shape[0]))
            elif quant_scales:
                k_w, v_w = quant_scales[0][l_in_s], quant_scales[1][l_in_s]
                k_sc, v_sc = quant_scales
            else:
                k_w = v_w = k_sc = v_sc = None
            # flatten the batch into one [KH, N*T, D] stream over this
            # stage's [N * T/P] pages (page writes are sequence-agnostic)
            k_pools, v_pools = write_prefill_kv(
                k_pools, v_pools,
                k.transpose(2, 0, 1, 3).reshape(KH, N * T, D),
                v.transpose(2, 0, 1, 3).reshape(KH, N * T, D),
                chunk_pages[:, s_idx].reshape(-1), l_in_s,
                interpret=interpret, k_scale=k_w, v_scale=v_w,
            )
            attn = paged_prefill_attention_batch(
                q, k_pools, v_pools, page_tables[:, s_idx], q_starts,
                kv_lens, l_in_s, interpret=interpret,
                k_scales=k_sc, v_scales=v_sc,
            )  # [N, T, H, D]
            x = x + _maybe_psum(attn.reshape(N, T, H * D) @ lp["wo"], tp_axis)
            h = rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
            mlp = (jax.nn.silu(h @ lp["w_gate"]) * (h @ lp["w_up"])) @ lp["w_down"]
            x = x + _maybe_psum(mlp, tp_axis)
            return (x, k_pools, v_pools), None

        layers = {
            "p": params["layers"],
            "s": jnp.asarray(stage_of, jnp.int32),
            "ls": jnp.asarray(in_stage, jnp.int32),
        }
        if per_model:
            layers["ksc"], layers["vsc"] = quant_scales
        (x, k_pools, v_pools), _ = jax.lax.scan(
            layer_fn, (x, k_pools, v_pools), layers
        )
        x = rms_norm(x, params["final_norm"], cfg.rms_eps)
        last = x[jnp.arange(N), jnp.maximum(true_lens - 1, 0)]  # [N, E]
        logits = lm_head_logits(last, params["lm_head"], tp_axis)
        return logits, k_pools, v_pools

    def verify_step(self, params, tokens, positions, k_pools, v_pools,
                    page_tables, slot_pages, slot_offsets, seq_lens,
                    *, tp_axis=None, interpret=False, quant_scales=None,
                    collect_kv=False):
        """Speculative-decode verification with per-stage tables:
        page_tables [S, B, max_pages], slot_pages [S, B, T]."""
        cfg = self.cfg
        B, T = tokens.shape
        H, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        if tp_axis:
            tp = jax.lax.axis_size(tp_axis)
            H, KH = H // tp, KH // tp
        stage_of, in_stage = self._stage_maps()
        int8_kv = jnp.dtype(k_pools.dtype) == jnp.int8
        k_scales, v_scales = quant_scales if quant_scales else (None, None)
        per_model = self._per_model_scales(quant_scales)
        Lp = self.layers_per_group

        x = params["embed"][tokens]  # [B, T, E]

        def layer_fn(carry, layer):
            x, k_pools, v_pools = carry
            lp = layer["p"]
            s_idx, l_in_s = layer["s"], layer["ls"]

            h = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
            q, k, v = qkv_heads(h, lp, H, KH, D, cfg.rms_eps)
            q = rope(q, positions, cfg.rope_theta,
                 getattr(cfg, "rope_scaling", None))
            k = rope(k, positions, cfg.rope_theta,
                 getattr(cfg, "rope_scaling", None))

            k_sc, v_sc = (
                (jnp.broadcast_to(layer["ksc"][None], (Lp, layer["ksc"].shape[0])),
                 jnp.broadcast_to(layer["vsc"][None], (Lp, layer["vsc"].shape[0])))
                if per_model else (k_scales, v_scales)
            )
            attn, k_pools, v_pools = paged_attention_verify(
                q, k_pools, v_pools,
                page_tables[s_idx], seq_lens, l_in_s,
                k if int8_kv else k.astype(k_pools.dtype),
                v if int8_kv else v.astype(v_pools.dtype),
                slot_pages[s_idx], slot_offsets,
                interpret=interpret,
                k_scales=k_sc, v_scales=v_sc,
            )  # [B, T, H, D]
            x = x + _maybe_psum(attn.reshape(B, T, H * D) @ lp["wo"], tp_axis)
            h = rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
            mlp = (jax.nn.silu(h @ lp["w_gate"]) * (h @ lp["w_up"])) @ lp["w_down"]
            x = x + _maybe_psum(mlp, tp_axis)
            return (x, k_pools, v_pools), ((k, v) if collect_kv else None)

        layers = {
            "p": params["layers"],
            "s": jnp.asarray(stage_of, jnp.int32),
            "ls": jnp.asarray(in_stage, jnp.int32),
        }
        if per_model:
            layers["ksc"], layers["vsc"] = quant_scales
        (x, k_pools, v_pools), kv = jax.lax.scan(
            layer_fn, (x, k_pools, v_pools), layers
        )
        x = rms_norm(x, params["final_norm"], cfg.rms_eps)
        logits = lm_head_logits(x, params["lm_head"], tp_axis)  # [B, T, V]
        if collect_kv:
            return logits, k_pools, v_pools, kv
        return logits, k_pools, v_pools

    def param_specs(self, tp_axis: str) -> dict:
        from .mesh import llama_param_specs

        return llama_param_specs(
            tp_axis, bias=getattr(self.cfg, "attention_bias", False),
            qk_norm=getattr(self.cfg, "qk_norm", False))
