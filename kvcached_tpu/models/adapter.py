"""Model adapters: the engine↔model contract.

The reference integrates with engines by monkey-patching their pool classes
(kvcached/integration/); here we own the engine, so each model family
implements one small adapter surface instead:

- ``kv geometry``  (layers, kv heads, head_dim, #kv buffers) for the pool,
- ``init_params``,
- ``decode_step`` / ``prefill_step`` pure functions over the paged pool.

Adding a model family = adding an adapter; the scheduler, allocator,
prefix cache, CLI, and controller are family-agnostic.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Protocol

import jax


class ModelAdapter(Protocol):
    vocab_size: int
    num_layers: int
    num_kv_heads: int
    head_dim: int
    num_kv_buffers: int

    def init_params(self, key: jax.Array) -> dict: ...

    def decode_step(self, params, tokens, positions, k_pools, v_pools,
                    page_tables, slot_pages, slot_offsets, seq_lens,
                    *, tp_axis: str | None = None,
                    interpret: bool = False): ...

    def prefill_step(self, params, tokens, positions, k_pools, v_pools,
                     chunk_pages, page_table, q_start, true_len,
                     *, tp_axis: str | None = None,
                     interpret: bool = False): ...

    def param_specs(self, tp_axis: str) -> dict:
        """PartitionSpec tree for TP-sharding the params.  Adapters without
        a TP story may raise NotImplementedError — the engine then refuses
        a mesh for that model family."""
        ...


@dataclass
class LlamaAdapter:
    cfg: Any  # LlamaConfig

    def __post_init__(self):
        c = self.cfg
        self.vocab_size = c.vocab_size
        self.num_layers = c.num_layers
        self.num_kv_heads = c.num_kv_heads
        self.head_dim = c.head_dim
        self.num_kv_buffers = 2
        self.window = getattr(c, "sliding_window", None)
        # MQA under tp: the engine may replicate the single kv head —
        # param_specs understands kv_replicated and the llama step fns
        # derive per-shard head counts from weight shapes
        self.supports_kv_replication = True

    def init_params(self, key):
        from .llama import init_llama_params

        return init_llama_params(self.cfg, key)

    def decode_step(self, params, tokens, positions, k_pools, v_pools,
                    page_tables, slot_pages, slot_offsets, seq_lens,
                    *, tp_axis=None, interpret=False, quant_scales=None,
                    collect_kv=False):
        from .llama import llama_decode_step

        return llama_decode_step(
            params, self.cfg, tokens, positions, k_pools, v_pools,
            page_tables, slot_pages, slot_offsets, seq_lens,
            tp_axis=tp_axis, interpret=interpret, quant_scales=quant_scales,
            collect_kv=collect_kv,
        )

    def prefill_step(self, params, tokens, positions, k_pools, v_pools,
                     chunk_pages, page_table, q_start, true_len,
                     *, tp_axis=None, interpret=False, quant_scales=None):
        from .llama import llama_prefill_step

        return llama_prefill_step(
            params, self.cfg, tokens, positions, k_pools, v_pools,
            chunk_pages, page_table, q_start, true_len,
            tp_axis=tp_axis, interpret=interpret, quant_scales=quant_scales,
        )

    def prefill_batch_step(self, params, tokens, positions, k_pools,
                           v_pools, chunk_pages, page_tables, q_starts,
                           true_lens, *, tp_axis=None, interpret=False,
                           quant_scales=None):
        """Batched prefill: N chunks in one dispatch, bit-identical to N
        serial prefill_step calls (adapters without this method prefill
        serially)."""
        from .llama import llama_prefill_batch_step

        return llama_prefill_batch_step(
            params, self.cfg, tokens, positions, k_pools, v_pools,
            chunk_pages, page_tables, q_starts, true_lens,
            tp_axis=tp_axis, interpret=interpret, quant_scales=quant_scales,
        )

    def verify_step(self, params, tokens, positions, k_pools, v_pools,
                    page_tables, slot_pages, slot_offsets, seq_lens,
                    *, tp_axis=None, interpret=False, quant_scales=None,
                    collect_kv=False):
        """Speculative-decode verification: T tokens per row in one pass
        (engines without this method fall back to plain decode)."""
        from .llama import llama_verify_step

        return llama_verify_step(
            params, self.cfg, tokens, positions, k_pools, v_pools,
            page_tables, slot_pages, slot_offsets, seq_lens,
            tp_axis=tp_axis, interpret=interpret, quant_scales=quant_scales,
            collect_kv=collect_kv,
        )

    def param_specs(self, tp_axis: str, *, kv_replicated: bool = False) -> dict:
        from ..parallel.mesh import llama_param_specs

        return llama_param_specs(
            tp_axis, kv_replicated=kv_replicated,
            bias=getattr(self.cfg, "attention_bias", False),
            qk_norm=getattr(self.cfg, "qk_norm", False),
        )


@dataclass
class MLAAdapter:
    cfg: Any  # MLAConfig

    def __post_init__(self):
        c = self.cfg
        self.vocab_size = c.vocab_size
        self.num_layers = c.num_layers
        self.num_kv_heads = 1
        self.head_dim = c.cache_head_dim
        self.num_kv_buffers = 1
        self.window = None

    def init_params(self, key):
        from .mla import init_mla_params

        return init_mla_params(self.cfg, key)

    def decode_step(self, params, tokens, positions, k_pools, v_pools,
                    page_tables, slot_pages, slot_offsets, seq_lens,
                    *, tp_axis=None, interpret=False, quant_scales=None,
                    collect_kv=False):
        from .mla import mla_decode_step

        return mla_decode_step(
            params, self.cfg, tokens, positions, k_pools, v_pools,
            page_tables, slot_pages, slot_offsets, seq_lens,
            tp_axis=tp_axis, interpret=interpret, quant_scales=quant_scales,
            collect_kv=collect_kv,
        )

    def prefill_step(self, params, tokens, positions, k_pools, v_pools,
                     chunk_pages, page_table, q_start, true_len,
                     *, tp_axis=None, interpret=False, quant_scales=None):
        from .mla import mla_prefill_step

        return mla_prefill_step(
            params, self.cfg, tokens, positions, k_pools, v_pools,
            chunk_pages, page_table, q_start, true_len,
            tp_axis=tp_axis, interpret=interpret, quant_scales=quant_scales,
        )

    def prefill_batch_step(self, params, tokens, positions, k_pools,
                           v_pools, chunk_pages, page_tables, q_starts,
                           true_lens, *, tp_axis=None, interpret=False,
                           quant_scales=None):
        """Batched prefill over the single latent buffer (N chunks in one
        dispatch, bit-identical to serial)."""
        from .mla import mla_prefill_batch_step

        return mla_prefill_batch_step(
            params, self.cfg, tokens, positions, k_pools, v_pools,
            chunk_pages, page_tables, q_starts, true_lens,
            tp_axis=tp_axis, interpret=interpret, quant_scales=quant_scales,
        )

    def verify_step(self, params, tokens, positions, k_pools, v_pools,
                    page_tables, slot_pages, slot_offsets, seq_lens,
                    *, tp_axis=None, interpret=False, quant_scales=None,
                    collect_kv=False):
        """Speculative-decode verification (DeepSeek MTP-style serving:
        absorbed multi-query attention over the latent buffer)."""
        from .mla import mla_verify_step

        return mla_verify_step(
            params, self.cfg, tokens, positions, k_pools, v_pools,
            page_tables, slot_pages, slot_offsets, seq_lens,
            tp_axis=tp_axis, interpret=interpret, quant_scales=quant_scales,
            collect_kv=collect_kv,
        )

    def param_specs(self, tp_axis: str) -> dict:
        # The single shared kv head can't split, so the LATENT POOL
        # replicates across tp (every shard writes identical entries); the
        # per-head projections, MLP, and vocab shard Megatron-style — the
        # reference runs MLA pools under TP the same way
        # (sglang/patches.py:523-702).
        from ..parallel.mesh import mla_param_specs

        return mla_param_specs(tp_axis)


@dataclass
class HybridAdapter:
    """Full-attention + sliding-window layer groups over per-group elastic
    pools (reference: gpt-oss hybrid groups, vllm/patches.py:674-789)."""

    cfg: Any  # HybridConfig

    def __post_init__(self):
        c = self.cfg
        self.vocab_size = c.vocab_size
        self.num_layers = c.num_layers
        self.num_kv_heads = c.num_kv_heads
        self.head_dim = c.head_dim
        self.num_kv_buffers = 2
        self.window = None  # windows are per-group, not global
        self.group_windows = c.group_windows  # engine: one manager per group
        if c.equal_groups:
            # equal layer counts: groups share ONE physical arena (pages
            # fungible across groups)
            self.layers_per_group = c.layers_per_group
        else:
            # unequal groups (Gemma3's 5:1 local:global): per-GROUP arenas
            # — the engine allocates one pool per group and the step fns
            # take pools as tuples (hybrid._pool_g)
            self.layers_per_group = None
            self.group_layers = c.group_layer_counts
        # MQA under tp (e.g. a single-kv-head Gemma2-class checkpoint):
        # the hybrid step fns derive per-shard head counts from weight
        # shapes, so the engine may replicate the kv head across tp
        self.supports_kv_replication = True

    def init_params(self, key):
        from .hybrid import init_hybrid_params

        return init_hybrid_params(self.cfg, key)

    def decode_step(self, params, tokens, positions, k_pools, v_pools,
                    page_tables, slot_pages, slot_offsets, seq_lens,
                    *, tp_axis=None, interpret=False, quant_scales=None,
                    collect_kv=False):
        from .hybrid import hybrid_decode_step

        return hybrid_decode_step(
            params, self.cfg, tokens, positions, k_pools, v_pools,
            page_tables, slot_pages, slot_offsets, seq_lens,
            tp_axis=tp_axis, interpret=interpret,
            quant_scales=quant_scales, collect_kv=collect_kv,
        )

    def prefill_step(self, params, tokens, positions, k_pools, v_pools,
                     chunk_pages, page_table, q_start, true_len,
                     *, tp_axis=None, interpret=False, quant_scales=None):
        from .hybrid import hybrid_prefill_step

        return hybrid_prefill_step(
            params, self.cfg, tokens, positions, k_pools, v_pools,
            chunk_pages, page_table, q_start, true_len,
            tp_axis=tp_axis, interpret=interpret,
            quant_scales=quant_scales,
        )

    def prefill_batch_step(self, params, tokens, positions, k_pools,
                           v_pools, chunk_pages, page_tables, q_starts,
                           true_lens, *, tp_axis=None, interpret=False,
                           quant_scales=None):
        """Batched prefill across layer groups: chunk_pages [N, G, n] /
        page_tables [N, G, max_pages], each layer writing through its
        group's row."""
        from .hybrid import hybrid_prefill_batch_step

        return hybrid_prefill_batch_step(
            params, self.cfg, tokens, positions, k_pools, v_pools,
            chunk_pages, page_tables, q_starts, true_lens,
            tp_axis=tp_axis, interpret=interpret,
            quant_scales=quant_scales,
        )

    def verify_step(self, params, tokens, positions, k_pools, v_pools,
                    page_tables, slot_pages, slot_offsets, seq_lens,
                    *, tp_axis=None, interpret=False, quant_scales=None,
                    collect_kv=False):
        """Speculative-decode verification across layer groups (each group
        verifies with its own static window)."""
        from .hybrid import hybrid_verify_step

        return hybrid_verify_step(
            params, self.cfg, tokens, positions, k_pools, v_pools,
            page_tables, slot_pages, slot_offsets, seq_lens,
            tp_axis=tp_axis, interpret=interpret,
            quant_scales=quant_scales, collect_kv=collect_kv,
        )

    def param_specs(self, tp_axis: str, *, kv_replicated: bool = False) -> dict:
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import llama_param_specs

        # same stacked param tree (+ the optional Gemma/Qwen extras)
        specs = llama_param_specs(
            tp_axis, kv_replicated=kv_replicated,
            bias=getattr(self.cfg, "attention_bias", False),
            qk_norm=getattr(self.cfg, "qk_norm", False))
        if getattr(self.cfg, "post_norms", False):
            specs["layers"]["post_attn_norm"] = P()
            specs["layers"]["post_ffw_norm"] = P()
        return specs


@dataclass
class HybridLinearAdapter:
    """Attention + mamba layers: KV pool for the attention group, an
    elastic per-sequence STATE-slot pool for the mamba layers (reference
    ElasticMambaPool/HybridLinearKVPool, sglang/patches.py:705-1208)."""

    cfg: Any  # HybridLinearConfig

    def __post_init__(self):
        from .mamba import StateSpec

        c = self.cfg
        self.vocab_size = c.vocab_size
        # the KV pool covers only the ATTENTION layers
        self.num_layers = c.num_attn_layers
        self.num_kv_heads = c.num_kv_heads
        self.head_dim = c.head_dim
        self.num_kv_buffers = 2
        self.window = None
        self.has_state = True
        self.state_spec = StateSpec(
            num_layers=c.num_mamba_layers,
            cell_elems=c.cell_elems,
        )

    def init_params(self, key):
        from .mamba import init_hybrid_linear_params

        return init_hybrid_linear_params(self.cfg, key)

    def decode_step(self, params, tokens, positions, k_pools, v_pools,
                    page_tables, slot_pages, slot_offsets, seq_lens,
                    *, states, state_slots, tp_axis=None, interpret=False,
                    collect_kv=False, quant_scales=None):
        from .mamba import hybrid_linear_decode_step

        return hybrid_linear_decode_step(
            params, self.cfg, tokens, positions, k_pools, v_pools, states,
            page_tables, slot_pages, slot_offsets, seq_lens, state_slots,
            tp_axis=tp_axis, interpret=interpret, collect_kv=collect_kv,
            quant_scales=quant_scales,
        )

    def prefill_step(self, params, tokens, positions, k_pools, v_pools,
                     chunk_pages, page_table, q_start, true_len,
                     *, states, state_slot, tp_axis=None, interpret=False,
                     quant_scales=None):
        from .mamba import hybrid_linear_prefill_step

        return hybrid_linear_prefill_step(
            params, self.cfg, tokens, positions, k_pools, v_pools, states,
            chunk_pages, page_table, q_start, true_len, state_slot,
            tp_axis=tp_axis, interpret=interpret, quant_scales=quant_scales,
        )

    def param_specs(self, tp_axis: str) -> dict:
        from ..parallel.mesh import hybrid_linear_param_specs

        return hybrid_linear_param_specs(self.cfg.layer_types, tp_axis)


def as_adapter(model) -> ModelAdapter:
    """Accept a model config or an adapter."""
    from .hybrid import HybridConfig
    from .llama import LlamaConfig
    from .mamba import HybridLinearConfig
    from .mla import MLAConfig

    if isinstance(model, LlamaConfig):
        return LlamaAdapter(model)
    if isinstance(model, MLAConfig):
        return MLAAdapter(model)
    if isinstance(model, HybridConfig):
        return HybridAdapter(model)
    if isinstance(model, HybridLinearConfig):
        return HybridLinearAdapter(model)
    return model
