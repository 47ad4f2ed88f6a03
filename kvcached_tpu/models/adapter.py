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
                    *, interpret: bool = False): ...

    def prefill_step(self, params, tokens, positions, k_pools, v_pools,
                     chunk_pages, page_table, q_start, true_len,
                     *, interpret: bool = False): ...


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

    def init_params(self, key):
        from .llama import init_llama_params

        return init_llama_params(self.cfg, key)

    def decode_step(self, params, tokens, positions, k_pools, v_pools,
                    page_tables, slot_pages, slot_offsets, seq_lens,
                    *, interpret=False):
        from .llama import llama_decode_step

        return llama_decode_step(
            params, self.cfg, tokens, positions, k_pools, v_pools,
            page_tables, slot_pages, slot_offsets, seq_lens,
            interpret=interpret,
        )

    def prefill_step(self, params, tokens, positions, k_pools, v_pools,
                     chunk_pages, page_table, q_start, true_len,
                     *, interpret=False):
        from .llama import llama_prefill_step

        return llama_prefill_step(
            params, self.cfg, tokens, positions, k_pools, v_pools,
            chunk_pages, page_table, q_start, true_len, interpret=interpret,
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
                    *, interpret=False):
        from .mla import mla_decode_step

        return mla_decode_step(
            params, self.cfg, tokens, positions, k_pools, v_pools,
            page_tables, slot_pages, slot_offsets, seq_lens,
            interpret=interpret,
        )

    def prefill_step(self, params, tokens, positions, k_pools, v_pools,
                     chunk_pages, page_table, q_start, true_len,
                     *, interpret=False):
        from .mla import mla_prefill_step

        return mla_prefill_step(
            params, self.cfg, tokens, positions, k_pools, v_pools,
            chunk_pages, page_table, q_start, true_len, interpret=interpret,
        )


def as_adapter(model) -> ModelAdapter:
    """Accept a config (LlamaConfig/MLAConfig) or an adapter."""
    from .llama import LlamaConfig
    from .mla import MLAConfig

    if isinstance(model, LlamaConfig):
        return LlamaAdapter(model)
    if isinstance(model, MLAConfig):
        return MLAAdapter(model)
    return model
