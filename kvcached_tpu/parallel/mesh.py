"""Mesh construction and sharded serving steps.

The reference's TP story is metadata-only (broadcast page map/unmap to every
rank's process, SURVEY §2f).  Here TP is real compute sharding the JAX way:

- KV pools shard over the **kv-head axis** (`PartitionSpec(None, None,
  "tp")`): every chip holds the same physical page ids for its head shard,
  so the reference's "all ranks mirror identical mappings" invariant holds
  by construction — one host-side page table serves every shard, no
  per-rank socket broadcast needed within a host.
- Model params shard Megatron-style (heads / ffn columns), activations
  replicated, with the two ``psum``s inside the model (models/llama.py).
- DP shards the batch axis; each DP group serves different sequences
  against the same shared pool pages.

Everything runs under ``shard_map`` so the Pallas paged-attention kernel
sees per-shard local shapes and needs no SPMD awareness.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.llama import LlamaConfig, llama_decode_step


def make_mesh(
    tp: int = 1, dp: int = 1, devices=None, axis_names=("dp", "tp")
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= tp * dp, f"need {tp * dp} devices, have {len(devices)}"
    arr = np.array(devices[: tp * dp]).reshape(dp, tp)
    return Mesh(arr, axis_names)


def llama_param_specs(tp_axis: str = "tp", *,
                      kv_replicated: bool = False,
                      bias: bool = False,
                      qk_norm: bool = False) -> dict:
    """PartitionSpecs for the stacked Llama param tree (Megatron TP).

    ``kv_replicated``: MQA (a single shared kv head that tp cannot
    split): wk/wv REPLICATE so every shard holds — and writes — the full
    K/V, exactly like the MLA latent path; q heads, MLP, and the vocab
    still shard Megatron-style.  The host engines the reference patches
    serve MQA under TP with the same kv-head replication."""
    t = tp_axis
    layers = {
        "attn_norm": P(),
        "wq": P(None, None, t),
        "wk": P() if kv_replicated else P(None, None, t),
        "wv": P() if kv_replicated else P(None, None, t),
        "wo": P(None, t, None),
        "mlp_norm": P(),
        "w_gate": P(None, None, t),
        "w_up": P(None, None, t),
        "w_down": P(None, t, None),
    }
    if bias:
        # qkv biases column-shard like their matrices' output axes
        layers["bq"] = P(None, t)
        layers["bk"] = P() if kv_replicated else P(None, t)
        layers["bv"] = P() if kv_replicated else P(None, t)
    if qk_norm:
        # [L, head_dim] vectors shared by all heads: replicated
        layers["q_norm"] = P()
        layers["k_norm"] = P()
    return {
        "embed": P(),
        "layers": layers,
        "final_norm": P(),
        # vocab-column sharded: logits all-gathered in lm_head_logits
        "lm_head": P(None, t),
    }


def mla_param_specs(tp_axis: str = "tp") -> dict:
    """PartitionSpecs for the MLA (DeepSeek-class) param tree.

    The latent path (w_dkv, w_kr, kv_norm) is REPLICATED — the cache has a
    single shared kv head, so the latent pool replicates across tp and
    every shard writes identical entries (the reference's MLA pools run
    under TP the same way: one combined-KV buffer per rank,
    sglang/patches.py:523-702).  The per-head projections (wq, w_uk, w_uv,
    wo) shard on the head axis; MLP and the vocab-column LM head shard
    Megatron-style like Llama."""
    t = tp_axis
    return {
        "embed": P(),
        "layers": {
            "attn_norm": P(),
            "wq": P(None, None, t),  # heads packed along columns
            "w_dkv": P(),
            "w_kr": P(),
            "kv_norm": P(),
            "w_uk": P(None, t, None, None),  # [L, H, NP, R] head axis
            "w_uv": P(None, t, None, None),  # [L, H, R, V]
            "wo": P(None, t, None),  # [L, H*V, E] row-sharded + psum
            "mlp_norm": P(),
            "w_gate": P(None, None, t),
            "w_up": P(None, None, t),
            "w_down": P(None, t, None),
        },
        "final_norm": P(),
        "lm_head": P(None, t),  # vocab-column sharded (lm_head_logits)
    }


def hybrid_linear_param_specs(layer_types, tp_axis: str = "tp") -> dict:
    """PartitionSpecs for the hybrid-linear (attention + mamba) param tree.

    Attention layers shard Megatron-style like Llama; mamba mixer layers are
    REPLICATED: their params and state cells are tiny relative to the
    attention/MLP weights, and sharding d_inner would force restriping the
    packed conv++ssm super cells per shard (models/mamba.py pack_cell) for
    negligible FLOP savings.  ``layer_types`` is the config's per-layer
    ("attn" | "mamba") tuple — the params["layers"] python list mirrors it.
    """
    t = tp_axis
    attn = {
        "attn_norm": P(),
        "wq": P(None, t),
        "wk": P(None, t),
        "wv": P(None, t),
        "wo": P(t, None),
        "mlp_norm": P(),
        "w_gate": P(None, t),
        "w_up": P(None, t),
        "w_down": P(t, None),
    }
    mamba = {
        "norm": P(), "in_proj": P(), "conv_w": P(), "a_log": P(),
        "dt_proj": P(), "b_proj": P(), "c_proj": P(), "out_proj": P(),
    }
    return {
        "embed": P(),
        "layers": [attn if k == "attn" else mamba for k in layer_types],
        "final_norm": P(),
        "lm_head": P(None, t),  # vocab-column sharded (lm_head_logits)
    }


def pool_spec_partition(tp_axis: str = "tp") -> P:
    """Pools [L, pages, kv_heads, page_tokens, head_dim] shard on kv heads."""
    return P(None, None, tp_axis)


def shard_tree(tree, mesh: Mesh, specs) -> dict:
    """device_put every leaf of ``tree`` with its PartitionSpec from
    ``specs`` (same structure, P leaves)."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params: dict, mesh: Mesh, tp_axis: str = "tp") -> dict:
    return shard_tree(params, mesh, llama_param_specs(
        tp_axis, bias="bq" in params["layers"],
        qk_norm="q_norm" in params["layers"]))


def build_sharded_decode_step(
    cfg: LlamaConfig,
    mesh: Mesh,
    *,
    tp_axis: str = "tp",
    dp_axis: str | None = "dp",
    interpret: bool = False,
):
    """Jitted single decode step over a (dp, tp) mesh.

    Batch shards over dp; heads/pools over tp.  Returns a function
    ``(params, k_pools, v_pools, tokens, positions, page_tables, slot_pages,
    slot_offsets, seq_lens) -> (logits, k_pools, v_pools)`` with pools
    donated.
    """
    pspecs = llama_param_specs(
        tp_axis, bias=getattr(cfg, "attention_bias", False),
        qk_norm=getattr(cfg, "qk_norm", False))
    pool_p = pool_spec_partition(tp_axis)
    bd = P(dp_axis) if dp_axis else P()
    b2 = P(dp_axis, None) if dp_axis else P()

    def step(params, k_pools, v_pools, tokens, positions, page_tables,
             slot_pages, slot_offsets, seq_lens):
        return llama_decode_step(
            params, cfg, tokens, positions, k_pools, v_pools,
            page_tables, slot_pages, slot_offsets, seq_lens,
            tp_axis=tp_axis, interpret=interpret,
        )

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(
            pspecs, pool_p, pool_p, bd, bd, b2, bd, bd, bd,
        ),
        out_specs=(bd, pool_p, pool_p),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(1, 2))
