"""Pipeline-parallel STAGE PLACEMENT: stages on disjoint devices.

`parallel/pp.py` gives each stage its own elastic pool/manager/shm limit
but executes every stage on one chip.  This module places the stages on
disjoint devices of a mesh with a ``pp`` axis — PP's actual purpose
(models bigger than one device), matching the reference where engines
really run PP across GPUs with per-stage KV
(/root/reference/kvcached/integration/vllm/patches.py:654-664,978-1005).

TPU-native form (the standard shard_map pipeline):

- stage ``s`` holds layers ``[s·Lp, (s+1)·Lp)`` — the layer stack reshapes
  to ``[S, Lp, ...]`` and shards on the ``pp`` mesh axis, so each stage's
  weights AND its KV pool live only in that stage's device memory;
- activations flow stage→stage over ICI via ``lax.ppermute``;
- the decode batch splits into microbatches on a pipeline schedule
  (tick t: stage s works on microbatch t−s), so stages stay busy instead
  of idling S−1/S of the time;
- per-stage page tables/slot pages shard on the stage axis; an INACTIVE
  tick routes its writes to the zero page (defined-write discard), the
  same mechanism that protects decode-horizon overflow.

Embedding / final norm / LM head are replicated (bytes are small next to
the layer stack; stage 0 reads the embedding, the last stage the head —
XLA keeps the unused copies idle).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..models.llama import lm_head_logits, qkv_heads, rms_norm, rope
from ..ops.paged_attention import (
    paged_attention_decode,
    paged_attention_verify,
    write_decode_tokens,
    write_prefill_kv,
)
from ..ops.paged_prefill import (
    paged_prefill_attention,
    paged_prefill_attention_batch,
)


def pp_param_specs(tp_axis: str | None = None, pp_axis: str = "pp", *,
                   bias: bool = False, qk_norm: bool = False) -> dict:
    """Specs for the STAGE-STACKED llama tree ([S, Lp, ...] layers).

    With ``tp_axis``, each stage's weights additionally shard
    Megatron-style within the stage's tp group (pp×tp composition).
    ``bias``: the tree carries Qwen2-class qkv biases (bq/bk/bv)."""
    s, t = pp_axis, tp_axis
    if t is None:
        layer = P(s)
        layers = {
            "attn_norm": layer, "wq": layer, "wk": layer, "wv": layer,
            "wo": layer, "mlp_norm": layer, "w_gate": layer,
            "w_up": layer, "w_down": layer,
        }
        if bias:
            layers.update(bq=layer, bk=layer, bv=layer)
        if qk_norm:
            layers.update(q_norm=layer, k_norm=layer)
        return {
            "embed": P(),
            "layers": layers,
            "final_norm": P(),
            "lm_head": P(),
        }
    layers = {
        "attn_norm": P(s),
        "wq": P(s, None, None, t),
        "wk": P(s, None, None, t),
        "wv": P(s, None, None, t),
        "wo": P(s, None, t, None),
        "mlp_norm": P(s),
        "w_gate": P(s, None, None, t),
        "w_up": P(s, None, None, t),
        "w_down": P(s, None, t, None),
    }
    if bias:
        layers.update(
            bq=P(s, None, t), bk=P(s, None, t), bv=P(s, None, t)
        )
    if qk_norm:
        # [S, Lp, head_dim]: stage-sharded only (shared by all heads)
        layers.update(q_norm=P(s), k_norm=P(s))
    return {
        "embed": P(),
        "layers": layers,
        "final_norm": P(),
        # vocab-column sharded within each stage's tp group (lm_head_logits
        # all-gathers); replicated across stages
        "lm_head": P(None, t),
    }


def stack_pp_params(params: dict, num_stages: int) -> dict:
    """[L, ...] layer stack -> [S, Lp, ...] (stage-major)."""
    def stack(a):
        L = a.shape[0]
        assert L % num_stages == 0
        return a.reshape(num_stages, L // num_stages, *a.shape[1:])

    return {
        "embed": params["embed"],
        "layers": {k: stack(v) for k, v in params["layers"].items()},
        "final_norm": params["final_norm"],
        "lm_head": params["lm_head"],
    }


def _stage_perm(S: int):
    return [(i, (i + 1) % S) for i in range(S)]


def _local_scales(scales):
    """[1, Lp, KH_local] shard_map views -> ([Lp, KH], [Lp, KH])."""
    if not scales:
        return None, None
    return scales[0][0], scales[1][0]


def _make_layer_walks(cfg, layers, Lp, H, KH, D, ptp, interpret,
                      k_sc, v_sc):
    """ONE copy of each per-layer body (decode / verify / prefill /
    batched prefill) over a stage's LOCAL layer stack, shared by
    build_pp_impls and build_pp_combined_impl — the int8 cast discipline,
    rope shapes, per-layer scale indexing, and psum placement live here
    exactly once.

    ``collect`` (static per call site): also return the per-layer (k, v)
    written, for the dp replica equalizer."""
    scales = k_sc is not None
    ls = {"p": layers, "i": jnp.arange(Lp)}

    def _mlp(x, lp):
        h = rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
        return x + ptp((jax.nn.silu(h @ lp["w_gate"])
                        * (h @ lp["w_up"])) @ lp["w_down"])

    def decode_walk(x, pos, sl, tbl, sp, so, k_pool, v_pool,
                    collect=False):
        mb = x.shape[0]
        int8_kv = jnp.dtype(k_pool.dtype) == jnp.int8

        def layer_fn(carry, layer):
            x, k_pool, v_pool = carry
            lp, l_idx = layer["p"], layer["i"]
            h = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
            q, k, v = qkv_heads(h, lp, H, KH, D, cfg.rms_eps)
            q = rope(q[:, None], pos[:, None], cfg.rope_theta,
                 getattr(cfg, "rope_scaling", None))[:, 0]
            k = rope(k[:, None], pos[:, None], cfg.rope_theta,
                 getattr(cfg, "rope_scaling", None))[:, 0]
            attn, k_pool, v_pool = paged_attention_decode(
                q, k_pool, v_pool, tbl, sl, l_idx,
                k if int8_kv else k.astype(k_pool.dtype),
                v if int8_kv else v.astype(v_pool.dtype),
                sp, so, interpret=interpret,
                k_scales=k_sc, v_scales=v_sc,
            )
            x = x + ptp(attn.reshape(mb, H * D) @ lp["wo"])
            x = _mlp(x, lp)
            return (x, k_pool, v_pool), ((k, v) if collect else None)

        (x, k_pool, v_pool), kv = jax.lax.scan(
            layer_fn, (x, k_pool, v_pool), ls
        )
        return x, k_pool, v_pool, kv

    def verify_walk(x, pos, sl, tbl, sp, so, k_pool, v_pool,
                    collect=False):
        mb, T = x.shape[0], x.shape[1]
        int8_kv = jnp.dtype(k_pool.dtype) == jnp.int8

        def layer_fn(carry, layer):
            x, k_pool, v_pool = carry
            lp, l_idx = layer["p"], layer["i"]
            h = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
            q, k, v = qkv_heads(h, lp, H, KH, D, cfg.rms_eps)
            q = rope(q, pos, cfg.rope_theta,
                 getattr(cfg, "rope_scaling", None))
            k = rope(k, pos, cfg.rope_theta,
                 getattr(cfg, "rope_scaling", None))
            attn, k_pool, v_pool = paged_attention_verify(
                q, k_pool, v_pool, tbl, sl, l_idx,
                k if int8_kv else k.astype(k_pool.dtype),
                v if int8_kv else v.astype(v_pool.dtype),
                sp, so, interpret=interpret,
                k_scales=k_sc, v_scales=v_sc,
            )  # [mb, T, H, D]
            x = x + ptp(attn.reshape(mb, T, H * D) @ lp["wo"])
            x = _mlp(x, lp)
            return (x, k_pool, v_pool), ((k, v) if collect else None)

        (x, k_pool, v_pool), kv = jax.lax.scan(
            layer_fn, (x, k_pool, v_pool), ls
        )
        return x, k_pool, v_pool, kv

    def prefill_walk(x, pos, cp, table, q_lo, kv_len, k_pool, v_pool):
        tile = x.shape[0]

        def layer_fn(carry, layer):
            x, k_pool, v_pool = carry
            lp, l_idx = layer["p"], layer["i"]
            h = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
            q, k, v = qkv_heads(h, lp, H, KH, D, cfg.rms_eps)
            q = rope(q, pos, cfg.rope_theta,
                 getattr(cfg, "rope_scaling", None))
            k = rope(k, pos, cfg.rope_theta,
                 getattr(cfg, "rope_scaling", None))
            k_pool, v_pool = write_prefill_kv(
                k_pool, v_pool, k.transpose(1, 0, 2),
                v.transpose(1, 0, 2), cp, l_idx, interpret=interpret,
                k_scale=k_sc[l_idx] if scales else None,
                v_scale=v_sc[l_idx] if scales else None,
            )
            attn = paged_prefill_attention(
                q, k_pool, v_pool, table, q_lo, kv_len, l_idx,
                interpret=interpret, k_scales=k_sc, v_scales=v_sc,
            )
            x = x + ptp(attn.reshape(tile, H * D) @ lp["wo"])
            x = _mlp(x, lp)
            return (x, k_pool, v_pool), None

        (x, k_pool, v_pool), _ = jax.lax.scan(
            layer_fn, (x, k_pool, v_pool), ls
        )
        return x, k_pool, v_pool

    def prefill_batch_walk(x, pos, cp, tables, q_los, kv_lens,
                           k_pool, v_pool):
        N, tile = x.shape[0], x.shape[1]

        def layer_fn(carry, layer):
            x, k_pool, v_pool = carry
            lp, l_idx = layer["p"], layer["i"]
            h = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
            q, k, v = qkv_heads(h, lp, H, KH, D, cfg.rms_eps)
            q = rope(q, pos, cfg.rope_theta,
                 getattr(cfg, "rope_scaling", None))
            k = rope(k, pos, cfg.rope_theta,
                 getattr(cfg, "rope_scaling", None))
            # page writes are sequence-agnostic: flatten the batch into
            # one [KH, N*tile, D] stream over [N * tile/P] pages
            k_pool, v_pool = write_prefill_kv(
                k_pool, v_pool,
                k.transpose(2, 0, 1, 3).reshape(KH, N * tile, D),
                v.transpose(2, 0, 1, 3).reshape(KH, N * tile, D),
                cp.reshape(-1), l_idx, interpret=interpret,
                k_scale=k_sc[l_idx] if scales else None,
                v_scale=v_sc[l_idx] if scales else None,
            )
            attn = paged_prefill_attention_batch(
                q, k_pool, v_pool, tables, q_los, kv_lens, l_idx,
                interpret=interpret, k_scales=k_sc, v_scales=v_sc,
            )  # [N, tile, H, D]
            x = x + ptp(attn.reshape(N, tile, H * D) @ lp["wo"])
            x = _mlp(x, lp)
            return (x, k_pool, v_pool), None

        (x, k_pool, v_pool), _ = jax.lax.scan(
            layer_fn, (x, k_pool, v_pool), ls
        )
        return x, k_pool, v_pool

    return decode_walk, verify_walk, prefill_walk, prefill_batch_walk


def build_pp_impls(cfg, mesh, layers_per_stage: int, *,
                   microbatches: int = 2, interpret: bool = False,
                   pp_axis: str = "pp", tp_axis: str | None = None,
                   dp_axis: str | None = None, quantized: bool = False):
    """Returns (decode_step_impl, prefill_step_impl, verify_step_impl,
    prefill_batch_step_impl) with the engine's standard multi-group
    signatures, executing the layer stack as a device-placed pipeline.

    decode: page_tables [S, B, max_pages], slot_pages [S, B] (stage axis
    sharded); tokens/positions/slot_offsets/seq_lens [B] replicated.
    Token-exact vs the single-device layer walk: each microbatch passes
    through every stage exactly once, writes its KV into the owning
    stage's pool, and inactive pipeline ticks discard via the zero page.

    verify (spec decode): tokens [B, T]; microbatched over B like decode,
    each row verifying its T fed tokens in one fused pass per stage.

    prefill_batch: tokens [N, T] with per-stage chunk_pages [S, N, n] /
    page_tables [S, N, max_pages]; the chunk pipelines through the stages
    in page-aligned microtiles with all N rows riding each tile.

    ``quantized``: int8 pools — every impl takes two trailing scale args,
    STAGE-STACKED [S, Lp, KH] f32 (sharded on the stage axis; under tp
    also on the head axis), so each stage's layers carry their own
    per-head dequantization scales.

    ``dp_axis``: decode/verify additionally shard the batch over dp.
    Each dp replica's pipeline writes only its own rows into its stage
    pool REPLICA, so after the pipeline drains every stage all-gathers
    the per-token K/V over dp and replays ALL rows through the decode
    writer — keeping stage-pool replicas bit-identical (the same
    equalization the dp×tp path uses, engine.py _equalize_kv).  Prefill
    (single and batched) replicates over dp: every replica computes
    identical writes.
    """
    S = mesh.shape[pp_axis]
    Lp = layers_per_stage
    E = cfg.hidden_size
    V = cfg.vocab_size
    H, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    tp = mesh.shape[tp_axis] if tp_axis else 1
    H, KH = H // tp, KH // tp  # per-shard heads within each stage
    perm = _stage_perm(S)
    _ptp = (lambda y: jax.lax.psum(y, tp_axis)) if tp_axis else (lambda y: y)
    equalize = dp_axis is not None and mesh.shape[dp_axis] > 1

    # ---------------------------------------------------------------- decode
    def pp_decode(params, tokens, positions, k_pools, v_pools,
                  page_tables, slot_pages, slot_offsets, seq_lens,
                  *scales):
        # local views under shard_map: leading stage dim of size 1
        s = jax.lax.axis_index(pp_axis)
        B = tokens.shape[0]
        M = min(microbatches, B)
        while B % M:
            M -= 1
        mb = B // M
        layers = jax.tree.map(lambda a: a[0], params["layers"])  # [Lp, ...]
        k_pool, v_pool = k_pools[0], v_pools[0]
        table = page_tables[0]  # [B, max_pages] this stage's rows
        spages = slot_pages[0]  # [B]
        k_sc, v_sc = _local_scales(scales)
        decode_walk, _, _, _ = _make_layer_walks(
            cfg, layers, Lp, H, KH, D, _ptp, interpret, k_sc, v_sc
        )

        def stage_layers(x, rows, k_pool, v_pool, active):
            sp = jnp.where(active, spages[rows], 0)  # inactive → discard
            return decode_walk(
                x, positions[rows], seq_lens[rows], table[rows], sp,
                slot_offsets[rows], k_pool, v_pool, collect=equalize,
            )

        def tick(carry, t):
            x_buf, k_pool, v_pool, logits_buf = carry
            m = t - s  # microbatch this stage works on at tick t
            active = (m >= 0) & (m < M)
            m_c = jnp.clip(m, 0, M - 1)
            rows = m_c * mb + jnp.arange(mb)
            # stage 0 ingests fresh embeddings; later stages consume the
            # activation ppermute delivered last tick
            x_in = jnp.where(s == 0, params["embed"][tokens[rows]], x_buf)
            x_out, k_pool, v_pool, kv = stage_layers(
                x_in, rows, k_pool, v_pool, active
            )
            # last stage: head + accumulate this microbatch's logits
            xf = rms_norm(x_out, params["final_norm"], cfg.rms_eps)
            lg = lm_head_logits(xf, params["lm_head"], tp_axis)  # [mb, V]
            write = active & (s == S - 1)
            old = jax.lax.dynamic_slice(logits_buf, (m_c * mb, 0), (mb, V))
            logits_buf = jax.lax.dynamic_update_slice(
                logits_buf, jnp.where(write, lg, old), (m_c * mb, 0)
            )
            x_buf = jax.lax.ppermute(x_out, pp_axis, perm)
            return (x_buf, k_pool, v_pool, logits_buf), kv

        carry = (
            jnp.zeros((mb, E), x_dtype(params)),
            k_pool, v_pool,
            jnp.zeros((B, V), jnp.float32),
        )
        carry, kvs = jax.lax.scan(tick, carry, jnp.arange(M + S - 1))
        _, k_pool, v_pool, logits = carry
        if equalize:
            # dp>1: this replica's pipeline wrote only its LOCAL rows.
            # Ticks [s, s+M) are exactly this stage's active ticks (tick
            # t works microbatch t−s), so slicing there drops the
            # fill/drain garbage; all-gather the per-token K/V over dp
            # and replay ALL rows so stage-pool replicas stay identical.
            ks, vs = kvs  # [ticks, Lp, mb, KH, D]

            def flat(a):
                a = jax.lax.dynamic_slice_in_dim(a, s, M, axis=0)
                a = jnp.moveaxis(a, 0, 1)  # [Lp, M, mb, ...]
                return a.reshape(Lp, M * mb, *a.shape[3:])

            ks = jax.lax.all_gather(flat(ks), dp_axis, axis=1, tiled=True)
            vs = jax.lax.all_gather(flat(vs), dp_axis, axis=1, tiled=True)
            sp = jax.lax.all_gather(spages, dp_axis, axis=0, tiled=True)
            so = jax.lax.all_gather(
                slot_offsets, dp_axis, axis=0, tiled=True
            )
            sp_l = jnp.broadcast_to(sp[None], (Lp, sp.shape[0]))
            k_pool, v_pool = write_decode_tokens(
                k_pool, v_pool, ks, vs, jnp.arange(Lp, dtype=jnp.int32),
                sp_l, so, interpret=interpret,
                k_scales=k_sc, v_scales=v_sc,
            )
        # only the last stage wrote logits; make them visible everywhere
        logits = jax.lax.psum(logits, pp_axis)
        return logits, k_pool[None], v_pool[None]

    # --------------------------------------------------------------- prefill
    def pp_prefill(params, tokens, positions, k_pools, v_pools,
                   chunk_pages, page_table, q_start, true_len, *scales):
        """The chunk pipelines through the stages in PAGE-ALIGNED
        microtiles (tile m hits stage s at tick m+s), so stages overlap
        instead of idling (S−1)/S of the prefill.  Causality makes the
        tiling safe without extra masking: a query in tile m attends only
        positions ≤ its own, and every such position's KV was written by
        tile ≤ m, which already passed this stage (the per-stage pipeline
        order preserves tile order)."""
        s = jax.lax.axis_index(pp_axis)
        T = tokens.shape[0]
        n_pages = chunk_pages.shape[1]
        # tiles must be whole pages; cap at the microbatch knob
        Mt = max(d for d in range(1, min(microbatches, n_pages) + 1)
                 if n_pages % d == 0)
        tile = T // Mt
        kv_len = q_start + true_len
        layers = jax.tree.map(lambda a: a[0], params["layers"])
        k_pool, v_pool = k_pools[0], v_pools[0]
        table = page_table[0]  # [max_pages]
        cpages = chunk_pages[0]  # [n_pages]
        k_sc, v_sc = _local_scales(scales)
        _, _, prefill_walk, _ = _make_layer_walks(
            cfg, layers, Lp, H, KH, D, _ptp, interpret, k_sc, v_sc
        )

        def stage_layers(x, m, k_pool, v_pool, active):
            # tile m's token span and its pages
            tok0 = m * tile
            pos = jax.lax.dynamic_slice(positions, (tok0,), (tile,))
            cp = jnp.where(
                active,
                jax.lax.dynamic_slice(
                    cpages, (m * (n_pages // Mt),), (n_pages // Mt,)
                ),
                0,
            )
            return prefill_walk(
                x, pos, cp, table, q_start + tok0, kv_len, k_pool, v_pool
            )

        def tick(carry, t):
            x_buf, k_pool, v_pool, out_buf = carry
            m = t - s
            active = (m >= 0) & (m < Mt)
            m_c = jnp.clip(m, 0, Mt - 1)
            tok_ids = jax.lax.dynamic_slice(tokens, (m_c * tile,), (tile,))
            x_in = jnp.where(s == 0, params["embed"][tok_ids], x_buf)
            x_out, k_pool, v_pool = stage_layers(
                x_in, m_c, k_pool, v_pool, active
            )
            # last stage keeps every tile's hidden states — the chunk's
            # final real token may sit in any tile
            write = active & (s == S - 1)
            old = jax.lax.dynamic_slice(
                out_buf, (m_c * tile, 0), (tile, E)
            )
            out_buf = jax.lax.dynamic_update_slice(
                out_buf, jnp.where(write, x_out, old), (m_c * tile, 0)
            )
            x_buf = jax.lax.ppermute(x_out, pp_axis, perm)
            return (x_buf, k_pool, v_pool, out_buf), None

        carry = (
            jnp.zeros((tile, E), x_dtype(params)),
            k_pool, v_pool,
            jnp.zeros((T, E), x_dtype(params)),
        )
        carry, _ = jax.lax.scan(tick, carry, jnp.arange(Mt + S - 1))
        _, k_pool, v_pool, out_buf = carry
        xf = rms_norm(
            out_buf[jnp.maximum(true_len - 1, 0)], params["final_norm"],
            cfg.rms_eps,
        )
        logits = lm_head_logits(xf, params["lm_head"], tp_axis)
        # only the last stage held real hidden states
        logits = jnp.where(s == S - 1, logits, 0.0)
        logits = jax.lax.psum(logits, pp_axis)
        return logits, k_pool[None], v_pool[None]

    # ---------------------------------------------------------------- verify
    def pp_verify(params, tokens, positions, k_pools, v_pools,
                  page_tables, slot_pages, slot_offsets, seq_lens,
                  *scales):
        """Spec-decode verification pipeline: tokens [B, T], page_tables
        [S, B, max_pages], slot_pages [S, B, T]; microbatched over B like
        decode, each row's T fed tokens verified in one fused pass per
        stage."""
        s = jax.lax.axis_index(pp_axis)
        B, T = tokens.shape
        M = min(microbatches, B)
        while B % M:
            M -= 1
        mb = B // M
        layers = jax.tree.map(lambda a: a[0], params["layers"])
        k_pool, v_pool = k_pools[0], v_pools[0]
        table = page_tables[0]  # [B, max_pages]
        spages = slot_pages[0]  # [B, T]
        k_sc, v_sc = _local_scales(scales)
        _, verify_walk, _, _ = _make_layer_walks(
            cfg, layers, Lp, H, KH, D, _ptp, interpret, k_sc, v_sc
        )

        def stage_layers(x, rows, k_pool, v_pool, active):
            sp = jnp.where(active, spages[rows], 0)  # [mb, T]
            return verify_walk(
                x, positions[rows], seq_lens[rows], table[rows], sp,
                slot_offsets[rows], k_pool, v_pool, collect=equalize,
            )

        def tick(carry, t):
            x_buf, k_pool, v_pool, logits_buf = carry
            m = t - s
            active = (m >= 0) & (m < M)
            m_c = jnp.clip(m, 0, M - 1)
            rows = m_c * mb + jnp.arange(mb)
            x_in = jnp.where(s == 0, params["embed"][tokens[rows]], x_buf)
            x_out, k_pool, v_pool, kv = stage_layers(
                x_in, rows, k_pool, v_pool, active
            )
            xf = rms_norm(x_out, params["final_norm"], cfg.rms_eps)
            lg = lm_head_logits(xf, params["lm_head"], tp_axis)  # [mb, T, V]
            write = active & (s == S - 1)
            old = jax.lax.dynamic_slice(
                logits_buf, (m_c * mb, 0, 0), (mb, T, V)
            )
            logits_buf = jax.lax.dynamic_update_slice(
                logits_buf, jnp.where(write, lg, old), (m_c * mb, 0, 0)
            )
            x_buf = jax.lax.ppermute(x_out, pp_axis, perm)
            return (x_buf, k_pool, v_pool, logits_buf), kv

        carry = (
            jnp.zeros((mb, T, E), x_dtype(params)),
            k_pool, v_pool,
            jnp.zeros((B, T, V), jnp.float32),
        )
        carry, kvs = jax.lax.scan(tick, carry, jnp.arange(M + S - 1))
        _, k_pool, v_pool, logits = carry
        if equalize:
            # same replica equalization as decode, with the (row, token)
            # pairs flattened into writer rows
            ks, vs = kvs  # [ticks, Lp, mb, T, KH, D]

            def flat(a):
                a = jax.lax.dynamic_slice_in_dim(a, s, M, axis=0)
                a = jnp.moveaxis(a, 0, 1)  # [Lp, M, mb, T, ...]
                return a.reshape(Lp, M * mb * T, *a.shape[4:])

            ks = jax.lax.all_gather(flat(ks), dp_axis, axis=1, tiled=True)
            vs = jax.lax.all_gather(flat(vs), dp_axis, axis=1, tiled=True)
            sp = jax.lax.all_gather(
                spages.reshape(-1), dp_axis, axis=0, tiled=True
            )
            so = jax.lax.all_gather(
                slot_offsets.reshape(-1), dp_axis, axis=0, tiled=True
            )
            sp_l = jnp.broadcast_to(sp[None], (Lp, sp.shape[0]))
            k_pool, v_pool = write_decode_tokens(
                k_pool, v_pool, ks, vs, jnp.arange(Lp, dtype=jnp.int32),
                sp_l, so, interpret=interpret,
                k_scales=k_sc, v_scales=v_sc,
            )
        logits = jax.lax.psum(logits, pp_axis)
        return logits, k_pool[None], v_pool[None]

    # --------------------------------------------------------- batch prefill
    def pp_prefill_batch(params, tokens, positions, k_pools, v_pools,
                         chunk_pages, page_tables, q_starts, true_lens,
                         *scales):
        """Batched prefill pipeline: N rows' chunks share one bucket T and
        pipeline through the stages together in page-aligned microtiles
        (all N rows ride each tile — prefill is weight-streaming-bound, so
        the win is streaming each stage's weights once per tile for all N
        rows).  chunk_pages [S, N, n], page_tables [S, N, max_pages]."""
        s = jax.lax.axis_index(pp_axis)
        N, T = tokens.shape
        n_pages = chunk_pages.shape[2]
        Mt = max(d for d in range(1, min(microbatches, n_pages) + 1)
                 if n_pages % d == 0)
        tile = T // Mt
        tpp = n_pages // Mt  # tile pages per row
        kv_lens = q_starts + true_lens
        layers = jax.tree.map(lambda a: a[0], params["layers"])
        k_pool, v_pool = k_pools[0], v_pools[0]
        tables = page_tables[0]  # [N, max_pages]
        cpages = chunk_pages[0]  # [N, n_pages]
        k_sc, v_sc = _local_scales(scales)
        _, _, _, prefill_batch_walk = _make_layer_walks(
            cfg, layers, Lp, H, KH, D, _ptp, interpret, k_sc, v_sc
        )

        def stage_layers(x, m, k_pool, v_pool, active):
            # tile m's token span ([N, tile]) and its pages per row
            tok0 = m * tile
            pos = jax.lax.dynamic_slice(
                positions, (0, tok0), (N, tile)
            )
            cp = jnp.where(
                active,
                jax.lax.dynamic_slice(cpages, (0, m * tpp), (N, tpp)),
                0,
            )
            return prefill_batch_walk(
                x, pos, cp, tables, q_starts + tok0, kv_lens,
                k_pool, v_pool,
            )

        def tick(carry, t):
            x_buf, k_pool, v_pool, out_buf = carry
            m = t - s
            active = (m >= 0) & (m < Mt)
            m_c = jnp.clip(m, 0, Mt - 1)
            tok_ids = jax.lax.dynamic_slice(
                tokens, (0, m_c * tile), (N, tile)
            )
            x_in = jnp.where(s == 0, params["embed"][tok_ids], x_buf)
            x_out, k_pool, v_pool = stage_layers(
                x_in, m_c, k_pool, v_pool, active
            )
            # last stage keeps every tile's hidden states — each row's
            # final real token may sit in any tile
            write = active & (s == S - 1)
            old = jax.lax.dynamic_slice(
                out_buf, (0, m_c * tile, 0), (N, tile, E)
            )
            out_buf = jax.lax.dynamic_update_slice(
                out_buf, jnp.where(write, x_out, old), (0, m_c * tile, 0)
            )
            x_buf = jax.lax.ppermute(x_out, pp_axis, perm)
            return (x_buf, k_pool, v_pool, out_buf), None

        carry = (
            jnp.zeros((N, tile, E), x_dtype(params)),
            k_pool, v_pool,
            jnp.zeros((N, T, E), x_dtype(params)),
        )
        carry, _ = jax.lax.scan(tick, carry, jnp.arange(Mt + S - 1))
        _, k_pool, v_pool, out_buf = carry
        xf = rms_norm(
            out_buf[jnp.arange(N), jnp.maximum(true_lens - 1, 0)],
            params["final_norm"], cfg.rms_eps,
        )  # [N, E]
        logits = lm_head_logits(xf, params["lm_head"], tp_axis)
        logits = jnp.where(s == S - 1, logits, 0.0)
        logits = jax.lax.psum(logits, pp_axis)
        return logits, k_pool[None], v_pool[None]

    # ------------------------------------------------------------ shard_map
    pool = (P(pp_axis, None, None, tp_axis) if tp_axis else P(pp_axis))
    rep = P()
    # decode/verify batch arrays shard over dp (replicated when absent)
    bd = P(dp_axis) if dp_axis else P()  # [B]
    bd2 = P(dp_axis, None) if dp_axis else P()  # [B, T]
    tbl = P(pp_axis, dp_axis, None)  # [S, B, max_pages]
    sp2 = P(pp_axis, dp_axis)  # [S, B]
    sp3 = P(pp_axis, dp_axis, None)  # [S, B, T]
    stage2 = P(pp_axis, None)  # [S, n] single-sequence prefill
    stage3 = P(pp_axis, None, None)  # [S, N, ...] batched prefill (dp-rep)
    logit_out = P(dp_axis) if dp_axis else P()
    pspecs = pp_param_specs(tp_axis, pp_axis=pp_axis,
                            bias=getattr(cfg, "attention_bias", False),
                            qk_norm=getattr(cfg, "qk_norm", False))
    # int8 scales: stage-stacked [S, Lp, KH], head axis sharded under tp
    sc = (P(pp_axis, None, tp_axis) if tp_axis else P(pp_axis))
    sc_specs = (sc, sc) if quantized else ()

    decode_impl = jax.shard_map(
        pp_decode, mesh=mesh,
        in_specs=(pspecs, bd, bd, pool, pool, tbl, sp2, bd, bd)
        + sc_specs,
        out_specs=(logit_out, pool, pool),
        check_vma=False,
    )
    prefill_impl = jax.shard_map(
        pp_prefill, mesh=mesh,
        in_specs=(pspecs, rep, rep, pool, pool, stage2, stage2, rep, rep)
        + sc_specs,
        out_specs=(rep, pool, pool),
        check_vma=False,
    )
    verify_impl = jax.shard_map(
        pp_verify, mesh=mesh,
        in_specs=(pspecs, bd2, bd2, pool, pool, tbl, sp3, bd2, bd)
        + sc_specs,
        out_specs=(logit_out, pool, pool),
        check_vma=False,
    )
    prefill_batch_impl = jax.shard_map(
        pp_prefill_batch, mesh=mesh,
        in_specs=(pspecs, rep, rep, pool, pool, stage3, stage3, rep, rep)
        + sc_specs,
        out_specs=(rep, pool, pool),
        check_vma=False,
    )
    return decode_impl, prefill_impl, verify_impl, prefill_batch_impl


def x_dtype(params) -> jnp.dtype:
    return params["embed"].dtype


def build_pp_combined_impl(cfg, mesh, layers_per_stage: int, *,
                           microbatches: int = 2, interpret: bool = False,
                           pp_axis: str = "pp", tp_axis: str | None = None,
                           dp_axis: str | None = None,
                           quantized: bool = False):
    """1F1B-style prefill/decode overlap: ONE dispatch pipelines a prefill
    chunk's page-aligned microtiles AND a one-step decode's microbatches
    through the stages on a single schedule (items = [tile_0..tile_{Mt-1},
    mb_0..mb_{M-1}], item i hits stage s at tick i+s).

    Separately dispatched, the two pipelines each pay S−1 fill/drain
    bubble ticks and the host pays two dispatches; combined, the decode
    microbatches flow into the bubbles the prefill drain leaves behind
    (and vice versa) and the host pays one dispatch.  The engine uses
    this whenever a chunked prefill is in flight alongside running
    sequences — the schedule where the separate-dispatch engine
    previously let decode starve (engine.step(): chunk on odd ticks,
    decode on even).

    Prefill items and decode items carry their activations in SEPARATE
    pipeline buffers (shapes differ: [tile, E] vs [mb, E]); both
    ppermute every tick, and a per-tick ``lax.cond`` selects which
    branch a stage runs.  Items of one type are consecutive, so each
    buffer always holds the activation its consumer expects.

    Signature (after params): decode args exactly as pp_decode, then
    prefill args exactly as pp_prefill, then trailing int8 scales when
    ``quantized``.  Returns (decode_logits [B, V], prefill_logits [V],
    k_pools, v_pools).  Token-exact vs separate pp_decode + pp_prefill
    dispatches: the two item families touch disjoint sequences/pages.

    ``dp_axis``: the decode side shards its batch over dp exactly like
    pp_decode while the prefill side stays dp-replicated (every replica
    computes identical prefill writes).  The replay equalizer does NOT
    enter every tick: each tick's collected per-layer K/V rides the scan's
    ys (zeros on prefill/fill/drain ticks), and after the schedule drains
    each stage slices its decode-ACTIVE ticks — exactly [Mt+s, Mt+s+M),
    since decode item i hits stage s at tick i+s — all-gathers them over
    dp ONCE, and replays all rows so stage-pool replicas stay
    bit-identical (the same one-shot equalization pp_decode uses).
    """
    S = mesh.shape[pp_axis]
    Lp = layers_per_stage
    E = cfg.hidden_size
    V = cfg.vocab_size
    H, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    tp = mesh.shape[tp_axis] if tp_axis else 1
    H, KH = H // tp, KH // tp
    perm = _stage_perm(S)
    _ptp = (lambda y: jax.lax.psum(y, tp_axis)) if tp_axis else (lambda y: y)
    equalize = dp_axis is not None and mesh.shape[dp_axis] > 1

    def pp_combined(params, d_tokens, d_positions, k_pools, v_pools,
                    d_page_tables, d_slot_pages, d_slot_offsets, d_seq_lens,
                    p_tokens, p_positions, p_chunk_pages, p_page_table,
                    p_q_start, p_true_len, *scales):
        s = jax.lax.axis_index(pp_axis)
        B = d_tokens.shape[0]
        M = min(microbatches, B)
        while B % M:
            M -= 1
        mb = B // M
        T = p_tokens.shape[0]
        n_pages = p_chunk_pages.shape[1]
        Mt = max(d for d in range(1, min(microbatches, n_pages) + 1)
                 if n_pages % d == 0)
        tile = T // Mt
        tpp = n_pages // Mt
        kv_len = p_q_start + p_true_len
        layers = jax.tree.map(lambda a: a[0], params["layers"])
        k_pool, v_pool = k_pools[0], v_pools[0]
        d_table = d_page_tables[0]  # [B, max_pages]
        d_spages = d_slot_pages[0]  # [B]
        p_table = p_page_table[0]  # [max_pages]
        p_cpages = p_chunk_pages[0]  # [n_pages]
        k_sc, v_sc = _local_scales(scales)
        decode_walk, _, prefill_walk, _ = _make_layer_walks(
            cfg, layers, Lp, H, KH, D, _ptp, interpret, k_sc, v_sc
        )

        def decode_layers(x, rows, k_pool, v_pool, active):
            sp = jnp.where(active, d_spages[rows], 0)
            x, k_pool, v_pool, kv = decode_walk(
                x, d_positions[rows], d_seq_lens[rows], d_table[rows],
                sp, d_slot_offsets[rows], k_pool, v_pool,
                collect=equalize,
            )
            return x, k_pool, v_pool, kv

        def prefill_layers(x, m, k_pool, v_pool, active):
            tok0 = m * tile
            pos = jax.lax.dynamic_slice(p_positions, (tok0,), (tile,))
            cp = jnp.where(
                active,
                jax.lax.dynamic_slice(p_cpages, (m * tpp,), (tpp,)),
                0,
            )
            return prefill_walk(
                x, pos, cp, p_table, p_q_start + tok0, kv_len,
                k_pool, v_pool,
            )

        # the dp replay equalizer's per-tick collection slot: zeros on
        # prefill/fill/drain ticks, the microbatch's per-layer (k, v) on
        # active decode ticks
        kv_zero = (
            (jnp.zeros((Lp, mb, KH, D), x_dtype(params)),
             jnp.zeros((Lp, mb, KH, D), x_dtype(params)))
            if equalize else None
        )

        def tick(carry, t):
            xp_buf, xd_buf, k_pool, v_pool, p_out, d_logits = carry
            i = t - s  # item this stage works at tick t
            is_p = (i >= 0) & (i < Mt)
            is_d = (i >= Mt) & (i < Mt + M)
            m_p = jnp.clip(i, 0, Mt - 1)  # prefill tile index
            m_d = jnp.clip(i - Mt, 0, M - 1)  # decode microbatch index

            def run_prefill(args):
                xp, xd, k_pool, v_pool, p_out, d_logits = args
                tok_ids = jax.lax.dynamic_slice(
                    p_tokens, (m_p * tile,), (tile,)
                )
                x_in = jnp.where(s == 0, params["embed"][tok_ids], xp)
                x_out, k_pool, v_pool = prefill_layers(
                    x_in, m_p, k_pool, v_pool, is_p
                )
                write = is_p & (s == S - 1)
                old = jax.lax.dynamic_slice(
                    p_out, (m_p * tile, 0), (tile, E)
                )
                p_out = jax.lax.dynamic_update_slice(
                    p_out, jnp.where(write, x_out, old), (m_p * tile, 0)
                )
                return (x_out, xd, k_pool, v_pool, p_out, d_logits), kv_zero

            def run_decode(args):
                xp, xd, k_pool, v_pool, p_out, d_logits = args
                rows = m_d * mb + jnp.arange(mb)
                x_in = jnp.where(
                    s == 0, params["embed"][d_tokens[rows]], xd
                )
                x_out, k_pool, v_pool, kv = decode_layers(
                    x_in, rows, k_pool, v_pool, is_d
                )
                xf = rms_norm(x_out, params["final_norm"], cfg.rms_eps)
                lg = lm_head_logits(xf, params["lm_head"], tp_axis)
                write = is_d & (s == S - 1)
                old = jax.lax.dynamic_slice(
                    d_logits, (m_d * mb, 0), (mb, V)
                )
                d_logits = jax.lax.dynamic_update_slice(
                    d_logits, jnp.where(write, lg, old), (m_d * mb, 0)
                )
                return (xp, x_out, k_pool, v_pool, p_out, d_logits), kv

            # fill/drain ticks (neither family active) still run a branch
            # — route them through decode with is_d False: writes discard
            # via the zero page, outputs are never kept
            (xp_buf, xd_buf, k_pool, v_pool, p_out, d_logits), kv = (
                jax.lax.cond(
                    is_p, run_prefill, run_decode,
                    (xp_buf, xd_buf, k_pool, v_pool, p_out, d_logits),
                )
            )
            xp_buf = jax.lax.ppermute(xp_buf, pp_axis, perm)
            xd_buf = jax.lax.ppermute(xd_buf, pp_axis, perm)
            return (xp_buf, xd_buf, k_pool, v_pool, p_out, d_logits), kv

        carry = (
            jnp.zeros((tile, E), x_dtype(params)),
            jnp.zeros((mb, E), x_dtype(params)),
            k_pool, v_pool,
            jnp.zeros((T, E), x_dtype(params)),
            jnp.zeros((B, V), jnp.float32),
        )
        carry, kvs = jax.lax.scan(
            tick, carry, jnp.arange(Mt + M + S - 1)
        )
        _, _, k_pool, v_pool, p_out, d_logits = carry
        if equalize:
            # slice this stage's decode-ACTIVE ticks ([Mt+s, Mt+s+M) —
            # decode item i runs on stage s at tick i+s), all-gather the
            # per-token K/V over dp once, and replay ALL rows so
            # stage-pool replicas stay bit-identical (pp_decode's
            # equalization, hoisted to the dispatch boundary)
            ks, vs = kvs  # [ticks, Lp, mb, KH, D]

            def flat(a):
                a = jax.lax.dynamic_slice_in_dim(a, Mt + s, M, axis=0)
                a = jnp.moveaxis(a, 0, 1)  # [Lp, M, mb, ...]
                return a.reshape(Lp, M * mb, *a.shape[3:])

            ks = jax.lax.all_gather(flat(ks), dp_axis, axis=1, tiled=True)
            vs = jax.lax.all_gather(flat(vs), dp_axis, axis=1, tiled=True)
            sp = jax.lax.all_gather(d_spages, dp_axis, axis=0, tiled=True)
            so = jax.lax.all_gather(
                d_slot_offsets, dp_axis, axis=0, tiled=True
            )
            sp_l = jnp.broadcast_to(sp[None], (Lp, sp.shape[0]))
            k_pool, v_pool = write_decode_tokens(
                k_pool, v_pool, ks, vs, jnp.arange(Lp, dtype=jnp.int32),
                sp_l, so, interpret=interpret,
                k_scales=k_sc, v_scales=v_sc,
            )

        xf = rms_norm(
            p_out[jnp.maximum(p_true_len - 1, 0)], params["final_norm"],
            cfg.rms_eps,
        )
        p_logits = lm_head_logits(xf, params["lm_head"], tp_axis)
        p_logits = jnp.where(s == S - 1, p_logits, 0.0)
        p_logits = jax.lax.psum(p_logits, pp_axis)
        d_logits = jax.lax.psum(d_logits, pp_axis)
        return d_logits, p_logits, k_pool[None], v_pool[None]

    pool = (P(pp_axis, None, None, tp_axis) if tp_axis else P(pp_axis))
    rep = P()
    stage2 = P(pp_axis, None)
    # decode batch arrays shard over dp (replicated when absent); the
    # prefill args always replicate over dp
    bd = P(dp_axis) if dp_axis else P()  # [B]
    tbl = P(pp_axis, dp_axis, None)  # [S, B, max_pages]
    sp2 = P(pp_axis, dp_axis)  # [S, B]
    logit_out = P(dp_axis) if dp_axis else P()
    pspecs = pp_param_specs(tp_axis, pp_axis=pp_axis,
                            bias=getattr(cfg, "attention_bias", False),
                            qk_norm=getattr(cfg, "qk_norm", False))
    sc = (P(pp_axis, None, tp_axis) if tp_axis else P(pp_axis))
    sc_specs = (sc, sc) if quantized else ()

    return jax.shard_map(
        pp_combined, mesh=mesh,
        in_specs=(pspecs, bd, bd, pool, pool, tbl, sp2, bd, bd,
                  rep, rep, stage2, stage2, rep, rep) + sc_specs,
        out_specs=(logit_out, rep, pool, pool),
        check_vma=False,
    )
