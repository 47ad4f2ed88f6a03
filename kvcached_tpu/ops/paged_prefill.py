"""Paged prefill (flash) attention kernel.

Queries are a contiguous chunk of ``T`` new tokens starting at global
position ``q_start``; keys/values are read from the sequence's pages in the
shared pool — including pages reused from the prefix cache and the pages
this chunk just wrote.  One code path covers:

- plain prefill            (q_start = 0),
- prefix-cache hits        (q_start = n_cached_pages × page_tokens),
- chunked prefill          (q_start advances per chunk),

so a cache hit is *bit-identical* to recomputation — the determinism the
reference's acceptance gate demands (tests/test_elastic_serving.py:150-165)
extends to the cache path by construction.

Grid: ``(num_q_tiles,)``; each program owns ``q_tile`` query tokens and
streams kv pages in chunks (double-buffered DMA), with a causal online
softmax in fp32.  Pages whose tokens all exceed the tile's last position
are skipped entirely (block-causal early exit).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _prefill_kernel(
    # scalar prefetch
    page_table_ref,  # [N, max_pages] int32 physical ids per sequence
    meta_ref,  # [N, 2] int32: (q_start, kv_len) per sequence
    layer_ref,  # [1] int32
    k_scales_ref,  # [L, KH] f32: int8 per-head scales (ones if unused)
    v_scales_ref,
    # inputs
    q_ref,  # [1, num_kv_heads, rows_per_tile, head_dim] VMEM (tile of queries)
    k_pool_ref,  # [L, num_pages, num_kv_heads, page_tokens, head_dim] (HBM)
    v_pool_ref,
    # outputs
    o_ref,  # [1, num_kv_heads, rows_per_tile, head_dim]
    # scratch
    k_buf,  # [2, num_kv_heads, C, page_tokens, head_dim]
    v_buf,
    sems,  # [2, C, 2]
    m_scr,  # [num_kv_heads, rows, 128] f32
    l_scr,
    acc_scr,  # [num_kv_heads, rows, head_dim] f32
    *,
    page_tokens: int,
    pages_per_chunk: int,
    num_kv_heads: int,
    group: int,
    q_tile: int,  # query TOKENS per tile
    sm_scale: float,
    v_head_dim: int | None = None,
    window: int | None = None,
    quantized: bool = False,
    logit_softcap: float | None = None,
):
    mla = v_head_dim is not None
    b = pl.program_id(0)  # sequence within the prefill batch
    tile = pl.program_id(1)
    layer = layer_ref[0]
    if quantized:
        from .paged_attention import _select_head_scales

        k_sc = _select_head_scales(
            k_scales_ref, layer, num_kv_heads, (num_kv_heads, 1, 1), 0
        )
        v_sc = _select_head_scales(
            v_scales_ref, layer, num_kv_heads, (num_kv_heads, 1, 1), 0
        )
    q_start = meta_ref[b, 0]
    kv_len = meta_ref[b, 1]
    C = pages_per_chunk
    chunk_tokens = C * page_tokens

    # last kv position any query in this tile may see (causal)
    tile_q_end = q_start + (tile + 1) * q_tile  # exclusive
    kv_hi = jnp.minimum(kv_len, tile_q_end)
    num_pages = pl.cdiv(kv_hi, page_tokens)
    # sliding window: the earliest kv any query in this tile may see
    if window is not None:
        tile_q_start = q_start + tile * q_tile
        first_page = jnp.maximum(tile_q_start - window + 1, 0) // page_tokens
    else:
        first_page = 0
    num_chunks = pl.cdiv(num_pages - first_page, C)

    def page_dma(chunk, j, slot, kv):
        page_idx = jnp.minimum(first_page + chunk * C + j, num_pages - 1)
        page_id = page_table_ref[b, page_idx]
        pool = k_pool_ref if kv == 0 else v_pool_ref
        buf = k_buf if kv == 0 else v_buf
        return pltpu.make_async_copy(
            pool.at[layer, page_id], buf.at[slot, :, j], sems.at[slot, j, kv]
        )

    def start_chunk(chunk, slot):
        for j in range(C):
            page_dma(chunk, j, slot, 0).start()
            if not mla:
                page_dma(chunk, j, slot, 1).start()

    def wait_chunk(chunk, slot):
        for j in range(C):
            page_dma(chunk, j, slot, 0).wait()
            if not mla:
                page_dma(chunk, j, slot, 1).wait()

    m_scr[...] = jnp.full_like(m_scr, DEFAULT_MASK_VALUE)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    rows = q_ref.shape[2]

    @pl.when(num_pages > 0)
    def _():
        start_chunk(0, 0)

        def body(c, _):
            slot = jax.lax.rem(c, 2)
            next_slot = jax.lax.rem(c + 1, 2)

            @pl.when(c + 1 < num_chunks)
            def _():
                start_chunk(c + 1, next_slot)

            wait_chunk(c, slot)

            base = first_page * page_tokens + c * chunk_tokens
            head_dim = q_ref.shape[3]
            # bf16 MXU operands for byte/2-byte pools (fp32 accumulate);
            # fp32 pools keep full fp32 math — see paged_attention.py
            mm_dt = (
                jnp.float32
                if jnp.dtype(k_buf.dtype).itemsize >= 4 else jnp.bfloat16
            )
            q = q_ref[0].astype(mm_dt)  # [KH, rows, D]
            k = (
                k_buf[slot]
                .reshape(num_kv_heads, chunk_tokens, head_dim)
                .astype(mm_dt)
            )
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * sm_scale  # [KH, rows, chunk_tokens]
            if quantized:
                s = s * k_sc
            if logit_softcap is not None:
                # gemma2-style soft-capping BEFORE the causal mask
                s = logit_softcap * jnp.tanh(s * (1.0 / logit_softcap))
            kv_idx = base + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, dimension=2
            )
            # row r belongs to query token t = tile*q_tile + r//group
            q_pos = (
                q_start
                + tile * q_tile
                + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) // group
            )
            mask = (kv_idx <= q_pos) & (kv_idx < kv_len)
            if window is not None:
                mask = mask & (kv_idx > q_pos - window)
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

            m_prev = m_scr[:, :, :1]
            l_prev = l_scr[:, :, :1]
            m_cur = jnp.max(s, axis=2, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_new = alpha * l_prev + jnp.sum(p, axis=2, keepdims=True)
            if mla:
                v = k[:, :, :v_head_dim]
            else:
                v = (
                    v_buf[slot]
                    .reshape(num_kv_heads, chunk_tokens, head_dim)
                    .astype(mm_dt)
                )
            pv = jax.lax.dot_general(
                p.astype(mm_dt), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            if quantized:
                # MLA values come from the K buffer (K scales apply)
                pv = pv * (k_sc if mla else v_sc)
            if mla:
                acc_scr[:, :, :v_head_dim] = (
                    acc_scr[:, :, :v_head_dim] * alpha + pv
                )
            else:
                acc_scr[...] = acc_scr[...] * alpha + pv
            m_scr[:, :, :1] = m_new
            l_scr[:, :, :1] = l_new
            return 0

        jax.lax.fori_loop(0, num_chunks, body, 0, unroll=False)

    l = l_scr[:, :, :1]
    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)


def _pick_chunk(num_kv_heads, page_tokens, head_dim, itemsize, max_pages):
    page_bytes = num_kv_heads * page_tokens * head_dim * itemsize
    budget = 4 * 1024 * 1024
    c = max(1, budget // (4 * page_bytes))
    return min(c, 8, max(1, max_pages))


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "interpret", "pages_per_chunk", "q_tile",
                     "mla_v_dim", "window", "logit_softcap"),
)
def paged_prefill_attention(
    q: jax.Array,  # [T, num_q_heads, head_dim] (chunk of new tokens)
    k_pool: jax.Array,  # [L, num_pages, num_kv_heads, page_tokens, head_dim]
    v_pool: jax.Array,
    page_table: jax.Array,  # [max_pages] int32 this sequence's physical pages
    q_start: jax.Array | int,  # global position of q[0]
    kv_len: jax.Array | int,  # total valid tokens (q_start + true chunk len)
    layer: jax.Array | int = 0,
    *,
    sm_scale: float | None = None,
    interpret: bool = False,
    pages_per_chunk: int | None = None,
    q_tile: int = 128,
    mla_v_dim: int | None = None,
    window: int | None = None,
    k_scales: jax.Array | None = None,  # [L, KH] f32 (int8 pools)
    v_scales: jax.Array | None = None,
    logit_softcap: float | None = None,
) -> jax.Array:
    """Causal attention of a prefill chunk against its sequence's pages.
    Returns [T, num_q_heads, head_dim].  KV for the chunk must already be
    written to the pages (write_prefill_kv runs first).  This is the N=1
    view of :func:`paged_prefill_attention_batch`."""
    out = paged_prefill_attention_batch(
        q[None],
        k_pool,
        v_pool,
        page_table[None],
        jnp.asarray(q_start, jnp.int32)[None],
        jnp.asarray(kv_len, jnp.int32)[None],
        layer,
        sm_scale=sm_scale,
        interpret=interpret,
        pages_per_chunk=pages_per_chunk,
        q_tile=q_tile,
        mla_v_dim=mla_v_dim,
        window=window,
        k_scales=k_scales,
        v_scales=v_scales,
        logit_softcap=logit_softcap,
    )
    return out[0]


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "interpret", "pages_per_chunk", "q_tile",
                     "mla_v_dim", "window", "logit_softcap"),
)
def paged_prefill_attention_batch(
    q: jax.Array,  # [N, T, num_q_heads, head_dim] (N independent chunks)
    k_pool: jax.Array,  # [L, num_pages, num_kv_heads, page_tokens, head_dim]
    v_pool: jax.Array,
    page_tables: jax.Array,  # [N, max_pages] int32 physical pages per seq
    q_starts: jax.Array,  # [N] global position of each row's q[:, 0]
    kv_lens: jax.Array,  # [N] total valid tokens (q_start + true chunk len)
    layer: jax.Array | int = 0,
    *,
    sm_scale: float | None = None,
    interpret: bool = False,
    pages_per_chunk: int | None = None,
    q_tile: int = 128,
    mla_v_dim: int | None = None,
    window: int | None = None,
    k_scales: jax.Array | None = None,  # [L, KH] f32 (int8 pools)
    v_scales: jax.Array | None = None,
    logit_softcap: float | None = None,
) -> jax.Array:
    """Batched prefill attention: N sequences' chunks in ONE dispatch
    (grid (N, tiles)); each grid row masks with its own (q_start, kv_len)
    and streams its own page table.  Rows are independent, so this is
    bit-identical to N serial :func:`paged_prefill_attention` calls while
    streaming the weights once and paying one dispatch.  Rows whose
    ``kv_len`` is 0 (padding rows in a fixed-size batch) produce zeros.
    Returns [N, T, num_q_heads, head_dim]."""
    N, T, num_q_heads, head_dim = q.shape
    _, _, num_kv_heads, page_tokens, _ = k_pool.shape
    assert num_q_heads % num_kv_heads == 0
    group = num_q_heads // num_kv_heads
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(head_dim)
    q_tile = min(q_tile, T)
    # Every rows-sized VMEM buffer (q/out blocks, m/l/acc scratch) scales
    # with ``rows = q_tile * group``: wide-GQA geometries (Llama-3B's
    # 24q/8kv = group 3, MQA-heavy group 8+) overflow the ~16 MB
    # scoped-VMEM frame at the default q_tile=128.  Cap rows at 256 by
    # shrinking q_tile to the largest power of two <= 256/group; group<=2
    # keeps the validated default unchanged.
    if q_tile * group > 256:
        q_tile = min(q_tile, 1 << max(3, (256 // group).bit_length() - 1))
    assert T % q_tile == 0, f"T={T} must be a multiple of q_tile={q_tile}"
    num_tiles = T // q_tile
    rows = q_tile * group
    max_pages = page_tables.shape[1]
    C = pages_per_chunk or _pick_chunk(
        num_kv_heads, page_tokens, head_dim, jnp.dtype(k_pool.dtype).itemsize,
        max_pages,
    )

    # [N, T, QH, D] -> [N, KH, T*group, D] with row r = t*group + g
    qg = (
        q.reshape(N, T, num_kv_heads, group, head_dim)
        .transpose(0, 2, 1, 3, 4)
        .reshape(N, num_kv_heads, T * group, head_dim)
    )

    meta = jnp.stack(
        [jnp.asarray(q_starts, jnp.int32), jnp.asarray(kv_lens, jnp.int32)],
        axis=1,
    )  # [N, 2]
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)
    quantized = jnp.dtype(k_pool.dtype) == jnp.int8
    L = k_pool.shape[0]
    if k_scales is None:
        k_scales = jnp.ones((L, num_kv_heads), jnp.float32)
    if v_scales is None:
        v_scales = jnp.ones((L, num_kv_heads), jnp.float32)

    out = pl.pallas_call(
        functools.partial(
            _prefill_kernel,
            page_tokens=page_tokens,
            pages_per_chunk=C,
            num_kv_heads=num_kv_heads,
            group=group,
            q_tile=q_tile,
            sm_scale=sm_scale,
            v_head_dim=mla_v_dim,
            window=window,
            quantized=quantized,
            logit_softcap=logit_softcap,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(N, num_tiles),
            in_specs=[
                pl.BlockSpec(
                    (1, num_kv_heads, rows, head_dim),
                    lambda b, t, *_: (b, 0, t, 0),
                ),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, num_kv_heads, rows, head_dim),
                lambda b, t, *_: (b, 0, t, 0),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, num_kv_heads, C, page_tokens, head_dim), k_pool.dtype),
                # MLA never touches the V-side buffer — allocate minimal
                pltpu.VMEM(
                    (1, 1, 1, 1, 128) if mla_v_dim is not None
                    else (2, num_kv_heads, C, page_tokens, head_dim),
                    v_pool.dtype,
                ),
                pltpu.SemaphoreType.DMA((2, C, 2)),
                pltpu.VMEM((num_kv_heads, rows, 128), jnp.float32),
                pltpu.VMEM((num_kv_heads, rows, 128), jnp.float32),
                pltpu.VMEM((num_kv_heads, rows, head_dim), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (N, num_kv_heads, T * group, head_dim), q.dtype
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(page_tables, meta, layer_arr, k_scales, v_scales, qg, k_pool, v_pool)

    # [N, KH, T*group, D] -> [N, T, QH, D]
    out = (
        out.reshape(N, num_kv_heads, T, group, head_dim)
        .transpose(0, 2, 1, 3, 4)
        .reshape(N, T, num_q_heads, head_dim)
    )
    return out
