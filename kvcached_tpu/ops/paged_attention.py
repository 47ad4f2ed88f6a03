"""Paged attention + KV-write Pallas TPU kernels.

The consumers of the page-table indirection that replaces CUDA VMM: the
kernels receive the physical pool and per-sequence page tables, DMA exactly
the live pages from HBM into VMEM (multi-page double-buffered pipeline),
and update the pool **in place** via ``input_output_aliases``.

Why writes live inside the kernels: an XLA scatter that feeds a
``pallas_call`` operand cannot be aliased through it, so the pool would be
copied wholesale every layer (measured: 13 ms/step for a 2×2.1 GB pool pair
vs 18 µs for the kernel itself).  With aliasing, "writing KV" is a ≤64 KB
DMA inside the kernel and the pool buffer never moves.

Pool layout (see device/pool.py): ``[num_layers, num_pages, num_kv_heads,
page_tokens, head_dim]``.  One whole page — all kv heads — is one contiguous
slab (128 KB at 8 heads × 64 tokens × 128 dim bf16): page indirection costs
one large DMA per page, preserving the per-layer density whose loss cost the
reference −31% e2e (benchmarks/bench_layout).  TPU HBM tiling is (8,128) on
the last two dims, so the decode-token write is an 8-slot-aligned
read-modify-write window.

Grid: ``(batch,)`` — each program handles one sequence: optional KV write
for the current token, then streams the sequence's pages in chunks with an
online (flash) softmax in fp32 per kv head.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _sublane_for(dtype) -> int:
    """HBM tiling granule on the page_tokens dim: slices must align to the
    packed-tile sublane count (fp32/bf16: 8 — verified on v5e; byte dtypes
    pack 4 values/sublane → 32)."""
    return 32 if jnp.dtype(dtype).itemsize == 1 else 8


def _select_head_scales(scales_ref, layer, num_kv_heads, shape, iota_dim):
    """int8 per-head scale tensor for in-kernel (de)quantization,
    materialized with FULL-RANK selects against a head-id iota: the
    obvious scalar stack + reshape (e.g. to [KH, 1, 1]) trips Mosaic
    layout inference whenever KH < 8 (a single sublane tile).  Shared by
    the fused decode/prefill/verify kernels and the slot-level writer."""
    h_ids = jax.lax.broadcasted_iota(jnp.int32, shape, iota_dim)
    sc = jnp.ones(shape, jnp.float32)
    for h in range(num_kv_heads):
        sc = jnp.where(h_ids == h, scales_ref[layer, h], sc)
    return sc


def _decode_write_kernel(
    page_tables_ref, seq_lens_ref, layer_ref, slot_pages_ref, slot_offsets_ref,
    k_scales_ref, v_scales_ref,
    q_ref, k_new_ref, v_new_ref, k_pool_in, v_pool_in,
    o_ref, k_pool_out, v_pool_out,
    k_buf, v_buf, sems, win_k, win_v, win_sems, m_scr, l_scr, acc_scr,
    **consts,
):
    """Fused write+attend variant: pools are aliased outputs."""
    _attn_body(
        page_tables_ref, seq_lens_ref, layer_ref, slot_pages_ref,
        slot_offsets_ref, k_scales_ref, v_scales_ref,
        q_ref, k_new_ref, v_new_ref,
        k_pool_out, v_pool_out, o_ref,
        k_buf, v_buf, sems, win_k, win_v, win_sems, m_scr, l_scr, acc_scr,
        write_kv=True, **consts,
    )


def _decode_write_kernel_mla(
    page_tables_ref, seq_lens_ref, layer_ref, slot_pages_ref, slot_offsets_ref,
    k_scales_ref, v_scales_ref,
    q_ref, k_new_ref, v_new_ref, k_pool_in, v_pool_in,
    o_ref, k_pool_out,
    k_buf, v_buf, sems, win_k, win_v, win_sems, m_scr, l_scr, acc_scr,
    **consts,
):
    """MLA fused variant: one latent pool, aliased once."""
    _attn_body(
        page_tables_ref, seq_lens_ref, layer_ref, slot_pages_ref,
        slot_offsets_ref, k_scales_ref, v_scales_ref,
        q_ref, k_new_ref, v_new_ref,
        k_pool_out, k_pool_out, o_ref,
        k_buf, v_buf, sems, win_k, win_v, win_sems, m_scr, l_scr, acc_scr,
        write_kv=True, **consts,
    )


def _readonly_kernel(
    page_tables_ref, seq_lens_ref, layer_ref, slot_pages_ref, slot_offsets_ref,
    k_scales_ref, v_scales_ref,
    q_ref, k_new_ref, v_new_ref, k_pool_in, v_pool_in,
    o_ref,
    k_buf, v_buf, sems, win_k, win_v, win_sems, m_scr, l_scr, acc_scr,
    **consts,
):
    _attn_body(
        page_tables_ref, seq_lens_ref, layer_ref, slot_pages_ref,
        slot_offsets_ref, k_scales_ref, v_scales_ref,
        q_ref, k_new_ref, v_new_ref,
        k_pool_in, v_pool_in, o_ref,
        k_buf, v_buf, sems, win_k, win_v, win_sems, m_scr, l_scr, acc_scr,
        write_kv=False, **consts,
    )


def _attn_body(
    page_tables_ref,  # [B, max_pages] int32 (SMEM)
    seq_lens_ref,  # [B] int32 (SMEM)
    layer_ref,  # [1] int32 (SMEM)
    slot_pages_ref,  # [B] int32: physical page receiving this token's KV
    slot_offsets_ref,  # [B] int32: slot within that page
    k_scales_ref,  # [L, KH] f32 (SMEM): int8 per-head scales (ones if unused)
    v_scales_ref,
    q_ref,  # [1, num_kv_heads, q_pad, head_dim] VMEM block
    k_new_ref,  # [1, num_kv_heads, head_dim] VMEM block (token to write)
    v_new_ref,  # same
    k_pool_ref,  # [L, num_pages, num_kv_heads, page_tokens, head_dim] (HBM)
    v_pool_ref,  # same
    o_ref,  # [1, num_kv_heads, q_pad, head_dim] VMEM block
    k_buf,  # [2, num_kv_heads, C, page_tokens, head_dim] VMEM
    v_buf,  # same
    sems,  # DMA sems [2, C, 2]
    win_k,  # [num_kv_heads, SUBLANE, head_dim] VMEM (RMW window)
    win_v,
    win_sems,  # DMA sems [2]
    m_scr,  # [num_kv_heads, q_pad, 128] f32
    l_scr,
    acc_scr,  # [num_kv_heads, q_pad, head_dim] f32
    *,
    page_tokens: int,
    pages_per_chunk: int,
    num_kv_heads: int,
    sm_scale: float,
    write_kv: bool,
    v_head_dim: int | None = None,
    sublane: int = 8,
    window: int | None = None,
    quantized: bool = False,
    logit_softcap: float | None = None,
):
    # MLA mode (v_head_dim set): a single latent buffer serves as both K and
    # V — scores use the full head_dim (c_kv ++ k_rope), values are the
    # first ``v_head_dim`` lanes (c_kv).  V DMAs are skipped entirely.
    mla = v_head_dim is not None
    b = pl.program_id(0)
    batch = pl.num_programs(0)
    layer = layer_ref[0]
    if quantized:
        # int8 KV: dequantization is per-kv-head, so it folds into the
        # SCORES (k) and the weighted-value OUTPUT (v) — one [KH] multiply
        # instead of rescaling whole K/V chunks
        k_sc = _select_head_scales(
            k_scales_ref, layer, num_kv_heads, (num_kv_heads, 1, 1), 0
        )
        v_sc = _select_head_scales(
            v_scales_ref, layer, num_kv_heads, (num_kv_heads, 1, 1), 0
        )
    C = pages_per_chunk

    def row_geometry(row):
        """(num_pages, first_page, win_start) for a batch row — used for
        this row AND to prefetch the next row's first chunk."""
        s = seq_lens_ref[row]
        n = pl.cdiv(s, page_tokens)
        if window is not None:
            ws = jnp.maximum(s - window, 0)
            fp = ws // page_tokens
        else:
            ws = jnp.zeros_like(s)
            fp = jnp.zeros_like(s)
        return n, fp, ws

    num_pages, first_page, win_start = row_geometry(b)
    num_chunks = pl.cdiv(num_pages - first_page, C)
    chunk_tokens = C * page_tokens

    def row_dma(row, n_pages_row, fp_row, chunk, j, slot, kv):
        page_idx = fp_row + chunk * C + j
        # clamp so tail columns read a valid (masked-out) page: scratch VMEM
        # is uninitialized and a masked score still multiplies V (0×NaN=NaN)
        page_idx = jnp.minimum(page_idx, n_pages_row - 1)
        page_id = page_tables_ref[row, page_idx]
        pool = k_pool_ref if kv == 0 else v_pool_ref
        buf = k_buf if kv == 0 else v_buf
        return pltpu.make_async_copy(
            pool.at[layer, page_id], buf.at[slot, :, j], sems.at[slot, j, kv]
        )

    def start_chunk_row(row, n_pages_row, fp_row, chunk, slot):
        for j in range(C):
            row_dma(row, n_pages_row, fp_row, chunk, j, slot, 0).start()
            if not mla:
                row_dma(row, n_pages_row, fp_row, chunk, j, slot, 1).start()

    def prefetch_safe(row):
        """May row's chunk 0 be fetched BEFORE its RMW token write?  Only
        if the write page (the row's last page) is beyond chunk 0.  Must be
        computable identically by row-1 (issuer) and row (consumer)."""
        n, fp, _ = row_geometry(row)
        live = n - fp
        if write_kv:
            return live > C
        return live > 0

    # Cross-row pipelining: grid programs run sequentially and scratch
    # persists, so each program leaves the NEXT row's chunk 0 in flight —
    # the fetch overlaps this row's epilogue and the next row's RMW write,
    # removing the per-row pipeline warmup bubble.
    chunk0_prefetched = (b > 0) & prefetch_safe(b)

    # fetch chunk 0 as early as possible: before the RMW write whenever the
    # write page lies beyond chunk 0 (the fetch then overlaps the write)
    @pl.when((num_pages > 0) & ~chunk0_prefetched & prefetch_safe(b))
    def _early_chunk0():
        start_chunk_row(b, num_pages, first_page, 0, 0)

    # ---- 1) write this token's K/V via an aligned RMW window --------------
    if write_kv:
        page = slot_pages_ref[b]
        off = slot_offsets_ref[b]

        # Zero-page write-discard: page 0 is the shared zero page (defined
        # reads for unmapped entries, csrc/ftensor.cpp:160-176 in the
        # reference).  Callers route overflow/padded-row writes here — the
        # write is skipped so the zero page stays zero.
        @pl.when(page != 0)
        def _write_token():
            win = (off // sublane) * sublane
            row = off - win

            def win_copy(dst_vmem, pool, sem):
                return pltpu.make_async_copy(
                    pool.at[layer, page, :, pl.ds(win, sublane)], dst_vmem, sem
                )

            win_copy(win_k, k_pool_ref, win_sems.at[0]).start()
            if not mla:
                win_copy(win_v, v_pool_ref, win_sems.at[1]).start()
            win_copy(win_k, k_pool_ref, win_sems.at[0]).wait()
            if not mla:
                win_copy(win_v, v_pool_ref, win_sems.at[1]).wait()
            row_ids = jax.lax.broadcasted_iota(
                jnp.int32, (num_kv_heads, sublane, win_k.shape[-1]), 1
            )
            k_val = k_new_ref[0][:, None, :].astype(jnp.float32)
            v_val = None if mla else v_new_ref[0][:, None, :].astype(jnp.float32)
            if quantized:
                # quantize-on-write with per-head scales (int8 pool)
                k_val = jnp.clip(jnp.round(k_val / k_sc), -127, 127)
                if not mla:
                    v_val = jnp.clip(jnp.round(v_val / v_sc), -127, 127)
            # select in fp32: select_n on sub-byte float dtypes (fp8) does not
            # lower on every backend; the converts are free on the VPU
            win_k[...] = jnp.where(
                row_ids == row,
                k_val,
                win_k[...].astype(jnp.float32),
            ).astype(win_k.dtype)
            if not mla:
                win_v[...] = jnp.where(
                    row_ids == row,
                    v_val,
                    win_v[...].astype(jnp.float32),
                ).astype(win_v.dtype)

            def win_write(src_vmem, pool, sem):
                return pltpu.make_async_copy(
                    src_vmem, pool.at[layer, page, :, pl.ds(win, sublane)], sem
                )

            win_write(win_k, k_pool_ref, win_sems.at[0]).start()
            if not mla:
                win_write(win_v, v_pool_ref, win_sems.at[1]).start()
            # must land before the attention pipeline reads this page
            win_write(win_k, k_pool_ref, win_sems.at[0]).wait()
            if not mla:
                win_write(win_v, v_pool_ref, win_sems.at[1]).wait()

    # ---- 2) paged attention over the sequence's pages ---------------------
    def start_chunk(chunk, slot):
        start_chunk_row(b, num_pages, first_page, chunk, slot)

    def wait_chunk(chunk, slot):
        for j in range(C):
            row_dma(b, num_pages, first_page, chunk, j, slot, 0).wait()
            if not mla:
                row_dma(b, num_pages, first_page, chunk, j, slot, 1).wait()

    m_scr[...] = jnp.full_like(m_scr, DEFAULT_MASK_VALUE)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    # chunk 0 was started by the early fetch, the previous grid program
    # (cross-row prefetch), or — when the write page is inside chunk 0 —
    # must start only now, after the RMW write landed
    @pl.when((num_pages > 0) & ~chunk0_prefetched & ~prefetch_safe(b))
    def _late_chunk0():
        start_chunk(0, 0)

    @pl.when(num_pages > 0)
    def _():
        def body(c, _):
            slot = jax.lax.rem(c, 2)
            next_slot = jax.lax.rem(c + 1, 2)

            @pl.when(c + 1 < num_chunks)
            def _():
                start_chunk(c + 1, next_slot)

            wait_chunk(c, slot)

            base = first_page * page_tokens + c * chunk_tokens
            head_dim = q_ref.shape[3]
            # MXU operand dtype: byte/2-byte pools run the matmuls in bf16
            # (native MXU rate; int8/fp8 values are EXACT in bf16) with fp32
            # accumulation — the fp32-operand path measured compute-bound at
            # ~77% of HBM peak on v5e.  4-byte pools keep full fp32 math.
            mm_dt = (
                jnp.float32
                if jnp.dtype(k_buf.dtype).itemsize >= 4 else jnp.bfloat16
            )
            # all heads in one batched matmul: [KH, q_pad, D] x [KH, T, D]
            q = q_ref[0].astype(mm_dt)
            k = (
                k_buf[slot]
                .reshape(num_kv_heads, chunk_tokens, head_dim)
                .astype(mm_dt)
            )
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * sm_scale  # [KH, q_pad, chunk_tokens]; scale in fp32 post-dot
            if quantized:
                s = s * k_sc  # dequantize K via the scores
            if logit_softcap is not None:
                # gemma2-style attention logit soft-capping; applied BEFORE
                # the mask so masked lanes keep DEFAULT_MASK_VALUE
                s = logit_softcap * jnp.tanh(s * (1.0 / logit_softcap))
            token_idx = base + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, dimension=2
            )
            in_range = (token_idx < seq_lens_ref[b]) & (token_idx >= win_start)
            s = jnp.where(in_range, s, DEFAULT_MASK_VALUE)

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
            )  # [KH, q_pad, v_dim]
            if quantized:
                # dequantize V via the output; MLA values come from the K
                # buffer (quantized with the K scales)
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

    # leave the NEXT row's chunk 0 in flight (slot 0, safe: all of this
    # row's slot reads completed above) — consumed by the next grid program
    nxt = jnp.minimum(b + 1, batch - 1)  # clamp: no OOB SMEM read on last row
    @pl.when((b + 1 < batch) & prefetch_safe(nxt))
    def _prefetch_next_row():
        n_n, fp_n, _ = row_geometry(nxt)
        start_chunk_row(nxt, n_n, fp_n, 0, 0)

    l = l_scr[:, :, :1]
    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_pages_per_chunk(
    num_kv_heads: int, page_tokens: int, head_dim: int, itemsize: int,
    max_pages: int,
) -> int:
    """Choose the DMA chunk so both K+V double buffers stay ≲ 4 MB VMEM."""
    page_bytes = num_kv_heads * page_tokens * head_dim * itemsize
    budget = 4 * 1024 * 1024
    c = max(1, budget // (4 * page_bytes))  # 2 buffers × (K+V)
    c = min(c, 8, max(1, max_pages))
    return c


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "interpret", "pages_per_chunk", "mla_v_dim",
                     "window", "logit_softcap"),
    donate_argnums=(1, 2),
)
def paged_attention_decode(
    q: jax.Array,  # [B, num_q_heads, head_dim]
    k_pool: jax.Array,  # [L, num_pages, num_kv_heads, page_tokens, head_dim]
    v_pool: jax.Array,
    page_tables: jax.Array,  # [B, max_pages_per_seq] int32 (physical ids)
    seq_lens: jax.Array,  # [B] int32 INCLUDING the current token
    layer: jax.Array | int,
    k_new: jax.Array,  # [B, num_kv_heads, head_dim] current token's K
    v_new: jax.Array,
    slot_pages: jax.Array,  # [B] int32
    slot_offsets: jax.Array,  # [B] int32
    *,
    sm_scale: float | None = None,
    interpret: bool = False,
    pages_per_chunk: int | None = None,
    mla_v_dim: int | None = None,
    window: int | None = None,
    k_scales: jax.Array | None = None,  # [L, KH] f32 (int8 pools)
    v_scales: jax.Array | None = None,
    logit_softcap: float | None = None,
):
    """Fused decode step: write the current token's KV into its page, then
    attend over the sequence.  Returns (out, k_pool, v_pool) with the pools
    aliased in place — callers must donate them.

    ``mla_v_dim``: MLA mode — k_pool holds the single latent buffer
    (c_kv ++ k_rope); scores use the full head_dim, values its first
    ``mla_v_dim`` lanes; v_pool is ignored (pass k_pool).

    int8 pools: ``k_scales``/``v_scales`` hold per-(layer, kv-head)
    dequantization scales; ``k_new``/``v_new`` arrive UNQUANTIZED and are
    quantized in-kernel on write."""
    return _paged_attention_impl(
        q, k_pool, v_pool, page_tables, seq_lens, layer,
        k_new, v_new, slot_pages, slot_offsets,
        sm_scale=sm_scale, interpret=interpret,
        pages_per_chunk=pages_per_chunk, write_kv=True, mla_v_dim=mla_v_dim,
        window=window, k_scales=k_scales, v_scales=v_scales,
        logit_softcap=logit_softcap,
    )


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "interpret", "pages_per_chunk", "mla_v_dim",
                     "window", "logit_softcap"),
)
def paged_attention(
    q: jax.Array,
    k_pool: jax.Array,  # [(L,) num_pages, num_kv_heads, page_tokens, head_dim]
    v_pool: jax.Array,
    page_tables: jax.Array,
    seq_lens: jax.Array,
    layer: jax.Array | int = 0,
    *,
    sm_scale: float | None = None,
    interpret: bool = False,
    pages_per_chunk: int | None = None,
    mla_v_dim: int | None = None,
    window: int | None = None,
    k_scales: jax.Array | None = None,
    v_scales: jax.Array | None = None,
    logit_softcap: float | None = None,
) -> jax.Array:
    """Read-only paged attention (no KV write). Returns [B, num_q_heads, D]."""
    if k_pool.ndim == 4:
        k_pool = k_pool[None]
        v_pool = v_pool[None]
    B, _, head_dim = q.shape
    num_kv_heads = k_pool.shape[2]
    dummy = jnp.zeros((B, num_kv_heads, head_dim), k_pool.dtype)
    zeros = jnp.zeros((B,), jnp.int32)
    out, _, _ = _paged_attention_impl(
        q, k_pool, v_pool, page_tables, seq_lens, layer,
        dummy, dummy, zeros, zeros,
        sm_scale=sm_scale, interpret=interpret,
        pages_per_chunk=pages_per_chunk, write_kv=False, mla_v_dim=mla_v_dim,
        window=window, k_scales=k_scales, v_scales=v_scales,
        logit_softcap=logit_softcap,
    )
    return out


def _paged_attention_impl(
    q, k_pool, v_pool, page_tables, seq_lens, layer,
    k_new, v_new, slot_pages, slot_offsets,
    *, sm_scale, interpret, pages_per_chunk, write_kv, mla_v_dim=None,
    window=None, k_scales=None, v_scales=None, logit_softcap=None,
):
    batch, num_q_heads, head_dim = q.shape
    _, _, num_kv_heads, page_tokens, head_dim_k = k_pool.shape
    assert head_dim == head_dim_k
    assert num_q_heads % num_kv_heads == 0
    q_per_kv = num_q_heads // num_kv_heads
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(head_dim)
    max_pages = page_tables.shape[1]
    if pages_per_chunk is None:
        pages_per_chunk = _pick_pages_per_chunk(
            num_kv_heads, page_tokens, head_dim,
            jnp.dtype(k_pool.dtype).itemsize, max_pages,
        )
    C = pages_per_chunk

    # Pad GQA group to the fp32 sublane minimum so the score matmul tiles.
    q_pad = _round_up(q_per_kv, 8)
    qg = q.reshape(batch, num_kv_heads, q_per_kv, head_dim)
    if q_pad != q_per_kv:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, q_pad - q_per_kv), (0, 0)))

    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)
    mla = mla_v_dim is not None
    sublane = _sublane_for(k_pool.dtype)
    quantized = jnp.dtype(k_pool.dtype) == jnp.int8
    L = k_pool.shape[0]
    if k_scales is None:
        k_scales = jnp.ones((L, num_kv_heads), jnp.float32)
    if v_scales is None:
        v_scales = jnp.ones((L, num_kv_heads), jnp.float32)
    consts = dict(
        page_tokens=page_tokens,
        pages_per_chunk=C,
        num_kv_heads=num_kv_heads,
        sm_scale=sm_scale,
        v_head_dim=mla_v_dim,
        sublane=sublane,
        window=window,
        quantized=quantized,
        logit_softcap=logit_softcap,
    )
    o_spec = pl.BlockSpec(
        (1, num_kv_heads, q_pad, head_dim), lambda b, *_: (b, 0, 0, 0)
    )
    in_specs = [
        o_spec,
        pl.BlockSpec((1, num_kv_heads, head_dim), lambda b, *_: (b, 0, 0)),
        pl.BlockSpec((1, num_kv_heads, head_dim), lambda b, *_: (b, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    # in MLA mode the V-side buffers are never touched — allocate minimal
    v_buf_shape = (1, 1, 1, 1, 128) if mla else (2, num_kv_heads, C, page_tokens, head_dim)
    win_v_shape = (1, 1, 128) if mla else (num_kv_heads, sublane, head_dim)
    scratch_shapes = [
        pltpu.VMEM((2, num_kv_heads, C, page_tokens, head_dim), k_pool.dtype),
        pltpu.VMEM(v_buf_shape, v_pool.dtype),
        pltpu.SemaphoreType.DMA((2, C, 2)),
        pltpu.VMEM((num_kv_heads, sublane, head_dim), k_pool.dtype),
        pltpu.VMEM(win_v_shape, v_pool.dtype),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.VMEM((num_kv_heads, q_pad, 128), jnp.float32),
        pltpu.VMEM((num_kv_heads, q_pad, 128), jnp.float32),
        pltpu.VMEM((num_kv_heads, q_pad, head_dim), jnp.float32),
    ]
    o_shape = jax.ShapeDtypeStruct((batch, num_kv_heads, q_pad, head_dim), q.dtype)
    args = (page_tables, seq_lens, layer_arr, slot_pages, slot_offsets,
            k_scales, v_scales,
            qg, k_new, v_new, k_pool, v_pool)

    if write_kv and mla:
        out, k_pool = pl.pallas_call(
            functools.partial(_decode_write_kernel_mla, **consts),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=7,
                grid=(batch,),
                in_specs=in_specs,
                out_specs=(
                    o_spec,
                    pl.BlockSpec(memory_space=pl.ANY),
                ),
                scratch_shapes=scratch_shapes,
            ),
            out_shape=(
                o_shape,
                jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
            ),
            input_output_aliases={10: 1},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(*args)
        v_pool = None
    elif write_kv:
        out, k_pool, v_pool = pl.pallas_call(
            functools.partial(_decode_write_kernel, **consts),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=7,
                grid=(batch,),
                in_specs=in_specs,
                out_specs=(
                    o_spec,
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                ),
                scratch_shapes=scratch_shapes,
            ),
            out_shape=(
                o_shape,
                jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
                jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
            ),
            # flat input indices incl. the 7 scalar-prefetch args:
            # 7=q, 8=k_new, 9=v_new, 10=k_pool, 11=v_pool → outputs 1, 2
            input_output_aliases={10: 1, 11: 2},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(*args)
    else:
        out = pl.pallas_call(
            functools.partial(_readonly_kernel, **consts),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=7,
                grid=(batch,),
                in_specs=in_specs,
                out_specs=o_spec,
                scratch_shapes=scratch_shapes,
            ),
            out_shape=o_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(*args)

    out = out[:, :, :q_per_kv, :]
    return out.reshape(batch, num_q_heads, head_dim), k_pool, v_pool


# ---------------------------------------------------------------------------
# Multi-query verify kernel (speculative decoding).
# ---------------------------------------------------------------------------


def _verify_write_kernel(
    page_tables_ref, seq_lens_ref, layer_ref, slot_pages_ref,
    slot_offsets_ref, k_scales_ref, v_scales_ref,
    q_ref, k_new_ref, v_new_ref, k_pool_in, v_pool_in,
    o_ref, k_pool_out, v_pool_out,
    *scratch, **consts,
):
    """Standard (MHA/GQA) verify variant: K and V pools aliased outputs."""
    _verify_body(
        page_tables_ref, seq_lens_ref, layer_ref, slot_pages_ref,
        slot_offsets_ref, k_scales_ref, v_scales_ref,
        q_ref, k_new_ref, v_new_ref, k_pool_out, v_pool_out, o_ref,
        *scratch, **consts,
    )


def _verify_write_kernel_mla(
    page_tables_ref, seq_lens_ref, layer_ref, slot_pages_ref,
    slot_offsets_ref, k_scales_ref, v_scales_ref,
    q_ref, k_new_ref, v_new_ref, k_pool_in, v_pool_in,
    o_ref, k_pool_out,
    *scratch, **consts,
):
    """MLA verify variant: one latent pool, aliased once."""
    _verify_body(
        page_tables_ref, seq_lens_ref, layer_ref, slot_pages_ref,
        slot_offsets_ref, k_scales_ref, v_scales_ref,
        q_ref, k_new_ref, v_new_ref, k_pool_out, k_pool_out, o_ref,
        *scratch, **consts,
    )


def _verify_body(
    page_tables_ref,  # [B, max_pages] int32 (SMEM)
    seq_lens_ref,  # [B] int32: length INCLUDING the T fed tokens
    layer_ref,  # [1] int32
    slot_pages_ref,  # [B, T] int32 physical page per fed token (0 = discard)
    slot_offsets_ref,  # [B, T] int32
    k_scales_ref,  # [L, KH] f32 (SMEM; ones if unused)
    v_scales_ref,
    q_ref,  # [1, KH, R, D] VMEM block; row = t * group + g, padded to R
    k_new_ref,  # [1, T, KH, D] VMEM block (the T fed tokens' K)
    v_new_ref,
    k_pool_ref, v_pool_ref,  # aliased outputs (HBM)
    o_ref,  # [1, KH, R, D]
    k_buf, v_buf, sems, win_k, win_v, win_sems, m_scr, l_scr, acc_scr,
    *,
    page_tokens: int,
    pages_per_chunk: int,
    num_kv_heads: int,
    group: int,
    q_tokens: int,  # T
    sm_scale: float,
    sublane: int,
    window: int | None,
    quantized: bool,
    v_head_dim: int | None = None,
    logit_softcap: float | None = None,
):
    """Speculative-decode verification: write the T fed tokens' KV into
    their slots, then causal attention of T queries per sequence against
    the sequence's pages.  Query j sits at position ``seq_len - T + j`` and
    attends tokens ``<= `` its own position — the batched, multi-query
    sibling of the fused decode kernel (reference context: the host
    engines' spec-decode flow, sglang/patches.py:714-956, which the
    reference's elastic pools must accommodate).  ``v_head_dim`` set = MLA
    mode: the single latent buffer serves as both K and V (values are its
    first v_head_dim lanes), all V-side DMAs skipped."""
    mla = v_head_dim is not None
    b = pl.program_id(0)
    batch = pl.num_programs(0)
    layer = layer_ref[0]
    T = q_tokens
    C = pages_per_chunk

    def row_geometry(row):
        """(num_pages, first_page, base) for a batch row — used for this
        row AND to prefetch the next row's first chunk.  The page range is
        clamped to the table width: callers may pass an honest s that
        overhangs a row's cap by < T (the overflow queries are discarded),
        and the overhang must not read past page_tables in SMEM."""
        s_r = seq_lens_ref[row]
        n = jnp.minimum(pl.cdiv(s_r, page_tokens), page_tables_ref.shape[1])
        base_r = s_r - T  # tokens whose KV existed before this step
        if window is not None:
            fp = jnp.maximum(base_r + 1 - window, 0) // page_tokens
        else:
            fp = jnp.zeros_like(s_r)
        return n, fp, base_r

    s = seq_lens_ref[b]
    num_pages, first_page, base = row_geometry(b)
    num_chunks = pl.cdiv(num_pages - first_page, C)
    chunk_tokens = C * page_tokens

    def prefetch_safe(row):
        """May row's chunk 0 be fetched BEFORE its T RMW token writes?
        Only if every write page — the pages spanning positions base..s-1,
        i.e. the row's LAST live pages — lies beyond chunk 0.  Must be
        computable identically by row-1 (issuer) and row (consumer)."""
        n, fp, base_r = row_geometry(row)
        return (jnp.maximum(base_r, 0) // page_tokens) >= fp + C

    if quantized:
        def head_scales(scales_ref, shape, iota_dim):
            return _select_head_scales(
                scales_ref, layer, num_kv_heads, shape, iota_dim
            )

    def row_dma(row, n_pages_row, fp_row, chunk, j, slot, kv):
        page_idx = fp_row + chunk * C + j
        page_idx = jnp.minimum(page_idx, n_pages_row - 1)  # masked tail
        page_id = page_tables_ref[row, page_idx]
        pool = k_pool_ref if kv == 0 else v_pool_ref
        buf = k_buf if kv == 0 else v_buf
        return pltpu.make_async_copy(
            pool.at[layer, page_id], buf.at[slot, :, j], sems.at[slot, j, kv]
        )

    def start_chunk_row(row, n_pages_row, fp_row, chunk, slot):
        for j in range(C):
            row_dma(row, n_pages_row, fp_row, chunk, j, slot, 0).start()
            if not mla:
                row_dma(row, n_pages_row, fp_row, chunk, j, slot, 1).start()

    # Cross-row pipelining (same scheme as the fused decode kernel): grid
    # programs run sequentially and scratch persists, so each program
    # leaves the NEXT row's chunk 0 in flight — the fetch overlaps this
    # row's epilogue and the next row's T RMW writes.
    chunk0_prefetched = (b > 0) & prefetch_safe(b)

    # fetch chunk 0 as early as possible: before the RMW writes whenever
    # every write page lies beyond chunk 0 (the fetch overlaps the writes)
    @pl.when((num_pages > 0) & ~chunk0_prefetched & prefetch_safe(b))
    def _early_chunk0():
        start_chunk_row(b, num_pages, first_page, 0, 0)

    # ---- 1) write the T fed tokens' K/V via aligned RMW windows ----------
    for j in range(T):
        page = slot_pages_ref[b, j]
        off = slot_offsets_ref[b, j]

        @pl.when(page != 0)  # zero page = discard (overflow / padding)
        def _():
            win = (off // sublane) * sublane
            row = off - win

            def win_copy(vmem, pool, sem):
                return pltpu.make_async_copy(
                    pool.at[layer, page, :, pl.ds(win, sublane)], vmem, sem
                )

            win_copy(win_k, k_pool_ref, win_sems.at[0]).start()
            if not mla:
                win_copy(win_v, v_pool_ref, win_sems.at[1]).start()
            win_copy(win_k, k_pool_ref, win_sems.at[0]).wait()
            if not mla:
                win_copy(win_v, v_pool_ref, win_sems.at[1]).wait()
            row_ids = jax.lax.broadcasted_iota(
                jnp.int32, (num_kv_heads, sublane, win_k.shape[-1]), 1
            )
            k_val = k_new_ref[0, j][:, None, :].astype(jnp.float32)
            v_val = (
                None if mla
                else v_new_ref[0, j][:, None, :].astype(jnp.float32)
            )
            if quantized:
                k_val = jnp.clip(
                    jnp.round(k_val / head_scales(k_scales_ref, k_val.shape, 0)),
                    -127, 127,
                )
                if not mla:
                    v_val = jnp.clip(
                        jnp.round(
                            v_val / head_scales(v_scales_ref, v_val.shape, 0)
                        ),
                        -127, 127,
                    )
            win_k[...] = jnp.where(
                row_ids == row, k_val, win_k[...].astype(jnp.float32)
            ).astype(win_k.dtype)
            if not mla:
                win_v[...] = jnp.where(
                    row_ids == row, v_val, win_v[...].astype(jnp.float32)
                ).astype(win_v.dtype)

            def win_write(vmem, pool, sem):
                return pltpu.make_async_copy(
                    vmem, pool.at[layer, page, :, pl.ds(win, sublane)], sem
                )

            win_write(win_k, k_pool_ref, win_sems.at[0]).start()
            if not mla:
                win_write(win_v, v_pool_ref, win_sems.at[1]).start()
            win_write(win_k, k_pool_ref, win_sems.at[0]).wait()
            if not mla:
                win_write(win_v, v_pool_ref, win_sems.at[1]).wait()

    # ---- 2) causal multi-query attention over the pages -------------------
    def start_chunk(chunk, slot):
        start_chunk_row(b, num_pages, first_page, chunk, slot)

    def wait_chunk(chunk, slot):
        for j in range(C):
            row_dma(b, num_pages, first_page, chunk, j, slot, 0).wait()
            if not mla:
                row_dma(b, num_pages, first_page, chunk, j, slot, 1).wait()

    m_scr[...] = jnp.full_like(m_scr, DEFAULT_MASK_VALUE)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    # chunk 0 was started by the early fetch, the previous grid program
    # (cross-row prefetch), or — when a write page is inside chunk 0 —
    # must start only now, after the RMW writes landed
    @pl.when((num_pages > 0) & ~chunk0_prefetched & ~prefetch_safe(b))
    def _late_chunk0():
        start_chunk(0, 0)

    @pl.when(num_pages > 0)
    def _():
        def body(c, _):
            slot = jax.lax.rem(c, 2)
            next_slot = jax.lax.rem(c + 1, 2)

            @pl.when(c + 1 < num_chunks)
            def _():
                start_chunk(c + 1, next_slot)

            wait_chunk(c, slot)

            base_tok = first_page * page_tokens + c * chunk_tokens
            head_dim = q_ref.shape[3]
            mm_dt = (
                jnp.float32
                if jnp.dtype(k_buf.dtype).itemsize >= 4 else jnp.bfloat16
            )
            q = q_ref[0].astype(mm_dt)  # [KH, R, D]
            k = (
                k_buf[slot]
                .reshape(num_kv_heads, chunk_tokens, head_dim)
                .astype(mm_dt)
            )
            s_mat = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * sm_scale  # [KH, R, chunk_tokens]
            if quantized:
                s_mat = s_mat * head_scales(k_scales_ref, s_mat.shape, 0)
            if logit_softcap is not None:
                s_mat = logit_softcap * jnp.tanh(
                    s_mat * (1.0 / logit_softcap)
                )
            token_idx = base_tok + jax.lax.broadcasted_iota(
                jnp.int32, s_mat.shape, dimension=2
            )
            # per-query causality: row r is query index r // group at
            # position base + r//group, attending tokens <= its position
            q_idx = jax.lax.broadcasted_iota(
                jnp.int32, s_mat.shape, dimension=1
            ) // group
            limit = base + q_idx + 1
            in_range = (token_idx < limit) & (token_idx < s)
            if window is not None:
                in_range &= token_idx >= jnp.maximum(limit - window, 0)
            s_mat = jnp.where(in_range, s_mat, DEFAULT_MASK_VALUE)

            m_prev = m_scr[:, :, :1]
            l_prev = l_scr[:, :, :1]
            m_cur = jnp.max(s_mat, axis=2, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s_mat - m_new)
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
                pv = pv * head_scales(
                    k_scales_ref if mla else v_scales_ref, pv.shape, 0
                )
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

    # leave the NEXT row's chunk 0 in flight (slot 0, safe: all of this
    # row's slot reads completed above) — consumed by the next grid program
    nxt = jnp.minimum(b + 1, batch - 1)  # clamp: no OOB SMEM read on last row

    @pl.when((b + 1 < batch) & prefetch_safe(nxt))
    def _prefetch_next_row():
        n_n, fp_n, _ = row_geometry(nxt)
        start_chunk_row(nxt, n_n, fp_n, 0, 0)

    l = l_scr[:, :, :1]
    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "interpret", "pages_per_chunk", "window",
                     "mla_v_dim", "logit_softcap"),
    donate_argnums=(1, 2),
)
def paged_attention_verify(
    q: jax.Array,  # [B, T, num_q_heads, head_dim]
    k_pool: jax.Array,  # [L, num_pages, KH, page_tokens, D]
    v_pool: jax.Array,
    page_tables: jax.Array,  # [B, max_pages] int32 physical ids
    seq_lens: jax.Array,  # [B] int32 INCLUDING the T fed tokens
    layer: jax.Array | int,
    k_new: jax.Array,  # [B, T, KH, D] the fed tokens' K (unquantized if int8)
    v_new: jax.Array,
    slot_pages: jax.Array,  # [B, T] int32 (0 = discard)
    slot_offsets: jax.Array,  # [B, T] int32
    *,
    sm_scale: float | None = None,
    interpret: bool = False,
    pages_per_chunk: int | None = None,
    window: int | None = None,
    k_scales: jax.Array | None = None,
    v_scales: jax.Array | None = None,
    mla_v_dim: int | None = None,
    logit_softcap: float | None = None,
):
    """Fused speculative-decode verification step: write T fed tokens' KV
    per sequence, then causal multi-query paged attention.  Token j of row
    b sits at position ``seq_lens[b] - T + j``.  Returns
    (out [B, T, H, D], k_pool, v_pool) with the pools aliased in place —
    callers must donate them.  ``mla_v_dim``: MLA mode — k_pool is the
    single latent buffer, values are its first mla_v_dim lanes, v_pool is
    ignored (pass a dummy; None is returned in its place)."""
    B, T, num_q_heads, head_dim = q.shape
    L, _, num_kv_heads, page_tokens, _ = k_pool.shape
    assert num_q_heads % num_kv_heads == 0
    group = num_q_heads // num_kv_heads
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(head_dim)
    rows = T * group
    R = _round_up(rows, 8)
    max_pages = page_tables.shape[1]
    C = pages_per_chunk or _pick_pages_per_chunk(
        num_kv_heads, page_tokens, head_dim,
        jnp.dtype(k_pool.dtype).itemsize, max_pages,
    )
    sublane = _sublane_for(k_pool.dtype)
    quantized = jnp.dtype(k_pool.dtype) == jnp.int8
    if k_scales is None:
        k_scales = jnp.ones((L, num_kv_heads), jnp.float32)
    if v_scales is None:
        v_scales = jnp.ones((L, num_kv_heads), jnp.float32)

    # [B, T, H, D] -> [B, KH, R, D], row = t * group + g
    qg = (
        q.reshape(B, T, num_kv_heads, group, head_dim)
        .transpose(0, 2, 1, 3, 4)
        .reshape(B, num_kv_heads, rows, head_dim)
    )
    if R != rows:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, R - rows), (0, 0)))
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)
    mla = mla_v_dim is not None

    consts = dict(
        page_tokens=page_tokens,
        pages_per_chunk=C,
        num_kv_heads=num_kv_heads,
        group=group,
        q_tokens=T,
        sm_scale=sm_scale,
        sublane=sublane,
        window=window,
        quantized=quantized,
        v_head_dim=mla_v_dim,
        logit_softcap=logit_softcap,
    )
    in_specs = [
        pl.BlockSpec(
            (1, num_kv_heads, R, head_dim), lambda b, *_: (b, 0, 0, 0)
        ),
        pl.BlockSpec(
            (1, T, num_kv_heads, head_dim), lambda b, *_: (b, 0, 0, 0)
        ),
        pl.BlockSpec(
            (1, T, num_kv_heads, head_dim), lambda b, *_: (b, 0, 0, 0)
        ),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    o_spec = pl.BlockSpec(
        (1, num_kv_heads, R, head_dim), lambda b, *_: (b, 0, 0, 0)
    )
    # in MLA mode the V-side buffers are never touched — allocate minimal
    v_buf_shape = (
        (1, 1, 1, 1, 128) if mla
        else (2, num_kv_heads, C, page_tokens, head_dim)
    )
    win_v_shape = (1, 1, 128) if mla else (num_kv_heads, sublane, head_dim)
    scratch_shapes = [
        pltpu.VMEM((2, num_kv_heads, C, page_tokens, head_dim), k_pool.dtype),
        pltpu.VMEM(v_buf_shape, v_pool.dtype),
        pltpu.SemaphoreType.DMA((2, C, 2)),
        pltpu.VMEM((num_kv_heads, sublane, head_dim), k_pool.dtype),
        pltpu.VMEM(win_v_shape, v_pool.dtype),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.VMEM((num_kv_heads, R, 128), jnp.float32),
        pltpu.VMEM((num_kv_heads, R, 128), jnp.float32),
        pltpu.VMEM((num_kv_heads, R, head_dim), jnp.float32),
    ]
    o_shape = jax.ShapeDtypeStruct((B, num_kv_heads, R, head_dim), q.dtype)
    args = (page_tables, seq_lens, layer_arr, slot_pages, slot_offsets,
            k_scales, v_scales, qg, k_new, v_new, k_pool, v_pool)

    if mla:
        out, k_pool = pl.pallas_call(
            functools.partial(_verify_write_kernel_mla, **consts),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=7,
                grid=(B,),
                in_specs=in_specs,
                out_specs=(o_spec, pl.BlockSpec(memory_space=pl.ANY)),
                scratch_shapes=scratch_shapes,
            ),
            out_shape=(
                o_shape,
                jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
            ),
            # flat inputs incl. 7 scalar-prefetch args: 10=k_pool → output 1
            input_output_aliases={10: 1},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(*args)
        v_pool = None
    else:
        out, k_pool, v_pool = pl.pallas_call(
            functools.partial(_verify_write_kernel, **consts),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=7,
                grid=(B,),
                in_specs=in_specs,
                out_specs=(
                    o_spec,
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                ),
                scratch_shapes=scratch_shapes,
            ),
            out_shape=(
                o_shape,
                jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
                jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
            ),
            # flat inputs incl. 7 scalar-prefetch args: 7=q 8=k_new 9=v_new
            # 10=k_pool 11=v_pool → outputs 1, 2
            input_output_aliases={10: 1, 11: 2},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(*args)

    out = out[:, :, :rows, :]
    out = (
        out.reshape(B, num_kv_heads, T, group, head_dim)
        .transpose(0, 2, 1, 3, 4)
        .reshape(B, T, num_q_heads, head_dim)
    )
    return out, k_pool, v_pool


# ---------------------------------------------------------------------------
# Prefill page writer: copy a sequence's fresh KV into its pages, in place.
# ---------------------------------------------------------------------------


def _prefill_write_kernel(
    pages_ref,  # [n_pages] int32 physical page per chunk (SMEM)
    layer_ref,  # [1] int32
    k_new_ref,  # [num_kv_heads, page_tokens, head_dim] VMEM block (chunk j)
    v_new_ref,
    k_pool_in,
    v_pool_in,
    k_pool_ref,  # aliased outputs (HBM)
    v_pool_ref,
    sems,
):
    j = pl.program_id(0)
    layer = layer_ref[0]
    page = pages_ref[j]

    # page 0 = zero page: discard (padding chunks must not dirty it)
    @pl.when(page != 0)
    def _():
        ck = pltpu.make_async_copy(k_new_ref, k_pool_ref.at[layer, page], sems.at[0])
        cv = pltpu.make_async_copy(v_new_ref, v_pool_ref.at[layer, page], sems.at[1])
        ck.start()
        cv.start()
        ck.wait()
        cv.wait()


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0, 1))
def write_prefill_kv(
    k_pool: jax.Array,  # [L, num_pages, num_kv_heads, page_tokens, head_dim]
    v_pool: jax.Array,
    k_new: jax.Array,  # [num_kv_heads, T, head_dim]; T multiple of page_tokens
    v_new: jax.Array,
    pages: jax.Array,  # [T // page_tokens] int32 physical pages (0 = discard)
    layer: jax.Array | int,
    *,
    interpret: bool = False,
    k_scale: jax.Array | None = None,  # [KH] f32: int8 per-head scales
    v_scale: jax.Array | None = None,
):
    """Write a prefilled sequence's KV into its pages (in-place via aliasing).

    Page 0 (the zero page) acts as a discard target for padding chunks —
    defined-write semantics exactly like the reference's zero page
    (csrc/ftensor.cpp:160-176).  int8 pools quantize on write with the
    given per-head scales."""
    L, num_pages, num_kv_heads, page_tokens, head_dim = k_pool.shape
    T = k_new.shape[1]
    assert T % page_tokens == 0, "prefill length must be page-aligned"
    n = T // page_tokens
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)
    if jnp.dtype(k_pool.dtype) == jnp.int8:
        assert k_scale is not None and v_scale is not None, (
            "int8 pools need per-head scales"
        )
        k_new = jnp.clip(
            jnp.round(k_new.astype(jnp.float32) / k_scale[:, None, None]),
            -127, 127,
        )
        v_new = jnp.clip(
            jnp.round(v_new.astype(jnp.float32) / v_scale[:, None, None]),
            -127, 127,
        )

    k_pool, v_pool = pl.pallas_call(
        _prefill_write_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n,),
            in_specs=[
                pl.BlockSpec(
                    (num_kv_heads, page_tokens, head_dim),
                    lambda j, *_: (0, j, 0),
                ),
                pl.BlockSpec(
                    (num_kv_heads, page_tokens, head_dim),
                    lambda j, *_: (0, j, 0),
                ),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ),
            scratch_shapes=[pltpu.SemaphoreType.DMA((2,))],
        ),
        out_shape=(
            jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
            jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
        ),
        # flat inputs: 0=pages, 1=layer, 2=k_new, 3=v_new, 4=k_pool, 5=v_pool
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(pages, layer_arr, k_new.astype(k_pool.dtype), v_new.astype(v_pool.dtype),
      k_pool, v_pool)
    return k_pool, v_pool


def _prefill_write_single_kernel(
    pages_ref, layer_ref,
    k_new_ref, k_pool_in,
    k_pool_ref,
    sems,
):
    j = pl.program_id(0)
    layer = layer_ref[0]
    page = pages_ref[j]

    @pl.when(page != 0)
    def _():
        ck = pltpu.make_async_copy(k_new_ref, k_pool_ref.at[layer, page], sems.at[0])
        ck.start()
        ck.wait()


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0,))
def write_prefill_kv_single(
    k_pool: jax.Array,  # [L, num_pages, num_kv_heads, page_tokens, head_dim]
    k_new: jax.Array,  # [num_kv_heads, T, head_dim]; T multiple of page_tokens
    pages: jax.Array,  # [T // page_tokens] int32 (0 = discard/zero page)
    layer: jax.Array | int,
    *,
    interpret: bool = False,
    scale: jax.Array | None = None,  # [KH] f32: int8 per-head scales
) -> jax.Array:
    """Single-buffer prefill writer (MLA latent pool).  int8 pools
    quantize on write with the given per-head scales (the K scales — the
    latent buffer serves as both K and V)."""
    L, num_pages, num_kv_heads, page_tokens, head_dim = k_pool.shape
    T = k_new.shape[1]
    assert T % page_tokens == 0
    n = T // page_tokens
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)
    if jnp.dtype(k_pool.dtype) == jnp.int8:
        assert scale is not None, "int8 pools need per-head scales"
        k_new = jnp.clip(
            jnp.round(k_new.astype(jnp.float32) / scale[:, None, None]),
            -127, 127,
        )
    (k_pool,) = pl.pallas_call(
        _prefill_write_single_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n,),
            in_specs=[
                pl.BlockSpec(
                    (num_kv_heads, page_tokens, head_dim),
                    lambda j, *_: (0, j, 0),
                ),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(pl.BlockSpec(memory_space=pl.ANY),),
            scratch_shapes=[pltpu.SemaphoreType.DMA((1,))],
        ),
        out_shape=(jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),),
        # flat inputs: 0=pages, 1=layer, 2=k_new, 3=k_pool
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(pages, layer_arr, k_new.astype(k_pool.dtype), k_pool)
    return k_pool


def _decode_tokens_write_kernel(
    pool_layers_ref,  # [Lk] int32 (SMEM): pool layer index per kv layer
    slot_pages_ref,  # [Lk, B] int32 (0 = discard)
    slot_offsets_ref,  # [B] int32
    k_scales_ref,  # [L_pool, KH] f32 (ones if unused)
    v_scales_ref,
    k_new_ref,  # [1, num_kv_heads, head_dim] VMEM block (layer li, row b)
    v_new_ref,
    k_pool_in, v_pool_in,
    k_pool_ref, v_pool_ref,  # aliased outputs (HBM)
    win_k, win_v,  # [num_kv_heads, sublane, head_dim] VMEM RMW windows
    sems,
    *,
    sublane: int,
    num_kv_heads: int,
    quantized: bool,
    scales_by_kv_layer: bool = False,
):
    li = pl.program_id(0)
    b = pl.program_id(1)
    layer = pool_layers_ref[li]
    page = slot_pages_ref[li, b]
    off = slot_offsets_ref[b]

    @pl.when(page != 0)  # zero page = write-discard, like the fused kernel
    def _():
        win = (off // sublane) * sublane
        row = off - win

        def win_copy(vmem, pool, sem):
            return pltpu.make_async_copy(
                pool.at[layer, page, :, pl.ds(win, sublane)], vmem, sem
            )

        win_copy(win_k, k_pool_ref, sems.at[0]).start()
        win_copy(win_v, v_pool_ref, sems.at[1]).start()
        win_copy(win_k, k_pool_ref, sems.at[0]).wait()
        win_copy(win_v, v_pool_ref, sems.at[1]).wait()
        row_ids = jax.lax.broadcasted_iota(
            jnp.int32, (num_kv_heads, sublane, win_k.shape[-1]), 1
        )
        k_val = k_new_ref[0][:, None, :].astype(jnp.float32)
        v_val = v_new_ref[0][:, None, :].astype(jnp.float32)
        if quantized:
            # same formula as the fused kernel's quantize-on-write, so
            # rewriting a slot it already wrote is bit-identical.
            # scales_by_kv_layer: scales are keyed by KV (model) layer —
            # colocated-pp per-stage calibration, where layers of
            # different stages alias pool layers but carry their own rows
            sc_row = li if scales_by_kv_layer else layer
            k_sc = _select_head_scales(
                k_scales_ref, sc_row, num_kv_heads, k_val.shape, 0
            )
            v_sc = _select_head_scales(
                v_scales_ref, sc_row, num_kv_heads, v_val.shape, 0
            )
            k_val = jnp.clip(jnp.round(k_val / k_sc), -127, 127)
            v_val = jnp.clip(jnp.round(v_val / v_sc), -127, 127)
        win_k[...] = jnp.where(
            row_ids == row, k_val, win_k[...].astype(jnp.float32)
        ).astype(win_k.dtype)
        win_v[...] = jnp.where(
            row_ids == row, v_val, win_v[...].astype(jnp.float32)
        ).astype(win_v.dtype)

        def win_write(vmem, pool, sem):
            return pltpu.make_async_copy(
                vmem, pool.at[layer, page, :, pl.ds(win, sublane)], sem
            )

        win_write(win_k, k_pool_ref, sems.at[0]).start()
        win_write(win_v, v_pool_ref, sems.at[1]).start()
        win_write(win_k, k_pool_ref, sems.at[0]).wait()
        win_write(win_v, v_pool_ref, sems.at[1]).wait()


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0, 1))
def write_decode_tokens(
    k_pool: jax.Array,  # [L, num_pages, num_kv_heads, page_tokens, head_dim]
    v_pool: jax.Array,
    k_new: jax.Array,  # [Lk, B, num_kv_heads, head_dim] UNquantized
    v_new: jax.Array,
    pool_layers: jax.Array,  # [Lk] int32 pool layer per kv layer
    slot_pages: jax.Array,  # [Lk, B] int32 physical page (0 = discard)
    slot_offsets: jax.Array,  # [B] int32 slot within the page
    *,
    interpret: bool = False,
    k_scales: jax.Array | None = None,  # [L, KH] f32 (int8 pools)
    v_scales: jax.Array | None = None,
):
    """Write one decode token per (kv-layer, batch-row) into the pools,
    in place via aliasing.  The batched, all-layers counterpart of the fused
    decode kernel's RMW token write — used to EQUALIZE dp replicas: under a
    (dp, tp) mesh the fused kernel writes only the rows local to each dp
    shard, so after the step every shard writes ALL rows' tokens (gathered
    across dp, a few KB) through this kernel and the pool replicas stay
    bit-identical.  Without it, a sequence whose batch row migrates to the
    other dp shard (after a neighbour finishes) would read zeros for its
    previously decoded positions.

    ``pool_layers`` maps each kv layer to its pool layer index — identity
    for Llama-likes; for hybrid layer groups, layers of different groups
    share pool layers and are distinguished by page (models/hybrid.py).

    Rewriting a slot the fused kernel already wrote is bit-identical: the
    value path (cast → f32 blend → pool dtype; int8 clip(round(x/scale)))
    matches the fused kernel's exactly."""
    L, num_pages, num_kv_heads, page_tokens, head_dim = k_pool.shape
    Lk, B, _, _ = k_new.shape
    sublane = _sublane_for(k_pool.dtype)
    quantized = jnp.dtype(k_pool.dtype) == jnp.int8
    # scales keyed by KV (model) layer instead of pool layer: the
    # colocated-pp per-stage calibration contract (rows == Lk != L; when
    # Lk == L the two indexings coincide — pool_layers is the identity)
    scales_by_kv_layer = (
        quantized and k_scales is not None and k_scales.shape[0] == Lk
        and Lk != L
    )
    if quantized:
        assert k_scales is not None and v_scales is not None
    else:
        # unquantized: pre-cast so the blend matches the fused kernel's bits
        k_new = k_new.astype(k_pool.dtype)
        v_new = v_new.astype(v_pool.dtype)
    if k_scales is None:
        k_scales = jnp.ones((L, num_kv_heads), jnp.float32)
    if v_scales is None:
        v_scales = jnp.ones((L, num_kv_heads), jnp.float32)
    # flatten (layer, row) so the VMEM block is rank-3 like the fused
    # kernel's k_new (a rank-4 (1,1,KH,D) block trips a Mosaic reshape)
    k_new = k_new.reshape(Lk * B, num_kv_heads, head_dim)
    v_new = v_new.reshape(Lk * B, num_kv_heads, head_dim)

    k_pool, v_pool = pl.pallas_call(
        functools.partial(
            _decode_tokens_write_kernel,
            sublane=sublane,
            num_kv_heads=num_kv_heads,
            quantized=quantized,
            scales_by_kv_layer=scales_by_kv_layer,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(Lk, B),
            in_specs=[
                pl.BlockSpec(
                    (1, num_kv_heads, head_dim),
                    lambda li, b, *_: (li * B + b, 0, 0),
                ),
                pl.BlockSpec(
                    (1, num_kv_heads, head_dim),
                    lambda li, b, *_: (li * B + b, 0, 0),
                ),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ),
            scratch_shapes=[
                pltpu.VMEM((num_kv_heads, sublane, head_dim), k_pool.dtype),
                pltpu.VMEM((num_kv_heads, sublane, head_dim), v_pool.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
            jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
        ),
        # flat inputs: 0=pool_layers 1=slot_pages 2=slot_offsets 3=k_scales
        # 4=v_scales 5=k_new 6=v_new 7=k_pool 8=v_pool
        input_output_aliases={7: 0, 8: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(pool_layers, slot_pages, slot_offsets, k_scales, v_scales,
      k_new, v_new, k_pool, v_pool)
    return k_pool, v_pool


def _decode_tokens_write_single_kernel(
    pool_layers_ref,  # [Lk] int32 (SMEM)
    slot_pages_ref,  # [Lk, B] int32 (0 = discard)
    slot_offsets_ref,  # [B] int32
    k_scales_ref,  # [L_pool, KH] f32 (ones if unused)
    k_new_ref,  # [1, num_kv_heads, head_dim] VMEM block (layer li, row b)
    k_pool_in,
    k_pool_ref,  # aliased output (HBM)
    win_k,  # [num_kv_heads, sublane, head_dim] VMEM RMW window
    sems,
    *,
    sublane: int,
    num_kv_heads: int,
    quantized: bool,
):
    li = pl.program_id(0)
    b = pl.program_id(1)
    layer = pool_layers_ref[li]
    page = slot_pages_ref[li, b]
    off = slot_offsets_ref[b]

    @pl.when(page != 0)
    def _():
        win = (off // sublane) * sublane
        row = off - win
        cp = pltpu.make_async_copy(
            k_pool_ref.at[layer, page, :, pl.ds(win, sublane)], win_k,
            sems.at[0],
        )
        cp.start()
        cp.wait()
        row_ids = jax.lax.broadcasted_iota(
            jnp.int32, (num_kv_heads, sublane, win_k.shape[-1]), 1
        )
        k_val = k_new_ref[0][:, None, :].astype(jnp.float32)
        if quantized:
            k_sc = _select_head_scales(
                k_scales_ref, layer, num_kv_heads, k_val.shape, 0
            )
            k_val = jnp.clip(jnp.round(k_val / k_sc), -127, 127)
        win_k[...] = jnp.where(
            row_ids == row, k_val, win_k[...].astype(jnp.float32)
        ).astype(win_k.dtype)
        wr = pltpu.make_async_copy(
            win_k, k_pool_ref.at[layer, page, :, pl.ds(win, sublane)],
            sems.at[0],
        )
        wr.start()
        wr.wait()


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0,))
def write_decode_tokens_single(
    k_pool: jax.Array,  # [L, num_pages, num_kv_heads, page_tokens, head_dim]
    k_new: jax.Array,  # [Lk, B, num_kv_heads, head_dim] UNquantized
    pool_layers: jax.Array,  # [Lk] int32 pool layer per kv layer
    slot_pages: jax.Array,  # [Lk, B] int32 physical page (0 = discard)
    slot_offsets: jax.Array,  # [B] int32 slot within the page
    *,
    interpret: bool = False,
    k_scales: jax.Array | None = None,  # [L, KH] f32 (int8 pools)
) -> jax.Array:
    """Single-buffer counterpart of :func:`write_decode_tokens` — the MLA
    latent pool's dp-replica equalizer (one combined-KV buffer, reference
    sglang/patches.py:523-702).  Same RMW-window blend, so rewriting a slot
    the fused kernel already wrote is bit-identical."""
    L, num_pages, num_kv_heads, page_tokens, head_dim = k_pool.shape
    Lk, B, _, _ = k_new.shape
    sublane = _sublane_for(k_pool.dtype)
    quantized = jnp.dtype(k_pool.dtype) == jnp.int8
    if quantized:
        assert k_scales is not None
    else:
        k_new = k_new.astype(k_pool.dtype)
    if k_scales is None:
        k_scales = jnp.ones((L, num_kv_heads), jnp.float32)
    k_new = k_new.reshape(Lk * B, num_kv_heads, head_dim)

    (k_pool,) = pl.pallas_call(
        functools.partial(
            _decode_tokens_write_single_kernel,
            sublane=sublane,
            num_kv_heads=num_kv_heads,
            quantized=quantized,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(Lk, B),
            in_specs=[
                pl.BlockSpec(
                    (1, num_kv_heads, head_dim),
                    lambda li, b, *_: (li * B + b, 0, 0),
                ),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(pl.BlockSpec(memory_space=pl.ANY),),
            scratch_shapes=[
                pltpu.VMEM((num_kv_heads, sublane, head_dim), k_pool.dtype),
                pltpu.SemaphoreType.DMA((1,)),
            ],
        ),
        out_shape=(jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),),
        # flat inputs: 0=pool_layers 1=slot_pages 2=slot_offsets 3=k_scales
        # 4=k_new 5=k_pool
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(pool_layers, slot_pages, slot_offsets, k_scales, k_new, k_pool)
    return k_pool


# ---------------------------------------------------------------------------
# Dense XLA reference (tests + non-TPU fallback).
# ---------------------------------------------------------------------------


def paged_attention_reference(
    q: jax.Array,
    k_pool: jax.Array,
    v_pool: jax.Array,
    page_tables: jax.Array,
    seq_lens: jax.Array,
    *,
    sm_scale: float | None = None,
    logit_softcap: float | None = None,
) -> jax.Array:
    batch, num_q_heads, head_dim = q.shape
    if k_pool.ndim == 5:
        k_pool = k_pool[0]
        v_pool = v_pool[0]
    _, num_kv_heads, page_tokens, _ = k_pool.shape
    q_per_kv = num_q_heads // num_kv_heads
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(head_dim)
    max_pages = page_tables.shape[1]
    max_len = max_pages * page_tokens

    k = k_pool[page_tables]  # [B, max_pages, H, P, D]
    v = v_pool[page_tables]
    k = k.transpose(0, 2, 1, 3, 4).reshape(batch, num_kv_heads, max_len, head_dim)
    v = v.transpose(0, 2, 1, 3, 4).reshape(batch, num_kv_heads, max_len, head_dim)

    qg = q.reshape(batch, num_kv_heads, q_per_kv, head_dim).astype(jnp.float32)
    s = jnp.einsum("bhqd,bhtd->bhqt", qg, k.astype(jnp.float32)) * sm_scale
    if logit_softcap is not None:
        s = logit_softcap * jnp.tanh(s / logit_softcap)
    mask = jnp.arange(max_len)[None, None, None, :] < seq_lens[:, None, None, None]
    s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqt,bhtd->bhqd", p, v.astype(jnp.float32))
    return o.reshape(batch, num_q_heads, head_dim).astype(q.dtype)
