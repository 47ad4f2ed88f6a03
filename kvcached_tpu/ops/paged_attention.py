"""Paged decode attention as a Pallas TPU kernel.

The consumer of the page-table indirection that replaces CUDA VMM: instead
of the attention kernel reading K/V through remapped virtual addresses (how
the host engines' FlashAttention sees kvcached tensors), the kernel receives
the physical pool and per-sequence page tables, and DMAs exactly the live
pages from HBM into VMEM with a multi-page double-buffered pipeline that
overlaps DMA with compute.

Layout (see device/pool.py): pool ``[num_pages, num_kv_heads, page_tokens,
head_dim]`` per layer.  One *whole page* — all kv heads — is a single
contiguous ``num_kv_heads × page_tokens × head_dim`` slab (e.g. 128 KB for
8 heads × 64 tokens × 128 dim bf16), so page indirection costs one large DMA
per page rather than per-head strided reads (the reference's
contiguous-layout trap cost −31% e2e from exactly this kind of stride
fragmentation, benchmarks/bench_layout).

Grid: ``(batch,)`` — each program handles one sequence: it streams the
sequence's pages in chunks of ``pages_per_chunk`` (2×chunk DMAs in flight),
and runs an online (flash) softmax in fp32 per kv head over each chunk.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _paged_attn_kernel(
    # scalar prefetch
    page_tables_ref,  # [B, max_pages] int32 (SMEM)
    seq_lens_ref,  # [B] int32 (SMEM)
    # inputs
    q_ref,  # [1, num_kv_heads, q_pad, head_dim] VMEM block
    k_pool_ref,  # [num_pages, num_kv_heads, page_tokens, head_dim] (HBM)
    v_pool_ref,  # same
    # outputs
    o_ref,  # [1, num_kv_heads, q_pad, head_dim] VMEM block
    # scratch
    k_buf,  # [2, num_kv_heads, C, page_tokens, head_dim] VMEM
    v_buf,  # same
    sems,  # DMA sems [2, C, 2]
    m_scr,  # [num_kv_heads, q_pad, 128] f32
    l_scr,  # [num_kv_heads, q_pad, 128] f32
    acc_scr,  # [num_kv_heads, q_pad, head_dim] f32
    *,
    page_tokens: int,
    pages_per_chunk: int,
    num_kv_heads: int,
    sm_scale: float,
):
    b = pl.program_id(0)
    seq_len = seq_lens_ref[b]
    num_pages = pl.cdiv(seq_len, page_tokens)
    C = pages_per_chunk
    num_chunks = pl.cdiv(num_pages, C)
    chunk_tokens = C * page_tokens

    def page_dma(chunk, j, slot, kv):
        """DMA page j of `chunk` into buffer column j (strided dst so each
        head's chunk ends up dense: buf[slot, :, j] <- pool[page])."""
        page_idx = chunk * C + j
        # clamp so speculative/out-of-range issues read a valid (ignored) page
        page_idx = jnp.minimum(page_idx, num_pages - 1)
        page_id = page_tables_ref[b, page_idx]
        pool = k_pool_ref if kv == 0 else v_pool_ref
        buf = k_buf if kv == 0 else v_buf
        return pltpu.make_async_copy(
            pool.at[page_id], buf.at[slot, :, j], sems.at[slot, j, kv]
        )

    # Tail chunks DMA a clamped (valid) page into the unused columns instead
    # of skipping them: scratch VMEM is uninitialized, and a masked score
    # still multiplies the V buffer (0 × NaN = NaN), so every column must
    # hold finite data.  Costs ≤ C−1 redundant page reads per sequence.
    def start_chunk(chunk, slot):
        for j in range(C):
            page_dma(chunk, j, slot, 0).start()
            page_dma(chunk, j, slot, 1).start()

    def wait_chunk(chunk, slot):
        for j in range(C):
            page_dma(chunk, j, slot, 0).wait()
            page_dma(chunk, j, slot, 1).wait()

    m_scr[...] = jnp.full_like(m_scr, DEFAULT_MASK_VALUE)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

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

            # token index across the chunk, for the tail mask
            base = c * chunk_tokens
            for h in range(num_kv_heads):  # unrolled; data already in VMEM
                q = q_ref[0, h].astype(jnp.float32) * sm_scale  # [q_pad, D]
                k = (
                    k_buf[slot, h]
                    .reshape(chunk_tokens, q.shape[1])
                    .astype(jnp.float32)
                )
                v = (
                    v_buf[slot, h]
                    .reshape(chunk_tokens, q.shape[1])
                    .astype(jnp.float32)
                )
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [q_pad, chunk_tokens]
                token_idx = base + jax.lax.broadcasted_iota(
                    jnp.int32, s.shape, dimension=1
                )
                s = jnp.where(token_idx < seq_len, s, DEFAULT_MASK_VALUE)

                m_prev = m_scr[h, :, :1]
                l_prev = l_scr[h, :, :1]
                m_cur = jnp.max(s, axis=1, keepdims=True)
                m_new = jnp.maximum(m_prev, m_cur)
                alpha = jnp.exp(m_prev - m_new)
                p = jnp.exp(s - m_new)
                l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
                acc_scr[h] = acc_scr[h] * alpha + jax.lax.dot_general(
                    p, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                m_scr[h, :, :1] = m_new
                l_scr[h, :, :1] = l_new
            return 0

        jax.lax.fori_loop(0, num_chunks, body, 0, unroll=False)

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


@functools.partial(jax.jit, static_argnames=("sm_scale", "interpret", "pages_per_chunk"))
def paged_attention(
    q: jax.Array,  # [B, num_q_heads, head_dim]
    k_pool: jax.Array,  # [num_pages, num_kv_heads, page_tokens, head_dim]
    v_pool: jax.Array,
    page_tables: jax.Array,  # [B, max_pages_per_seq] int32 (physical ids)
    seq_lens: jax.Array,  # [B] int32
    *,
    sm_scale: float | None = None,
    interpret: bool = False,
    pages_per_chunk: int | None = None,
) -> jax.Array:
    """Decode-mode paged attention. Returns [B, num_q_heads, head_dim]."""
    batch, num_q_heads, head_dim = q.shape
    _, num_kv_heads, page_tokens, head_dim_k = k_pool.shape
    assert head_dim == head_dim_k
    assert num_q_heads % num_kv_heads == 0
    q_per_kv = num_q_heads // num_kv_heads
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(head_dim)
    max_pages = page_tables.shape[1]
    if pages_per_chunk is None:
        pages_per_chunk = _pick_pages_per_chunk(
            num_kv_heads, page_tokens, head_dim, jnp.dtype(k_pool.dtype).itemsize,
            max_pages,
        )
    C = pages_per_chunk

    # Pad GQA group to the fp32 sublane minimum so the score matmul tiles.
    q_pad = _round_up(q_per_kv, 8)
    qg = q.reshape(batch, num_kv_heads, q_per_kv, head_dim)
    if q_pad != q_per_kv:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, q_pad - q_per_kv), (0, 0)))

    out = pl.pallas_call(
        functools.partial(
            _paged_attn_kernel,
            page_tokens=page_tokens,
            pages_per_chunk=C,
            num_kv_heads=num_kv_heads,
            sm_scale=sm_scale,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(batch,),
            in_specs=[
                pl.BlockSpec(
                    (1, num_kv_heads, q_pad, head_dim),
                    lambda b, *_: (b, 0, 0, 0),
                ),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, num_kv_heads, q_pad, head_dim),
                lambda b, *_: (b, 0, 0, 0),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, num_kv_heads, C, page_tokens, head_dim), k_pool.dtype),
                pltpu.VMEM((2, num_kv_heads, C, page_tokens, head_dim), v_pool.dtype),
                pltpu.SemaphoreType.DMA((2, C, 2)),
                pltpu.VMEM((num_kv_heads, q_pad, 128), jnp.float32),
                pltpu.VMEM((num_kv_heads, q_pad, 128), jnp.float32),
                pltpu.VMEM((num_kv_heads, q_pad, head_dim), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, num_kv_heads, q_pad, head_dim), q.dtype
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(page_tables, seq_lens, qg, k_pool, v_pool)

    out = out[:, :, :q_per_kv, :]
    return out.reshape(batch, num_q_heads, head_dim)


def paged_attention_reference(
    q: jax.Array,
    k_pool: jax.Array,
    v_pool: jax.Array,
    page_tables: jax.Array,
    seq_lens: jax.Array,
    *,
    sm_scale: float | None = None,
) -> jax.Array:
    """Dense XLA reference used for bit-accuracy tests and as a fallback on
    non-TPU backends."""
    batch, num_q_heads, head_dim = q.shape
    _, num_kv_heads, page_tokens, _ = k_pool.shape
    q_per_kv = num_q_heads // num_kv_heads
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(head_dim)
    max_pages = page_tables.shape[1]
    max_len = max_pages * page_tokens

    # gather: [B, max_pages, H, page_tokens, D] -> [B, H, max_len, D]
    k = k_pool[page_tables]  # [B, max_pages, H, P, D]
    v = v_pool[page_tables]
    k = k.transpose(0, 2, 1, 3, 4).reshape(batch, num_kv_heads, max_len, head_dim)
    v = v.transpose(0, 2, 1, 3, 4).reshape(batch, num_kv_heads, max_len, head_dim)

    qg = q.reshape(batch, num_kv_heads, q_per_kv, head_dim).astype(jnp.float32)
    s = jnp.einsum("bhqd,bhtd->bhqt", qg, k.astype(jnp.float32)) * sm_scale
    mask = jnp.arange(max_len)[None, None, None, :] < seq_lens[:, None, None, None]
    s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqt,bhtd->bhqd", p, v.astype(jnp.float32))
    return o.reshape(batch, num_q_heads, head_dim).astype(q.dtype)
