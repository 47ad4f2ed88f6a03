"""Paged-attention kernel correctness vs dense reference.

The TPU analogue of the reference's aliasing/semantics proof
(tests/test_paged_allocator_aliasing.py): KV written through the page
indirection must read back exactly; attention over paged KV must match dense
attention on the same data.

On CPU the kernel runs in interpreter mode (small shapes only); set
KVCACHED_TPU_TEST_REAL=1 to compile on the real chip.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvcached_tpu.device.pool import write_kv_pages
from kvcached_tpu.ops.paged_attention import (
    paged_attention,
    paged_attention_reference,
)

REAL_TPU = os.environ.get("KVCACHED_TPU_TEST_REAL") == "1"
INTERPRET = not REAL_TPU


def make_paged_case(
    key,
    batch=2,
    num_q_heads=4,
    num_kv_heads=2,
    head_dim=128,
    page_tokens=16,
    num_pages=32,
    seq_lens=(37, 9),
    dtype=jnp.float32,
):
    """Build a pool where each sequence's tokens live on randomly-assigned
    (non-contiguous, shuffled) physical pages — exercising real indirection."""
    keys = jax.random.split(key, 4)
    max_pages = max(-(-s // page_tokens) for s in seq_lens)
    k_pool = jnp.zeros((num_pages, num_kv_heads, page_tokens, head_dim), dtype)
    v_pool = jnp.zeros_like(k_pool)

    # assign shuffled distinct physical pages (avoid page 0 = zero page)
    rng = np.random.default_rng(0)
    all_pages = rng.permutation(np.arange(1, num_pages))
    page_tables = np.zeros((len(seq_lens), max_pages), np.int32)
    next_page = 0
    ks, vs, qs = [], [], []
    for b, s in enumerate(seq_lens):
        n = -(-s // page_tokens)
        page_tables[b, :n] = all_pages[next_page : next_page + n]
        next_page += n
    page_tables = jnp.asarray(page_tables)

    k_data = jax.random.normal(keys[0], (len(seq_lens), max(seq_lens), num_kv_heads, head_dim), dtype)
    v_data = jax.random.normal(keys[1], (len(seq_lens), max(seq_lens), num_kv_heads, head_dim), dtype)
    q = jax.random.normal(keys[2], (len(seq_lens), num_q_heads, head_dim), dtype)

    # write KV through the paged write path
    for b, s in enumerate(seq_lens):
        tok = np.arange(s)
        pages = np.asarray(page_tables)[b, tok // page_tokens]
        slots = tok % page_tokens
        k_pool, v_pool = write_kv_pages(
            k_pool[None], v_pool[None], 0,
            k_data[b, :s], v_data[b, :s],
            jnp.asarray(pages), jnp.asarray(slots),
        )
        k_pool, v_pool = k_pool[0], v_pool[0]

    seq_lens_arr = jnp.asarray(seq_lens, jnp.int32)
    return q, k_pool, v_pool, page_tables, seq_lens_arr, (k_data, v_data)


class TestWritePath:
    def test_scatter_roundtrip(self):
        """KV written at (page, slot) positions reads back exactly."""
        key = jax.random.PRNGKey(0)
        q, k_pool, v_pool, page_tables, seq_lens, (k_data, v_data) = make_paged_case(key)
        pt = np.asarray(page_tables)
        for b, s in enumerate(np.asarray(seq_lens)):
            for t in [0, int(s) - 1, int(s) // 2]:
                page = pt[b, t // 16]
                slot = t % 16
                got = np.asarray(k_pool[page, :, slot, :])
                want = np.asarray(k_data[b, t])
                np.testing.assert_array_equal(got, want)

    def test_zero_page_untouched(self):
        key = jax.random.PRNGKey(1)
        _, k_pool, v_pool, *_ = make_paged_case(key)
        assert float(jnp.abs(k_pool[0]).sum()) == 0.0
        assert float(jnp.abs(v_pool[0]).sum()) == 0.0


class TestPagedAttention:
    @pytest.mark.parametrize("seq_lens", [(37, 9), (16, 16), (1, 63)])
    def test_matches_dense_reference_fp32(self, seq_lens):
        key = jax.random.PRNGKey(42)
        q, k_pool, v_pool, page_tables, seq_lens_arr, _ = make_paged_case(
            key, seq_lens=seq_lens
        )
        ref = paged_attention_reference(q, k_pool, v_pool, page_tables, seq_lens_arr)
        out = paged_attention(
            q, k_pool, v_pool, page_tables, seq_lens_arr, interpret=INTERPRET
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    @pytest.mark.parametrize("cap", [20.0, 50.0])
    def test_logit_softcap_matches_reference(self, cap):
        """Gemma2-style attention logit soft-capping: the in-kernel
        cap*tanh(s/cap) (applied pre-mask) must match the dense reference,
        and must actually change the output vs the uncapped kernel."""
        key = jax.random.PRNGKey(11)
        q, k_pool, v_pool, page_tables, seq_lens_arr, _ = make_paged_case(
            key, seq_lens=(37, 9)
        )
        q = q * 3.0  # push logits into the tanh's nonlinear range
        ref = paged_attention_reference(
            q, k_pool, v_pool, page_tables, seq_lens_arr, logit_softcap=cap
        )
        out = paged_attention(
            q, k_pool, v_pool, page_tables, seq_lens_arr,
            interpret=INTERPRET, logit_softcap=cap,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )
        uncapped = paged_attention(
            q, k_pool, v_pool, page_tables, seq_lens_arr, interpret=INTERPRET
        )
        assert float(jnp.abs(out - uncapped).max()) > 1e-4

    def test_sm_scale_override(self):
        """query_pre_attn_scalar-style softmax scaling: sm_scale is honored
        (checked against the reference at the same override)."""
        key = jax.random.PRNGKey(12)
        q, k_pool, v_pool, page_tables, seq_lens_arr, _ = make_paged_case(
            key, seq_lens=(20,)
        )
        ref = paged_attention_reference(
            q, k_pool, v_pool, page_tables, seq_lens_arr, sm_scale=256.0 ** -0.5
        )
        out = paged_attention(
            q, k_pool, v_pool, page_tables, seq_lens_arr,
            interpret=INTERPRET, sm_scale=256.0 ** -0.5,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_gqa_ratio_8(self):
        key = jax.random.PRNGKey(7)
        q, k_pool, v_pool, page_tables, seq_lens_arr, _ = make_paged_case(
            key, num_q_heads=8, num_kv_heads=1, seq_lens=(20,)
        )
        ref = paged_attention_reference(q, k_pool, v_pool, page_tables, seq_lens_arr)
        out = paged_attention(
            q, k_pool, v_pool, page_tables, seq_lens_arr, interpret=INTERPRET
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_page_shuffle_invariance(self):
        """Moving a sequence to different physical pages must not change the
        output — the semantic core of virtual-memory indirection."""
        key = jax.random.PRNGKey(3)
        q, k_pool, v_pool, page_tables, seq_lens_arr, (k_data, v_data) = make_paged_case(
            key, seq_lens=(24,), num_pages=32
        )
        out1 = paged_attention(
            q, k_pool, v_pool, page_tables, seq_lens_arr, interpret=INTERPRET
        )
        # rebuild with a different physical placement (different rng consumed
        # pages) by shifting every page id by a fixed offset into free space
        shift = 10
        pt2 = jnp.where(page_tables > 0, ((page_tables - 1 + shift) % 31) + 1, 0)
        k_pool2 = jnp.zeros_like(k_pool).at[pt2[0]].set(k_pool[page_tables[0]])
        v_pool2 = jnp.zeros_like(v_pool).at[pt2[0]].set(v_pool[page_tables[0]])
        out2 = paged_attention(
            q, k_pool2, v_pool2, pt2, seq_lens_arr, interpret=INTERPRET
        )
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
