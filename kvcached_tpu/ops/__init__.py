"""Pallas TPU kernels for the paged KV cache."""

from .paged_attention import paged_attention, paged_attention_reference

__all__ = ["paged_attention", "paged_attention_reference"]
