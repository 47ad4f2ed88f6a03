"""Model families served by kvcached-tpu."""

from .llama import LlamaConfig, init_llama_params, llama_decode_step, llama_prefill_step

__all__ = [
    "LlamaConfig",
    "init_llama_params",
    "llama_decode_step",
    "llama_prefill_step",
]
