"""Serving engine: continuous batching over the elastic paged KV pool."""

from .engine import EngineConfig, LLMEngine, Request, RequestOutput, SamplingParams

__all__ = [
    "LLMEngine",
    "EngineConfig",
    "Request",
    "RequestOutput",
    "SamplingParams",
]
