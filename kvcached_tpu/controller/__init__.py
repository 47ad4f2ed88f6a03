"""Multi-LLM controller: router, frontend, sleep manager, traffic monitor.

Functional equivalent of the reference's ``controller/`` (L8): routes
OpenAI-style requests to models, tracks per-model traffic, and puts idle
models to sleep (weights → host RAM, KV pages → shared pool) to reclaim
HBM for busy ones.
"""

from .traffic_monitor import ModelActivityStats, TrafficMonitor
from .sleep_manager import SleepConfig, SleepManager
from .router import LLMRouter

__all__ = [
    "TrafficMonitor",
    "ModelActivityStats",
    "SleepManager",
    "SleepConfig",
    "LLMRouter",
]
