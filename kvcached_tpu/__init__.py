"""kvcached-tpu: TPU-native elastic KV-cache engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of kvcached
(OS-style virtual memory for LLM KV caches): engines see a large virtual
block-id space backed by physical HBM pages on demand, multiple LLMs share
one TPU's HBM elastically, and an external CLI (`kvctl`/`kvtop`) can raise or
lower each instance's memory limit at runtime through a /dev/shm control
plane.

On TPU the CUDA VMM remap trick becomes page-table indirection: a
preallocated HBM page pool + int32 block→page tables consumed by Pallas
paged-attention kernels.  See SURVEY.md §7 for the design translation.
"""

from .config import KVConfig, KVCachedConfigError
from .kv_cache_manager import KVCacheManager
from .core import HostPagePool

__version__ = "0.1.0"

__all__ = [
    "KVConfig",
    "KVCachedConfigError",
    "KVCacheManager",
    "HostPagePool",
    "__version__",
]
