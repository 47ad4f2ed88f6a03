"""Device-side KV page pool for TPU HBM."""

from .pool import DevicePagePool, PoolSpec

__all__ = ["DevicePagePool", "PoolSpec"]
