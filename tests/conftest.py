"""Test configuration.

Tests default to an 8-device virtual CPU mesh so the full sharding story is
exercised without TPU hardware (the axon tunnel exposes one real chip; set
KVCACHED_TPU_TEST_REAL=1 to run device tests against it instead).
"""

import os
import sys

os.environ.setdefault("KVCACHED_LOG_LEVEL", "WARNING")

if os.environ.get("KVCACHED_TPU_TEST_REAL") != "1":
    # Must happen before any backend initialization.  The axon sitecustomize
    # pre-imports jax, but backends are only chosen on first use, so a config
    # update here still wins.
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
