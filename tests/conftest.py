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
else:
    # On the TPU backend, f32 matmuls default to bf16 MXU operands; the
    # interpret-mode kernel-equivalence tests compare two reduction orders
    # (verify vs chained decode) at atol=1e-5, which only holds when the
    # interpreter's dots run at full f32 (pool WRITES are bit-exact either
    # way — measured: out diff ~1e-3 on long rows, pools identical).
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
