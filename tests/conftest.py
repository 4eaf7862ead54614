"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding tests use
xla_force_host_platform_device_count per the standard JAX testing recipe.
"""

import os

# Force CPU: the ambient environment may preset JAX_PLATFORMS=axon (the
# single-TPU tunnel), which makes eager/test dispatch go over the wire.
# Set CONT2_TEST_PLATFORM=axon explicitly to run the suite on the chip.
os.environ["JAX_PLATFORMS"] = os.environ.get("CONT2_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# persistent compile cache: the descriptor/query graphs take minutes to
# compile on CPU; caching makes repeated test runs fast
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
