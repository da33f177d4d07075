"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip code paths (esvo_tpu.parallel) are exercised without TPUs via
XLA's host-platform device-count override, per SURVEY.md §4.

Note: this environment pre-registers a TPU PJRT plugin at interpreter
start, so the platform must be switched via jax.config (the CPU backend is
created lazily and picks up XLA_FLAGS at that point).
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the e2e/mesh tests are dominated by CPU
# compiles of large programs; the cache keys by HLO hash, so repeat runs
# (and unchanged programs across edits) skip them safely.
_cache_dir = os.environ.get("ESVO_TEST_CACHE",
                            "/tmp/esvo_tpu_jax_test_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    # the XLA:CPU AOT sub-caches bake host machine features in and can
    # SIGILL when replayed under a different feature set (observed:
    # "+prefer-no-gather is not supported on the host machine")
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
except Exception:  # older jax without the knobs: run uncached
    pass
