"""Test harness: run everything on a simulated 8-device CPU mesh.

The reference has no test suite (SURVEY.md §4); this framework builds the
pyramid it lacks. Multi-chip behavior is tested without hardware via
XLA's forced host platform device count (the TPU-world replacement for
fake distributed backends).

The container's sitecustomize registers the real-TPU 'axon' PJRT plugin at
interpreter start (and pins JAX_PLATFORMS=axon), so we must override the
platform *after* import but before first backend use.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()

# persistent compilation cache: cuts repeat-suite wall time on one core
import tempfile  # noqa: E402

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:
    pass
