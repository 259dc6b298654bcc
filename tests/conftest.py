"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analogue of testing multi-node behavior without a
cluster (the reference never solved this — it had no tests at all,
SURVEY.md section 4). Must run before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep CPU matmuls deterministic-ish and fast in CI.
os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE", "false")

# The container's sitecustomize pre-imports jax with the TPU ('axon')
# backend registered and JAX_PLATFORMS=axon baked into jax.config, so the
# env var alone is too late here — override the live config before any
# backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the jitted train steps take ~30-60s each to
# compile on CPU; caching makes repeated test runs (and multiple Trainer
# instances) load them from disk instead.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
