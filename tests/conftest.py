"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

This is the TPU-world substitute for multi-node testing (SURVEY.md §4):
sharding/pjit paths are validated on a fake 8-device mesh.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# Determinism + speed for tests
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The container's sitecustomize force-registers the axon TPU backend and wins
# over the env var; pin the config explicitly before any backend init.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: re-runs of the suite skip the expensive CPU
# compiles (matcher while_loops, tiny-GPV graphs)
jax.config.update("jax_compilation_cache_dir", "/tmp/gpv_tpu_test_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute tests (mesh recompiles, e2e trainer, "
        "multi-process cluster); deselect with -m 'not slow'")
