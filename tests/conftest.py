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


_TINY_INIT_CACHE = {}


def tiny_init(model):
    """Session-memoized `model.init` for tiny test models.

    Init VALUES depend only on the module config and the seed — not on the
    batch size or query/answer lengths of the init inputs (initializers see
    parameter shapes only) — so every fixture across test modules can share
    one init per distinct config instead of re-tracing the full tiny-GPV
    graph (~20 s each on this 1-vCPU box; VERDICT r2 item 9). Keyed by
    repr(model) because detr_cfg dict fields make flax modules unhashable.
    """
    import jax.numpy as jnp
    key = repr(model)
    if key not in _TINY_INIT_CACHE:
        _TINY_INIT_CACHE[key] = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 48, 64, 3), jnp.float32),
            jnp.zeros((1, 5), jnp.int32), jnp.zeros((1, 8), jnp.int32),
            train=False)
    return _TINY_INIT_CACHE[key]


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute tests (mesh recompiles, e2e trainer, "
        "multi-process cluster); deselect with -m 'not slow'")
