"""Test configuration: force the CPU backend with 8 virtual devices so that
multi-chip sharding tests run anywhere (the same way MPI users test with
`mpirun -np N` on one box — SURVEY.md §4).

Note: this image's sitecustomize imports jax at interpreter start and
registers the remote `axon` TPU backend, so env vars set here are too late —
we must override via jax.config before the first backend use. XLA_FLAGS is
read lazily at CPU-client creation, so setting it here still works.
"""
import os

if os.environ.get("METACACHE_TPU_PARITY"):
    # nightly-style parity job: run the single-device parity subset against
    # the REAL TPU backend (see tests/README.md for the command). Sharded
    # tests need 8 devices and are skipped below.
    import jax  # noqa: E402
else:
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu"
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cputest")


def pytest_collection_modifyitems(config, items):
    if not os.environ.get("METACACHE_TPU_PARITY"):
        return
    import pytest
    import jax as _jax
    _jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    n = len(_jax.devices())
    skip = pytest.mark.skip(reason="needs a multi-device mesh; the TPU "
                            "parity job runs on the single real chip")
    multidev = ("test_sharded_engine", "test_distributed", "test_cli_mesh")
    for item in items:
        if n < 8 and any(m in item.nodeid for m in multidev):
            item.add_marker(skip)
