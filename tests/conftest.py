"""Test configuration: force the CPU backend with 8 virtual devices so that
multi-chip sharding tests run anywhere (the same way MPI users test with
`mpirun -np N` on one box — SURVEY.md §4).

Note: this image's sitecustomize imports jax at interpreter start and
registers the remote `axon` TPU backend, so env vars set here are too late —
we must override via jax.config before the first backend use. XLA_FLAGS is
read lazily at CPU-client creation, so setting it here still works.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
