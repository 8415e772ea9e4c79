"""Test configuration: force CPU backend with 8 virtual devices so that
multi-chip sharding tests run anywhere (the same way MPI users test with
`mpirun -np N` on one box — SURVEY.md §4)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
