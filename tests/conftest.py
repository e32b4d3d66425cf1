"""Test harness config: run JAX on a virtual 8-device CPU mesh.

This mirrors the driver's multi-chip dry-run environment
(xla_force_host_platform_device_count) so sharding tests exercise real
collectives without TPU hardware.

Note: this container's sitecustomize pre-imports jax with JAX_PLATFORMS=axon
(a remote TPU tunnel). The backend is not initialized until first use, so
forcing the env + jax.config here (before any test touches a device) reliably
pins tests to the local CPU backend.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# Tests (and every subprocess they spawn) are CPU-only: drop the container's
# TPU-tunnel hook so child interpreters don't register the remote PJRT plugin
# at startup — registration can block on the single-chip grant held by
# another process (this exact deadlock made the CLI e2e test time out in
# rounds 2/3: the train subprocess waited on the grant, not on compiles).
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent XLA-executable cache: the fast lane is dominated by CPU jit
# compiles of tiny test shapes; caching them across runs cuts repeat lane
# wall-clock by ~5x (first/cold run still compiles).
_cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_tests"
)
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass  # older jax: cache is an optimization only

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8, f"expected 8 virtual CPU devices, got {len(jax.devices())}"
