"""Test environment: force CPU backend with 8 virtual devices so multi-chip
sharding tests run without TPUs (SURVEY.md §4 test-strategy note).

Note: the axon sitecustomize calls jax.config.update("jax_platforms",
"axon,cpu") at interpreter start, overriding the JAX_PLATFORMS env var — we
must override the config again (before any backend initialization)."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# Default matmul precision lowers f32 contractions to bf16 passes; tests
# compare against fp64 oracles, so force full fp32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8, (
    "tests expect 8 virtual CPU devices; got %d" % len(jax.devices())
)
