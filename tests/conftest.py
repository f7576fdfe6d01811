"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so that multi-chip
sharding (mesh/pjit/shard_map paths) can be exercised without TPU hardware.
Must run before the first `import jax` anywhere in the test session.
"""

import os
import sys

# Force CPU: the surrounding environment pins JAX_PLATFORMS=axon (the real
# tunneled TPU), which tests must not grab.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Repo root on sys.path so `import bbocr_tpu` works without installation.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The machine's axon sitecustomize registers the tunneled TPU and pins
# jax.config jax_platforms to "axon,cpu" (overriding the env var), so force
# the config back to CPU explicitly.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
