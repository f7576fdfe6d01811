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
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# The 8 virtual devices are threads on (here) ONE physical core; under
# external load a device thread can miss XLA:CPU's default collective
# rendezvous deadline, which ABORTS the whole process (observed as a flaky
# SIGABRT in mesh tests when a training/probe client runs concurrently).
# Raise the stuck-detection and terminate deadlines far past any plausible
# scheduling delay — a genuinely deadlocked collective still terminates.
if "collective_call_terminate" not in _flags:
    _flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
        " --xla_cpu_collective_call_terminate_timeout_seconds=600"
    )
os.environ["XLA_FLAGS"] = _flags

# Repo root on sys.path so `import bbocr_tpu` works without installation.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The machine's axon sitecustomize registers the tunneled TPU and pins
# jax.config jax_platforms to "axon,cpu" (overriding the env var), so force
# the config back to CPU explicitly.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
