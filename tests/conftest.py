"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's implied strategy — multi-device (pjit/sharding) paths
are exercised without TPUs via ``xla_force_host_platform_device_count``.
Must set env vars before the first ``import jax`` anywhere in the test run.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

# The axon TPU plugin ignores the JAX_PLATFORMS env var set above; force the
# CPU backend through the config API before any backend is initialized.
import jax

jax.config.update("jax_platforms", "cpu")
