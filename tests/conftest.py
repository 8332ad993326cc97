"""Test harness: force an 8-device virtual CPU backend so sharding/collective
code paths run without TPU hardware (the fake-backend substitute for a pod,
per SURVEY.md §4)."""

import os

# force-override: the environment pins JAX_PLATFORMS=axon (the tunneled TPU)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# sitecustomize may have initialized the axon backend before pytest imported
# this conftest; make sure the cpu platform wins
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
