import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (mirrors the driver's dryrun environment).
#
# The container's sitecustomize registers the tunneled `axon` TPU platform
# and forces JAX_PLATFORMS=axon, so plain env-var overrides are ignored;
# jax.config.update after import is the reliable switch.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
