import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths
# are exercised without TPU hardware. The axon TPU plugin ignores
# JAX_PLATFORMS, so force the platform through jax.config as well.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
