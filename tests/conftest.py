import os

# Force the CPU platform with 8 virtual devices for all tests: multi-chip
# sharding paths are validated on a virtual mesh, and single-device math
# tests are CPU-exact. NOTE: the environment pre-sets JAX_PLATFORMS=axon
# (tunneled TPU), and pytest imports jax before this conftest via a plugin,
# so we must go through jax.config (env vars alone are already baked in).
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except AttributeError:  # older jax: fall back to XLA flag
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()
