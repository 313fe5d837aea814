import os

# Force a deterministic 8-device virtual CPU platform for all tests: the
# multi-chip sharding paths are validated on a virtual mesh (the driver
# separately dry-runs them), and single-device math tests are CPU-exact.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
