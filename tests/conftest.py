import os
import sys

# Tests run on a virtual 8-device CPU mesh so sharding logic is exercised
# without TPU hardware.  NOTE: the sandbox's sitecustomize imports jax at
# interpreter start with JAX_PLATFORMS=axon (the remote TPU tunnel), so
# env vars set here are too late — we must override via jax.config before
# any backend is initialized.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
