import os
import sys

# Tests run on a virtual 8-device CPU mesh so sharding logic is exercised
# without TPU hardware; set before any jax import.
# force CPU: the session env pins JAX_PLATFORMS=axon (the remote TPU
# tunnel), which makes unit tests slow and flaky — tests always run on a
# virtual multi-device CPU backend
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
