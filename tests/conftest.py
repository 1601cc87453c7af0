import os

# Force CPU with 8 virtual devices so multi-chip sharding logic is exercised
# without TPU hardware (same trick as the driver's dryrun).
os.environ["JAX_PLATFORMS"] = "cpu"
# persistent compilation cache makes repeated suite runs much faster;
# repo-local so it survives /tmp resets between sessions
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".cache", "jax_cpu"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

# the axon TPU plugin ignores JAX_PLATFORMS from the environment; force CPU
jax.config.update("jax_platforms", "cpu")
assert jax.device_count() == 8, "tests expect the 8-device virtual CPU mesh"
