"""Test configuration: force an 8-device virtual CPU mesh so sharding and
kernel logic run everywhere (the reference's analogue is building CPU-only
with tests gated to GPU CI; we instead make every test runnable hostside).
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compilation cache. Safe for the Pallas kernels because
# ops/poa_pallas.py bakes a source-version tag into the kernel program
# (the cache key does not cover Mosaic custom-call payloads by itself —
# a stale cached kernel binary crashes with "TPU backend error (Internal)").
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/gw_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REFERENCE_DIR = "/root/reference"


def reference_path(*parts):
    return os.path.join(REFERENCE_DIR, *parts)
