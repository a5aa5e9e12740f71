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

# NOTE: no persistent compilation cache here — Mosaic custom-call payloads
# are not reliably part of the cache key on this stack, and a stale cached
# kernel binary surfaces as "TPU backend error (Internal)" at runtime after
# kernel code changes. Kernel compiles are ~2 s, so caching buys little.
import jax

REFERENCE_DIR = "/root/reference"


def reference_path(*parts):
    return os.path.join(REFERENCE_DIR, *parts)
