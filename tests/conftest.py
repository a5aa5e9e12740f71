"""Test configuration: two tiers.

Default tier — run on whatever backend the environment provides. On the
TPU box that is the real chip (the axon PJRT plugin force-registers via
sitecustomize and overrides JAX_PLATFORMS), so the default suite compiles
and executes the Pallas kernels for real — the reference's analogue is
its GPU-only CI tier (ci/gpu/build.sh). On a chipless machine jax falls
back to CPU and kernel wrappers auto-select interpret/XLA paths.

CPU tier — ``GW_TEST_CPU=1 pytest``: force the CPU backend (the only
override that works here is ``jax.config.update("jax_platforms")`` after
import; env vars are ignored by the plugin). Fast for logic tests; tests
marked ``tpu`` (kernel-compile coverage) are skipped automatically
whenever the backend is CPU.

Multi-device meshes: the axon tunnel exposes one chip, so mesh tests run
in a subprocess with PYTHONPATH stripped (drops the sitecustomize) +
JAX_PLATFORMS=cpu + xla_force_host_platform_device_count=8 — see
tests/test_sharded.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("GW_TEST_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache (also enabled package-wide in
# genomeworks_tpu/__init__.py). Safe for the Pallas kernels because each
# bakes a source-version tag into the kernel program (the cache key does
# not cover Mosaic custom-call payloads by itself — a stale cached kernel
# binary crashes with "TPU backend error (Internal)").
jax.config.update("jax_compilation_cache_dir", "/tmp/gw_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


def reference_path(*parts):
    return os.path.join(REFERENCE_DIR, *parts)


def mesh_subprocess_env(n_devices: int = 8) -> dict:
    """Env for a child process with a real n-device virtual CPU mesh."""
    env = dict(os.environ)
    env["PYTHONPATH"] = ""  # drop the axon sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    return env


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: needs a real TPU backend (auto-skipped when the backend is CPU)",
    )


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() != "cpu":
        return
    skip_tpu = pytest.mark.skip(reason="needs a real TPU backend")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip_tpu)
