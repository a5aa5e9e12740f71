"""ctypes binding to the native scalar CPU POA baseline
(native/spoa_cpu.cpp) — the honest single-core "CPU SPOA" reference the
benchmark compares the TPU kernel against. Bit-identical to
cpu_reference.poa_consensus with unit weights (tests/test_native_spoa.py).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libgwspoa.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR), "libgwspoa.so"],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.gw_spoa_consensus.restype = ctypes.c_int32
    lib.gw_spoa_consensus.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def poa_consensus_native(
    window: list[str], gap: int = -8, mismatch: int = -6, match: int = 8
) -> tuple[str, np.ndarray]:
    """Consensus + coverage of one window via the native baseline."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native baseline not built")
    blob = "".join(window).encode("latin1")
    lens = (ctypes.c_int32 * len(window))(*[len(s) for s in window])
    cap = 4 * max(len(s) for s in window) + 16
    cons = ctypes.create_string_buffer(cap)
    cov = (ctypes.c_int32 * cap)()
    rc = lib.gw_spoa_consensus(
        blob, lens, len(window), gap, mismatch, match, cons, cov, cap
    )
    if rc < 0:
        raise RuntimeError(f"native POA failed: status {-rc}")
    return cons.raw[:rc].decode("latin1"), np.ctypeslib.as_array(cov)[:rc].copy()
