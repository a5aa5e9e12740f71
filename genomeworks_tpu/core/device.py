"""Device enumeration and memory info.

Reference: pygenomeworks/genomeworks/cuda/cuda.pyx:28-80 (CudaStream RAII,
CudaRuntimeError, device count / memory info). On TPU, streams have no
analogue (XLA dispatch is async by construction) and memory is owned by
XLA; the informational surface maps onto ``jax.devices()``.
"""

from __future__ import annotations

import dataclasses


class DeviceRuntimeError(RuntimeError):
    """Counterpart of CudaRuntimeError (cuda.pyx:27)."""


@dataclasses.dataclass
class DeviceInfo:
    id: int
    platform: str
    device_kind: str
    memory_total: int | None
    memory_available: int | None


def get_device_count() -> int:
    """cuda.pyx get_device_count."""
    import jax

    return len(jax.devices())


def get_devices() -> list[DeviceInfo]:
    import jax

    out = []
    for d in jax.devices():
        stats = {}
        try:
            stats = d.memory_stats() or {}
        except Exception:
            pass
        out.append(
            DeviceInfo(
                id=d.id,
                platform=d.platform,
                device_kind=getattr(d, "device_kind", str(d)),
                memory_total=stats.get("bytes_limit"),
                memory_available=(
                    stats.get("bytes_limit", 0) - stats.get("bytes_in_use", 0)
                    if "bytes_limit" in stats
                    else None
                ),
            )
        )
    return out


def get_device_memory_info(device_id: int = 0) -> tuple[int | None, int | None]:
    """(free, total) like cudaMemGetInfo (cuda.pyx get_device_memory_info)."""
    devices = get_devices()
    if device_id >= len(devices):
        raise DeviceRuntimeError(f"no device with id {device_id}")
    d = devices[device_id]
    return d.memory_available, d.memory_total
