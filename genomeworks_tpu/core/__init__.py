"""Core runtime: types, logging, bucketing, sequence encoding.

Reference: GenomeWorks ``common/base`` (lib gwbase).
"""

from genomeworks_tpu.core.types import (
    read_id_t,
    position_in_read_t,
    representation_t,
)
from genomeworks_tpu.core.sequence import (
    encode_bases,
    decode_bases,
    reverse_complement,
    BASE_TO_CODE,
    CODE_TO_BASE,
)
from genomeworks_tpu.core.bucketing import (
    pad_to_multiple,
    bucket_by_length,
    Bucket,
)
from genomeworks_tpu.core.logging import (
    LogLevel,
    initialize_logger,
    log_critical,
    log_error,
    log_warn,
    log_info,
    log_debug,
)
from genomeworks_tpu.core.graph import Graph, DirectedGraph, UndirectedGraph
from genomeworks_tpu.core.device import (
    DeviceInfo,
    DeviceRuntimeError,
    get_device_count,
    get_devices,
    get_device_memory_info,
)
