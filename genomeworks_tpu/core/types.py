"""Common scalar typedefs.

Reference: common/base/include/.../types.hpp:37-66 (read_id_t = u32,
position_in_read_t = u32) and cudamapper/include/.../types.hpp:36-95
(representation_t; the reference uses u64, we use u32 since k <= 15 packs
into 30 bits and TPUs prefer 32-bit lanes).
"""

import numpy as np

read_id_t = np.uint32
position_in_read_t = np.uint32
number_of_reads_t = np.uint32
number_of_basepairs_t = np.int32
# Minimizer representation (hashed 2-bit-packed k-mer). k is capped at 15 so
# the packed value fits 30 bits; TPU-native choice is a 32-bit lane rather
# than the reference's u64.
representation_t = np.uint32

#: Sentinel for "no value" in padded integer tensors.
INVALID_U32 = np.uint32(0xFFFFFFFF)
INVALID_I32 = np.int32(-1)
