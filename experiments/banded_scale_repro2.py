"""Find the diverging windows in test_banded_kernel_parity_tpu_scale."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from genomeworks_tpu.poa.jax_poa import poa_batch_consensus_banded
from genomeworks_tpu.simulators.genomesim import (
    generate_random_genome,
    mutate_sequence,
)
from genomeworks_tpu.poa.cpu_reference import poa_consensus


def poa_consensus_banded(w, bw):
    try:
        c, v = poa_consensus(w, None, -8, -6, 8, None,
                             band_mode="static_band", band_width=bw)
        return c, v, 0
    except Exception:
        return None


def _windows(n, lo, hi, smax, seed):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        t = generate_random_genome(int(rng.integers(lo, hi)), rng)
        k = int(rng.integers(1, smax))
        out.append(
            [t] + [mutate_sequence(t, rng, 0.08, 0.08) for _ in range(k)]
        )
    return out


windows = _windows(48, 100, 250, 8, seed=5)
cons, cov, st = poa_batch_consensus_banded(windows, band_width=256, use_pallas=True)
bad = []
for b, w in enumerate(windows):
    try:
        ref = poa_consensus_banded(w, 256)
    except Exception:
        continue
    if ref is None:
        continue
    if st[b] != ref[2] or (st[b] == 0 and (cons[b] != ref[0] or list(cov[b]) != list(ref[1]))):
        bad.append(b)
print("bad:", bad)
for b in bad[:3]:
    ref = poa_consensus_banded(windows[b], 256)
    print(f"-- window {b}: st={st[b]} ref_st={ref[2]}")
    if st[b] == 0 and ref[2] == 0:
        c1, c2 = cons[b], ref[0]
        print("   len", len(c1), len(c2))
        for i, (a, x) in enumerate(zip(c1, c2)):
            if a != x:
                print("   first diff at", i, a, x)
                break
