"""Bisect the remaining banded-kernel compiled-only divergence
(test_banded_kernel_parity_tpu_scale): find which windows differ and
whether interpret mode agrees with the host chain on them."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from genomeworks_tpu.poa.cpu_reference import poa_consensus
from genomeworks_tpu.poa.jax_poa import poa_batch_consensus_banded
from genomeworks_tpu.simulators.genomesim import (
    generate_random_genome,
    mutate_sequence,
)


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


def _host_banded(w, band_width):
    try:
        c, v = poa_consensus(
            w, None, -8, -6, 8, None, band_mode="static_band",
            band_width=band_width,
        )
        return c, v, 0
    except Exception:
        return None


def main():
    windows = _windows(48, 100, 250, 8, seed=5)
    cons, cov, st = poa_batch_consensus_banded(
        windows, band_width=256, use_pallas=True
    )
    bad = []
    for b, w in enumerate(windows):
        ref = _host_banded(w, 256)
        if ref is None:
            continue
        if st[b] != ref[2] or (st[b] == 0 and cons[b] != ref[0]):
            bad.append(b)
            print(f"window {b}: st {st[b]} vs {ref[2]}; "
                  f"cons match={st[b] == 0 and cons[b] == ref[0]}")
    print("bad:", bad)
    if bad:
        sub = [windows[bad[0]]]
        c2, v2, s2 = poa_batch_consensus_banded(
            sub, band_width=256, use_pallas=True
        )
        ref = _host_banded(sub[0], 256)
        print("alone:", s2[0], ref[2], c2[0] == ref[0])
        import jax

        with jax.disable_jit(False):
            import genomeworks_tpu.ops.poa_pallas as pp  # noqa
        # interpret-mode comparison
        import genomeworks_tpu.poa.jax_poa as jp

        orig = jp.poa_consensus_pallas

        def interp(*a, **k):
            k["interpret"] = True
            return orig(*a, **k)

        jp.poa_consensus_pallas = interp
        try:
            c3, v3, s3 = poa_batch_consensus_banded(
                sub, band_width=256, use_pallas=True
            )
        finally:
            jp.poa_consensus_pallas = orig
        print("interp:", s3[0], c3[0] == ref[0])


if __name__ == "__main__":
    main()
