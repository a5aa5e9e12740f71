"""Quick parity check of the G-fused kernel vs cpu_reference.

Runs interpret-mode on CPU (fast trace, no tunnel) across G in {1,2,4}
including ragged windows (different lengths / seq counts) and padding.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")

import numpy as np
import jax.numpy as jnp


def make_windows(B, Smax, Lb, seed=0):
    from genomeworks_tpu.simulators.genomesim import (
        generate_random_genome,
        mutate_sequence,
    )

    rng = np.random.default_rng(seed)
    windows = []
    for b in range(B):
        t = generate_random_genome(Lb - (b * 7) % 23, rng)
        n = 2 + (b % (Smax - 1))
        windows.append(
            [t] + [mutate_sequence(t, rng, 0.05, 0.05) for _ in range(n - 1)]
        )
    return windows


def main():
    from genomeworks_tpu.ops.poa_pallas import poa_consensus_pallas
    from genomeworks_tpu.poa.jax_poa import _pack_windows
    from genomeworks_tpu.poa.cpu_reference import poa_consensus

    windows = make_windows(8, 6, 60)
    S, L = 6, 96
    N, E, A = 3 * L, 50, 50
    seqs, wts, lens, nseqs = _pack_windows(windows, None, S, L)

    expected = [poa_consensus(w) for w in windows]

    for G in (1, 2, 4):
        cons, cov, length, err = poa_consensus_pallas(
            jnp.asarray(seqs), jnp.asarray(wts), jnp.asarray(lens),
            jnp.asarray(nseqs),
            S=S, L=L, N=N, E=E, A=A, interpret=True, windows_per_step=G,
        )
        cons, cov, length, err = map(np.asarray, (cons, cov, length, err))
        for b, w in enumerate(windows):
            exp_c, exp_cov = expected[b]
            assert err[b] == 0, (G, b, err[b])
            k = int(length[b])
            got = bytes(cons[b, :k][::-1].astype(np.uint8)).decode("latin1")
            assert got == exp_c, (G, b, got, exp_c)
            assert (cov[b, :k][::-1] == exp_cov).all(), (G, b)
        print(f"G={G}: parity OK ({len(windows)} ragged windows)")

    # padded-batch path (B not a multiple of G) through the public API
    from genomeworks_tpu.poa.jax_poa import poa_batch_consensus

    cons2, cov2, st2 = poa_batch_consensus(windows[:7], use_pallas=True)
    for b in range(7):
        exp_c, exp_cov = expected[b]
        assert st2[b] == 0 and cons2[b] == exp_c, b
        assert (cov2[b] == exp_cov).all(), b
    print("padded poa_batch_consensus: parity OK")

    # MSA path (G=1)
    from genomeworks_tpu.poa.jax_poa import poa_batch_msa
    from genomeworks_tpu.poa.cpu_reference import poa_msa

    msa, st = poa_batch_msa(windows[:3], use_pallas=True)
    for b in range(3):
        exp_msa = poa_msa(windows[b])
        assert st[b] == 0 and msa[b] == exp_msa, (b, msa[b], exp_msa)
    print("MSA path: parity OK")


if __name__ == "__main__":
    main()
