"""Per-phase cost attribution for the POA Pallas kernel on the real chip.

Strategy: time kernel variants with phases disabled (via a PHASES bitmask
baked statically into the kernel) on the bench workload shape. Phases feed
each other, so disabled-phase variants are approximations (graph stops
growing without add-alignment), but deltas still rank the phases.

Bit 0: NW row sweep
Bit 1: traceback walk
Bit 2: add-alignment
Bit 3: topological sort
Bit 4: consensus
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def make_windows(B, S, Lb, seed=0):
    from genomeworks_tpu.simulators.genomesim import (
        generate_random_genome,
        mutate_sequence,
    )

    rng = np.random.default_rng(seed)
    windows = []
    for _ in range(B):
        t = generate_random_genome(Lb, rng)
        windows.append([t] + [mutate_sequence(t, rng, 0.03, 0.03) for _ in range(S - 1)])
    return windows


def run(phases, B=64, S=8, Lb=250, iters=3):
    import jax.numpy as jnp
    import genomeworks_tpu.ops.poa_pallas as pp
    from genomeworks_tpu.poa.jax_poa import _pack_windows, _pallas_poa_plan

    windows = make_windows(B, S, Lb)
    S_, L, N, E_k, G = _pallas_poa_plan(windows, None, 50, 50, False,
                                        unit_w=True)
    if B % G:
        windows = windows + windows[: G - B % G]
        B = len(windows)
    seqs, wts, lens, nseqs = _pack_windows(windows, None, S_, L)
    args = (jnp.asarray(seqs.astype(np.uint8)), jnp.ones((1, 1, 1), jnp.int32),
            jnp.asarray(lens), jnp.asarray(nseqs))
    kw = dict(S=S_, L=L, N=N, E=E_k, A=min(50, E_k), phases=phases,
              windows_per_step=G)
    out = pp.poa_consensus_pallas(*args, **kw)
    np.asarray(out[0])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = pp.poa_consensus_pallas(*args, **kw)
        np.asarray(out[0])
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    return dt / B * 1e3, (S_, L, N, E_k, G)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    full, plan = run(0b11111, B=B)
    print(f"plan S,L,N,E = {plan}")
    print(f"full pipeline:        {full:8.3f} ms/window")
    for name, mask in [
        ("no consensus", 0b01111),
        ("no topsort", 0b10111),
        ("no add-align", 0b11011),
        ("no traceback+add", 0b11001),
        ("NW only", 0b00001),
        ("nothing (overhead)", 0b00000),
    ]:
        t, _ = run(mask, B=B)
        print(f"{name:22s}{t:8.3f} ms/window  (delta {full - t:+.3f})")


if __name__ == "__main__":
    main()
