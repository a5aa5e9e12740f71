"""Per-phase on-chip profile of the lockstep POA chain (VERDICT r5 #2).

Method: duplicate-phase marginal timing. For each phase P in {nw, tb,
add, ts, cons}, build a chain variant that runs P TWICE per round with
identical inputs (outputs tied together through a tiny elementwise max so
neither call is dead; all five pallas_calls carry has_side_effects so XLA
neither CSEs nor DCEs the duplicate). t(variant) - t(base) = the on-chip
cost of one extra execution of P per round = P's share of the chain.

Runs through the PRODUCTION driver (poa_batch_consensus_lockstep) by
monkeypatching the kernel entry points in ops.poa_lockstep_pallas —
timing reflects the shipped code path (ADVICE r4 on the older bench).

Usage: python experiments/lockstep_phase_profile.py [n_windows]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

import genomeworks_tpu.ops.poa_lockstep_pallas as lk
import genomeworks_tpu.poa.lockstep as ls

NW0, TB0, ADD0, TS0, CONS0 = (
    lk.nw_lockstep, lk.tb_lockstep, lk.add_lockstep, lk.topsort_lockstep,
    lk.consensus_lockstep,
)


def dup_nw(*a, **k):
    c1, b1, e1 = NW0(*a, **k)
    _, b2, e2 = NW0(*a, **k)
    return c1, jnp.maximum(b1, b2), jnp.maximum(e1, e2)


def dup_tb(*a, **k):
    ag, ar, kl, e1 = TB0(*a, **k)
    _, _, _, e2 = TB0(*a, **k)
    return ag, ar, kl, jnp.maximum(e1, e2)


def dup_add(*a, **k):
    p1 = ADD0(*a, **k)
    p2 = ADD0(*a, **k)
    p1 = dict(p1)
    p1["error"] = jnp.maximum(p1["error"], p2["error"])
    return p1


def dup_ts(*a, **k):
    p1 = TS0(*a, **k)
    p2 = TS0(*a, **k)
    p1 = dict(p1)
    p1["error"] = jnp.maximum(p1["error"], p2["error"])
    return p1


def dup_cons(*a, **k):
    c1, v1, l1, e1 = CONS0(*a, **k)
    _, _, _, e2 = CONS0(*a, **k)
    return c1, v1, l1, jnp.maximum(e1, e2)


def load_windows(n):
    import gzip

    windows = []
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests/data/poa_windows_covid.txt.gz")
    with gzip.open(path, "rt") as f:
        rem = 0
        for line in f:
            line = line.rstrip("\n")
            if rem == 0:
                rem = int(line)
                windows.append([])
            else:
                windows[-1].append(line)
                rem -= 1
    return windows[:n]


def timed(windows, iters=7):
    # fresh chain cache per variant (the key does not see the monkeypatch)
    ls._CHAIN_CACHE.clear()
    out = ls.poa_batch_consensus_lockstep(windows)
    assert out is not None
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        ls.poa_batch_consensus_lockstep(windows)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    windows = load_windows(n)
    if ls._CHAIN_CACHE is None:
        from collections import OrderedDict

        ls._CHAIN_CACHE = OrderedDict()

    t_base, out_base = timed(windows)
    print(f"base: {t_base*1e3:.1f} ms  ({n/t_base:.0f} w/s)", flush=True)
    results = {}
    for name, attr, dup in (
        ("nw", "nw_lockstep", dup_nw),
        ("tb", "tb_lockstep", dup_tb),
        ("add", "add_lockstep", dup_add),
        ("ts", "topsort_lockstep", dup_ts),
        ("cons", "consensus_lockstep", dup_cons),
    ):
        setattr(lk, attr, dup)
        try:
            t, out = timed(windows)
            # parity: the duplicate must not change results
            assert out[0] == out_base[0], name
            results[name] = t - t_base
            print(f"{name}: +{(t-t_base)*1e3:.1f} ms "
                  f"({100*(t-t_base)/t_base:.0f}% of base)", flush=True)
        finally:
            setattr(lk, attr, getattr(sys.modules[__name__],
                                      attr.split("_")[0].upper() + "0")
                    if False else {"nw_lockstep": NW0, "tb_lockstep": TB0,
                                   "add_lockstep": ADD0,
                                   "topsort_lockstep": TS0,
                                   "consensus_lockstep": CONS0}[attr])
    tot = sum(results.values())
    print(f"sum of phases: {tot*1e3:.1f} ms vs base {t_base*1e3:.1f} ms "
          f"(residual = host/transpose/upload)")
    for k, v in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"  {k:5s} {v*1e3:7.1f} ms  {100*v/max(tot,1e-9):4.0f}%")


if __name__ == "__main__":
    main()
