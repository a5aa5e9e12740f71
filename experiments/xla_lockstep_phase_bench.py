"""Per-phase cost of the XLA lockstep POA chain on the real chip.

Round-4 design probe: if some phases of the existing (parity-tested)
XLA lockstep implementation are already fast, only the slow phases need
new Pallas lockstep kernels."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def make_windows(B, S, Lb, seed=0):
    from genomeworks_tpu.simulators.genomesim import (
        generate_random_genome, mutate_sequence,
    )
    rng = np.random.default_rng(seed)
    windows = []
    for _ in range(B):
        t = generate_random_genome(Lb, rng)
        windows.append([t] + [mutate_sequence(t, rng, 0.03, 0.03) for _ in range(S - 1)])
    return windows


def t(f, *a, iters=5):
    out = f(*a)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = f(*a)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    S, Lb = 8, 250
    from genomeworks_tpu.poa import jax_poa as jp
    windows = make_windows(B, S, Lb)
    L = max(max(len(s) for s in w) for w in windows)
    N = min(3 * L, 512)
    seqs = np.zeros((B, S, L), np.int32)
    lens = np.zeros((B, S), np.int32)
    for b, w in enumerate(windows):
        for s, seq in enumerate(w):
            e = np.frombuffer(seq.encode(), np.uint8)
            seqs[b, s, :len(e)] = e
            lens[b, s] = len(e)
    seqs_j = jnp.asarray(seqs); lens_j = jnp.asarray(lens)
    wts = jnp.ones((B, L), jnp.int32)
    act = jnp.ones(B, bool)

    state = jp.init_graph_state(B, N, 16, 16)
    state = jp.build_backbone_batched(state, seqs_j[:, 0], lens_j[:, 0], wts, act)
    jax.block_until_ready(state["nodes"])

    # grow the graph through a few rounds first so phase costs are realistic
    for s in range(1, S):
        state, far = jp.poa_step_batched(
            state, seqs_j[:, s], lens_j[:, s], wts, act, s,
            gap=-8, mismatch=-6, match=8, max_dist=32, n_rows=N)
    jax.block_until_ready(state["nodes"])
    nfar = int(jnp.sum(far)); nerr = int(jnp.sum(state["error"] != 0))
    print(f"B={B} N={N} L={L}  far={nfar} err={nerr}")

    read = seqs_j[:, S - 1]; rl = lens_j[:, S - 1]

    nw = lambda: jp.nw_batched_fast(state, read, rl, act, gap=-8, mismatch=-6,
                                    match=8, max_dist=32, n_rows=N)
    dt, (ag, ar, k, failed, far2) = t(nw)
    print(f"nw_batched_fast:        {dt*1e3:8.2f} ms  ({dt/B*1e6:7.1f} us/win)")

    add = lambda: jp.add_alignment_batched(state, ag, ar, k, read, wts, act, None)
    dt, st2 = t(add)
    print(f"add_alignment_batched:  {dt*1e3:8.2f} ms  ({dt/B*1e6:7.1f} us/win)")

    ts_ = lambda: jp.topsort_batched(st2, act, n_rows=N)
    dt, st3 = t(ts_)
    print(f"topsort_batched:        {dt*1e3:8.2f} ms  ({dt/B*1e6:7.1f} us/win)")

    cons = lambda: jp.consensus_batched(state, act)
    dt, _ = t(cons)
    print(f"consensus_batched:      {dt*1e3:8.2f} ms  ({dt/B*1e6:7.1f} us/win)")

    step = lambda: jp.poa_step_batched(state, read, rl, wts, act, S - 1,
                                       gap=-8, mismatch=-6, match=8,
                                       max_dist=32, n_rows=N)
    dt, _ = t(step)
    full = dt * (S - 1)
    print(f"poa_step_batched:       {dt*1e3:8.2f} ms  ({dt/B*1e6:7.1f} us/win)")
    print(f"est chain ({S-1} steps + consensus): {(full)/B*1e6:7.1f} us/win -> "
          f"{B/full:8.0f} w/s (excl consensus)")


if __name__ == "__main__":
    main()
