"""Microbenchmarks that decide the device-mapper design:

(a) tunnel H2D / D2H bandwidth (how bad is shipping anchor arrays?)
(b) 1D gather x[idx] throughput at matcher scale (expansion via gather
    vs via merge-sort+carry)
(c) lax.sort throughput at anchor scale (the cost unit of the
    sort-compaction style used by device_overlapper)

Run on the real chip. Marginal cost measured by varying the trip count
inside one jit call where possible (the tunnel's fixed dispatch cost is
~31-35 ms per call).
"""

import time
import functools

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    return np.asarray(x).ravel()[:1]


def timeit(f, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def bw_probe():
    for mb in (1, 16, 64):
        host = np.random.default_rng(0).integers(0, 255, mb << 20, np.uint8)
        t = timeit(lambda: jnp.asarray(host).block_until_ready(), 3)
        dev = jnp.asarray(host)
        sync(dev)
        t2 = timeit(lambda: np.asarray(dev), 3)
        print(f"H2D {mb} MB: {t*1e3:.1f} ms ({mb/t:.0f} MB/s)   "
              f"D2H: {t2*1e3:.1f} ms ({mb/t2:.0f} MB/s)")


@functools.partial(jax.jit, static_argnames=("iters",))
def gather_loop(x, idx, iters):
    def body(i, acc):
        return acc + x[(idx + i) % x.shape[0]]
    return jax.lax.fori_loop(0, iters, body, jnp.zeros_like(idx))


def gather_probe():
    rng = np.random.default_rng(0)
    for n_src, n_idx in ((1 << 20, 1 << 22), (1 << 17, 1 << 20)):
        x = jnp.asarray(rng.integers(0, 1 << 30, n_src, np.int32))
        idx = jnp.asarray(rng.integers(0, n_src, n_idx, np.int32))
        idx_mono = jnp.sort(idx)
        for name, ix in (("rand", idx), ("mono", idx_mono)):
            sync(gather_loop(x, ix, 1))
            sync(gather_loop(x, ix, 9))
            t1 = timeit(lambda: sync(gather_loop(x, ix, 1)))
            t9 = timeit(lambda: sync(gather_loop(x, ix, 9)))
            per = (t9 - t1) / 8
            print(f"gather {name} src={n_src} idx={n_idx}: "
                  f"{per*1e3:.2f} ms/gather ({n_idx/per/1e6:.0f} Melem/s)")


@functools.partial(jax.jit, static_argnames=("iters", "nkeys"))
def sort_loop(arrs, iters, nkeys):
    def body(i, a):
        out = jax.lax.sort(tuple(x + i for x in a), num_keys=nkeys)
        return tuple(out)
    return jax.lax.fori_loop(0, iters, body, tuple(arrs))


def sort_probe():
    rng = np.random.default_rng(0)
    for n in (1 << 20, 1 << 22):
        arrs = [jnp.asarray(rng.integers(0, 1 << 30, n, np.int32))
                for _ in range(6)]
        for nk in (1, 2):
            sync(sort_loop(arrs, 1, nk)[0])
            t1 = timeit(lambda: sync(sort_loop(arrs, 1, nk)[0]), 3)
            t3 = timeit(lambda: sync(sort_loop(arrs, 3, nk)[0]), 3)
            per = (t3 - t1) / 2
            print(f"sort n={n} 6 arrays nkeys={nk}: {per*1e3:.1f} ms/sort")


def scan_probe():
    # associative_scan cost at anchor scale (the chaining primitive)
    rng = np.random.default_rng(0)
    n = 1 << 22
    flag = jnp.asarray(rng.integers(0, 2, n).astype(bool))
    vals = jnp.asarray(rng.integers(0, 1 << 30, n, np.int32))

    @jax.jit
    def one(flag, vals):
        def comb(a, b):
            return (a[0] | b[0], jnp.where(b[0], b[1], a[1]))
        return jax.lax.associative_scan(comb, (flag, vals))[1]

    sync(one(flag, vals))
    t = timeit(lambda: sync(one(flag, vals)))
    print(f"assoc_scan carry n={n}: {t*1e3:.1f} ms (incl dispatch)")


if __name__ == "__main__":
    print(jax.devices())
    bw_probe()
    gather_probe()
    sort_probe()
    scan_probe()
