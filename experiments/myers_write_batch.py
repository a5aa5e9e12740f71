"""Is the Myers forward kernel store-bound? Compare the production kernel
against a variant that accumulates 16 rows of code slabs in registers and
writes (16, WWS, 128) blocks (16x fewer VMEM stores)."""

import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import genomeworks_tpu.ops.myers_banded_pallas as mb


def _kernel_batched(qT_ref, qlen_ref, tb0_ref, tb1_ref, val_ref, pv0_ref,
                    c0_ref, c1_ref, pv_s, mv_s, *, WWS, NW):
    mi = pl.program_id(1)
    mone = jnp.int32(-1)

    @pl.when(mi == 0)
    def _init():
        pv_s[:, :] = pv0_ref[:, :]
        mv_s[:, :] = jnp.zeros((NW, 128), jnp.int32)

    i0 = mi * mb.R_BLOCK
    qlen = qlen_ref[:, :]
    acc0, acc1 = [], []
    for r in range(mb.R_BLOCK):
        i = i0 + r + 1
        wbase = jnp.maximum(i // 32 - 1, 0)
        sl = pl.ds(wbase, WWS)
        qrow = qT_ref[pl.ds(r, 1), :]
        s0 = jnp.int32(0) - (qrow & 1)
        s1 = jnp.int32(0) - ((qrow >> 1) & 1)
        rv = jnp.int32(0) - (i <= qlen).astype(jnp.int32)
        tb0 = tb0_ref[sl, :]; tb1 = tb1_ref[sl, :]; val = val_ref[sl, :]
        pv = pv_s[sl, :]; mv = mv_s[sl, :]
        eq = (~(tb0 ^ s0)) & (~(tb1 ^ s1)) & val & rv
        xv = eq | mv
        a = eq & pv
        s = a + pv
        g = (s.astype(jnp.uint32) < a.astype(jnp.uint32)).astype(jnp.int32)
        p = (s == mone).astype(jnp.int32)
        G, P = g, p
        step = 1
        while step < WWS:
            G = G | (P & mb._shift_down(G, step))
            P = P & mb._shift_down(P, step)
            step *= 2
        s = s + mb._shift_down(G, 1)
        xh = (s ^ pv) | eq
        ph = mv | ~(xh | pv)
        mh = pv & xh
        phs = ((ph << 1) | mb._shift_down(mb._srl(ph, 31), 1, fill=1)).astype(jnp.int32)
        mhs = ((mh << 1) | mb._shift_down(mb._srl(mh, 31), 1, fill=0)).astype(jnp.int32)
        pvn = mhs | ~(xv | phs)
        mvn = phs & xv
        pv_s[sl, :] = pvn
        mv_s[sl, :] = mvn
        c1v = pvn | ph
        c0v = (ph & ~pvn) | (~pvn & ~ph & ~eq)
        acc0.append(c0v); acc1.append(c1v)
        if (r + 1) % 16 == 0:
            c0_ref[pl.ds(r - 15, 16), :, :] = jnp.stack(acc0, axis=0)
            c1_ref[pl.ds(r - 15, 16), :, :] = jnp.stack(acc1, axis=0)
            acc0, acc1 = [], []


def run(B=1024, M=2048, W=256, batched=True, iters=4):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(0, 4, (B, M)), jnp.uint8)
    t = jnp.asarray(rng.integers(0, 4, (B, M)), jnp.uint8)
    qlen = jnp.full((B,), M, jnp.int32); tlen = jnp.full((B,), M, jnp.int32)
    if batched:
        orig = mb._kernel
        mb._kernel = _kernel_batched
    orig_repack = mb._repack_rowmajor
    mb._repack_rowmajor = lambda c0, c1, M_, W_, WWS: c0  # forward only
    try:
        fwd = jax.jit(functools.partial(
            mb.myers_banded_forward_pallas.__wrapped__, band_width=W, interpret=False))
        c, f = fwd(q, t, qlen, tlen)
        _ = np.asarray(c[0, 0, :1])
        ts = []
        for _i in range(iters):
            t0 = time.perf_counter(); c, f = fwd(q, t, qlen, tlen)
            _ = np.asarray(c[0, 0, :1]); ts.append(time.perf_counter()-t0)
        dt = float(np.median(ts))
        return dt, B*M*W/dt/1e9, np.asarray(c)
    finally:
        mb._repack_rowmajor = orig_repack
        if batched:
            mb._kernel = orig


if __name__ == "__main__":
    dt0, g0, cref = run(batched=False)
    print("per-row stores:   %.1f ms  %.1f Gcells/s" % (dt0*1e3, g0), flush=True)
    dt1, g1, cbat = run(batched=True)
    print("batched stores:   %.1f ms  %.1f Gcells/s" % (dt1*1e3, g1), flush=True)
    print("outputs equal:", bool((cref == cbat).all()), flush=True)
