"""Myers bit-vector edit distance.

Reference: cudaaligner/src/myers_cpu.hpp (CPU oracle) and myers_gpu.cu
(warp-cooperative PV/MV word chains). The bit-parallel recurrence packs 32
DP cells per machine word, advancing one target character per step with a
carry rippling across the query's word blocks (myers_advance_block,
myers_cpu.hpp:36-66).

Two implementations:
- ``myers_edit_distance_cpu``: NumPy port of the reference CPU oracle,
  bit-exact semantics, used as the golden reference in tests;
- ``myers_edit_distance_batched``: JAX/TPU batched variant — lane-parallel
  over the alignment batch, ``lax.scan`` over target positions, carry
  ripple as a short ``fori_loop`` over query word blocks. Edit-distance
  only (score mode); traceback paths come from the banded wavefront kernel
  (ops/banded_nw_pallas.py), mirroring the reference's split between
  score-only Myers and banded Myers with traceback.
"""

from __future__ import annotations

import functools

import numpy as np

WORD = 32


def _preprocess_peq(query: str) -> np.ndarray:
    """peq[c, w] = bitmask of query positions in word w equal to base c
    (myers_preprocess, myers_cpu.hpp:68-80). Rows indexed by 2-bit code."""
    from genomeworks_tpu.core.sequence import encode_bases

    q = encode_bases(query)
    n_words = (len(q) + WORD - 1) // WORD
    peq = np.zeros((4, n_words), dtype=np.uint32)
    for i, code in enumerate(q):
        peq[code, i // WORD] |= np.uint32(1) << np.uint32(i % WORD)
    return peq


def myers_edit_distance_cpu(target: str, query: str) -> int:
    """Edit distance via the reference's word-chain recurrence
    (myers_compute_edit_distance, myers_cpu.hpp:82-134)."""
    from genomeworks_tpu.core.sequence import encode_bases

    query_size = len(query)
    if query_size == 0:
        return len(target)
    n_words = (query_size + WORD - 1) // WORD
    peq = _preprocess_peq(query)
    t_codes = encode_bases(target)

    pv = np.full(n_words, 0xFFFFFFFF, dtype=np.uint32)
    mv = np.zeros(n_words, dtype=np.uint32)
    score = np.array(
        [min((i + 1) * WORD, query_size) for i in range(n_words)], dtype=np.int64
    )
    hmask = np.array(
        [
            np.uint32(1)
            << np.uint32(
                WORD - 1 if i < n_words - 1 else query_size - (n_words - 1) * WORD - 1
            )
            for i in range(n_words)
        ],
        dtype=np.uint32,
    )

    one = np.uint32(1)
    with np.errstate(over="ignore"):  # uint32 wraparound is the algorithm
        for tc in t_codes:
            # carry 1 = global alignment: the implicit first row is 0,1,2,...
            # (myers_gpu.cu:414-416; the reference's CPU oracle passes 0
            # there, i.e. the semi-global matching variant — we keep global
            # semantics to match the Aligner contract)
            carry = 1
            for i in range(n_words):
                eq = peq[tc, i]
                p, m = pv[i], mv[i]
                xv = eq | m
                if carry < 0:
                    eq = eq | one
                xh = (((eq & p) + p) ^ p) | eq
                ph = m | ~(xh | p)
                mh = p & xh
                carry_out = (1 if (ph & hmask[i]) else 0) - (
                    1 if (mh & hmask[i]) else 0
                )
                ph = np.uint32((int(ph) << 1) & 0xFFFFFFFF)
                mh = np.uint32((int(mh) << 1) & 0xFFFFFFFF)
                if carry < 0:
                    mh |= one
                if carry > 0:
                    ph |= one
                pv[i] = mh | ~(xv | ph)
                mv[i] = ph & xv
                carry = carry_out
                score[i] += carry
    return int(score[-1])


@functools.partial(
    __import__("jax").jit, static_argnames=("n_words", "t_steps")
)
def _myers_scan(peq, t_codes, qlen, tlen, n_words: int, t_steps: int):
    import jax
    import jax.numpy as jnp

    B = peq.shape[0]
    one = jnp.uint32(1)
    full = jnp.uint32(0xFFFFFFFF)

    # per-word high-bit masks and active-word counts derived from qlen
    w_idx = jnp.arange(n_words)
    last_word = jnp.maximum((qlen - 1) // WORD, 0)  # (B,)
    hbit = jnp.where(
        w_idx[None, :] < last_word[:, None],
        WORD - 1,
        jnp.clip(qlen[:, None] - 1 - last_word[:, None] * WORD, 0, WORD - 1),
    )
    hmask = one << hbit.astype(jnp.uint32)  # (B, n_words)
    active = w_idx[None, :] <= last_word[:, None]

    pv0 = jnp.full((B, n_words), full, jnp.uint32)
    mv0 = jnp.zeros((B, n_words), jnp.uint32)
    # only the final word's running score is the edit distance
    # (myers_cpu.hpp:131 returns score.back())
    score0 = qlen.astype(jnp.int32)

    def step(carry, t):
        pv, mv, score = carry
        tc = t_codes[:, t]  # (B,)
        # eq words for this target char: gather row tc from peq (B, 4, W)
        eq_all = jnp.take_along_axis(peq, tc[:, None, None], axis=1)[:, 0, :]

        def word_body(i, c):
            pv, mv, score, cin = c
            eq = eq_all[:, i]
            p = pv[:, i]
            m = mv[:, i]
            xv = eq | m
            eq = jnp.where(cin < 0, eq | one, eq)
            xh = (((eq & p) + p) ^ p) | eq
            ph = m | ~(xh | p)
            mh = p & xh
            hm = hmask[:, i]
            cout = ((ph & hm) != 0).astype(jnp.int32) - ((mh & hm) != 0).astype(
                jnp.int32
            )
            ph = ph << 1
            mh = mh << 1
            mh = jnp.where(cin < 0, mh | one, mh)
            ph = jnp.where(cin > 0, ph | one, ph)
            act = active[:, i] & (t < tlen)
            pv = pv.at[:, i].set(jnp.where(act, mh | ~(xv | ph), p))
            mv = mv.at[:, i].set(jnp.where(act, ph & xv, m))
            score = score + jnp.where(act & (i == last_word), cout, 0)
            cout = jnp.where(act, cout, cin * 0)
            return pv, mv, score, cout

        # initial carry 1: global-alignment top boundary (myers_gpu.cu:416)
        pv, mv, score, _ = jax.lax.fori_loop(
            0, n_words, word_body, (pv, mv, score, jnp.ones(B, jnp.int32))
        )
        return (pv, mv, score), None

    (pv, mv, score), _ = jax.lax.scan(
        step, (pv0, mv0, score0), jnp.arange(t_steps)
    )
    return score


def myers_edit_distance_batched(queries: list[str], targets: list[str]) -> np.ndarray:
    """Batched bit-parallel edit distances on TPU. Returns (B,) int32."""
    import jax.numpy as jnp

    from genomeworks_tpu.core.sequence import pack_reads

    B = len(queries)
    assert len(targets) == B
    qmax = max((len(q) for q in queries), default=1)
    tmax = max((len(t) for t in targets), default=1)
    n_words = max(1, (qmax + WORD - 1) // WORD)

    peq = np.zeros((B, 4, n_words), dtype=np.uint32)
    qlen = np.zeros(B, dtype=np.int32)
    for b, q in enumerate(queries):
        p = _preprocess_peq(q) if q else np.zeros((4, 1), np.uint32)
        peq[b, :, : p.shape[1]] = p
        qlen[b] = len(q)
    t_codes, tlen = pack_reads(list(targets), max_len=tmax)

    out = _myers_scan(
        jnp.asarray(peq), jnp.asarray(t_codes.astype(np.int32)),
        jnp.asarray(qlen), jnp.asarray(tlen),
        n_words=n_words, t_steps=tmax,
    )
    dist = np.array(out)
    # empty-query convention (myers_cpu.hpp:88-89)
    for b, q in enumerate(queries):
        if len(q) == 0:
            dist[b] = len(targets[b])
    return dist
