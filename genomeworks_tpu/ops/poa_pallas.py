"""Pallas TPU kernel: the full POA chain, G windows per grid step.

This is the TPU realization of the reference's generatePOAKernel design
(cudapoa/src/cudapoa_kernels.cuh:78 — one warp per window, graph + DP
state near the compute units). XLA's lockstep-batch formulation loses to
two platform facts measured on v5e: batched per-window row gathers lower
to one-hot contractions, and scatter updates of graph arrays serialize
per element. Inside a Pallas program both become addressed loads/stores.

v4 fuses G windows into one grid step. Measured motivation (v5e):
- a vector op on (G, Lp) costs the same as on (1, Lp) for G <= 8 (both
  occupy the same number of (8, 128) VREG tiles), so the NW row sweep
  scales ~G x for free;
- the scalar phases (traceback walk, add-alignment, topological sort)
  are dependency-latency bound (~8 ns per dependent SMEM load, ~11 ns
  loop overhead); interleaving G independent windows' chains inside one
  loop iteration pipelines them.
All per-window lockstep divergence is handled branchlessly: inactive
windows write to per-window scrap slots (index N of their own region),
the same trick the reference's warp-uniform code uses for lane masking.

Memory placement is chosen from measured access latencies:
- graph state (node fields, edge/alignment lists), topological order, the
  alignment walk, and the consensus pass are POINTER-CHASING scalar code —
  they live entirely in SMEM, where a dependent scalar load costs ~3 ns
  (vs ~44 ns for a dynamic-sublane VMEM load + reduce);
- the NW score/code matrices are vector data — they live in VMEM, with
  the row sweep lane-parallel on the VPU and the in-row horizontal
  closure computed as a logarithmic prefix-max over m = row - j*gap;
- the traceback-start finder extracts column rl of the score matrix with
  one vector reduce per window, then DMAs the column to SMEM so the
  argmax over sink rows is a 3 ns/load scalar scan (the per-row masked
  vector reduce it replaces measured ~0.35 ms/window);
- sequences are passed twice: a VMEM copy feeding the vector NW rows and
  an SMEM copy for scalar per-base access during the graph walk.

Semantics are bit-identical to genomeworks_tpu.poa.cpu_reference (the
full_band mode of the reference chain): NW per cudapoa_nw.cuh with the
reference's traceback re-derivation priority (diagonal < vertical by edge
order, then horizontal), add-alignment per cudapoa_add_alignment.cuh,
topological sort per cudapoa_topsort.cuh:46, consensus per
cudapoa_generate_consensus.cuh.

Error codes in ``err`` match jax_poa's internal codes: 0 ok, 1 node-count
overflow, 2 edge/alignment-count overflow, 3 NW traceback failure.
Windows with nseqs == 0 (grid padding) report err = 1 and are skipped.

Round-3 perf state (bench shape, G=8, marginal per window): NW ~0.26 ms,
traceback ~0.10, add-alignment + topsort ~0.36, consensus ~0.04. The
scalar phases are issue-bound on the scalar unit (~40 interleaved ops
per walk step x G); measured non-levers: 2-step loop unrolling (~6%),
fixed- vs dynamic-row VMEM stores (nil), G beyond 8 (SMEM-capped). The
next big lever is architectural: lockstep-vectorizing the add/topsort
walks across O(128) windows with graph state as VMEM planes and one-hot
gather/scatter (per chase step: ~200 VPU cycles for 128 windows vs ~40
scalar cycles per window today) — a different kernel, not a tweak.

MSA mode currently requires G == 1 (the racon-exact DFS is a per-window
stack walk; fusing it is a planned follow-up).
"""

from __future__ import annotations

import functools
import zlib

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(1 << 30)

# Source-version tag baked into the kernel program: the persistent XLA
# compilation cache does not key on the Mosaic custom-call payload, so two
# versions of this file can otherwise collide on one cache entry (the stale
# binary crashes with "TPU backend error (Internal)"). Embedding the tag in
# the kernel body forces a distinct cache key per source version.
with open(__file__, "rb") as _f:
    _SRC_TAG = zlib.crc32(_f.read()) & 0x7FFFFFFF


def _roundup(x, m):
    return ((x + m - 1) // m) * m


def _pow2_lanes(w):
    """Next 128*2^k >= w.

    Dynamic-shift ``pltpu.roll`` is MISCOMPILED on v5e for vector widths
    whose vreg count is not a power of two (measured: widths 384/640/768/
    1536 lanes return the rotation off by one vreg for every nonzero
    shift; 128/256/512/1024 are correct). Every buffer the banded NW
    realigns with a dynamic roll is therefore padded to a power-of-two
    lane count; wrapped-in pad lanes are always masked by the band
    validity guards."""
    p = 128
    while p < w:
        p *= 2
    return p


# -- exact IEEE f32 division (scalar, in-kernel) --------------------------
#
# The TPU VPU lowers f32 division to a reciprocal approximation that is
# 1 ulp off the IEEE result for ~34% of small-integer rationals (measured
# on v5e); the banded POA band gradient ``(read_len+1)/(node_count+1)``
# feeds an int truncation (``int(row * gradient)``,
# cudapoa_nw_banded.cuh:69), so a 1-ulp-high quotient shifts band starts
# and flips consensus on ~4% of windows (the r2 compiled-only banded
# divergence). Multiplies and f32->int casts are exact on the VPU
# (probed); only division needs the emulation below. Mosaic has no scalar
# bitcast, so the divider works on (mantissa, exponent) integer pairs and
# rebuilds the float through a power-of-two SMEM table (s_pow2[i] =
# 2^(i-48), filled by _fill_pow2 with exact *2.0/*0.5 chains).


def _fill_pow2(s_pow2):
    s_pow2[48] = jnp.float32(1.0)

    def down(i, p):
        p = p * jnp.float32(0.5)
        s_pow2[47 - i] = p
        return p

    jax.lax.fori_loop(0, 48, down, jnp.float32(1.0))

    def up(i, p):
        p = p * jnp.float32(2.0)
        s_pow2[49 + i] = p
        return p

    jax.lax.fori_loop(0, 15, up, jnp.float32(1.0))


def _norm24(v):
    """(mantissa in [2^23, 2^24), exponent e) with v == mantissa * 2^(e-23),
    for int32 v in [1, 2^24)."""

    def body(_, c):
        m, e = c
        lt = m < (1 << 23)
        return jnp.where(lt, m * 2, m), jnp.where(lt, e - 1, e)

    return jax.lax.fori_loop(0, 24, body, (v, jnp.int32(23)))


def _ieee_div_mants(ma, ea, mb, eb, s_pow2):
    """RN(a/b) for a = ma*2^(ea-23), b = mb*2^(eb-23), mantissas in
    [2^23, 2^24). Restoring long division, round-to-nearest-even via
    guard/sticky. Returns (f32 value, mantissa, exponent)."""
    ex = ea - eb
    small = ma < mb
    ma = jnp.where(small, ma * 2, ma)
    ex = jnp.where(small, ex - 1, ex)

    def step(_, c):
        q, r = c
        ge = r >= mb
        return q * 2 + ge.astype(jnp.int32), jnp.where(ge, r - mb, r) * 2

    # 25 quotient bits (1 implicit + 23 + guard); r < 2*mb <= 2^25 safe
    q, r = jax.lax.fori_loop(0, 25, step, (jnp.int32(0), ma))
    guard = q & 1
    sticky = (r != 0).astype(jnp.int32)
    m = (q >> 1) + (guard & (sticky | ((q >> 1) & 1)))
    # mantissa overflow on round-up: 2^24 -> 2^23, exponent += 1
    ovf = m == (1 << 24)
    m = jnp.where(ovf, jnp.int32(1 << 23), m)
    ex = jnp.where(ovf, ex + 1, ex)
    return m.astype(jnp.float32) * s_pow2[ex - 23 + 48], m, ex


def _ieee_div_ints(n, d, s_pow2):
    """RN(n/d) as f32 for int32 n, d in [1, 2^24). Returns
    (f32 value, mantissa, exponent)."""
    ma, ea = _norm24(n)
    mb, eb = _norm24(d)
    return _ieee_div_mants(ma, ea, mb, eb, s_pow2)


def _maxs(xs):
    return functools.reduce(jnp.maximum, xs)


def _anys(xs):
    return functools.reduce(jnp.logical_or, xs)


def _poa_kernel(
    # inputs
    nseqs_ref,    # SMEM (G, 1, 1)
    lens_ref,     # SMEM (G, 1, S)
    seqs_ref,     # VMEM (G, S, L) i32 (vector rows for NW)
    seqs_s_ref,   # SMEM (G, S, L//4) i32 (scalar per-base, 4 bytes/word)
    wts_s_ref,    # SMEM (G, S, L) i32 (or (G,1,1) when UNIT_W)
    # outputs
    cons_ref,     # SMEM (G, 1, C) i32 (BACKWARD order)
    cov_ref,      # SMEM (G, 1, C) i32
    clen_ref,     # SMEM (G, 1, 1) i32
    err_ref,      # SMEM (G, 1, 1) i32
    *rest,        # MSA: msa_ref SMEM (G, S, C), mlen_ref SMEM (G,1,1); then
                  # scratch (see scratch_shapes order in poa_consensus_pallas)
    S: int, L: int, N: int, E: int, A: int, C: int, Lp: int,
    gap: int, mismatch: int, match: int, MSA: bool = False, G: int = 1,
    PH: int = 0b11111, INTERP: bool = False, BAND: int = 0,
    BAND_CFG: int = 0, ADAPT: bool = False, UNIT_W: bool = False,
    DBG: int = -1, PACK_EW: bool = False,
):
    # PH: static phase bitmask for perf attribution (experiments/
    # poa_phase_profile.py). 1=NW, 2=traceback(+start finder), 4=add,
    # 8=topsort, 16=consensus. Production always runs 0b11111.
    #
    # BAND > 0: static-band NW (cudapoa_nw_banded.cuh semantics, exact to
    # poa/banded.py with adaptive=False). Score/code rows hold band slots
    # 1..BAND at lanes 0..BAND-1 (lane l = column band_start+l+1); the
    # slot-0 "merged column -1" boundary lives in SMEM (s_bnd) with its
    # traceback code in s_c0c. Predecessor rows are realigned with a
    # dynamic pltpu.roll by the band-start delta; the reference's
    # chunk-of-4 conservative edge guard is reproduced per lane.
    rest = list(rest)
    if MSA:
        msa_ref, mlen_ref = rest[:2]
        rest = rest[2:]
    if DBG >= 0:
        # debug build: dump scores/codes + the SMEM boundary column after
        # aligning sequence index DBG (compiled-vs-interpret bisection)
        dbg_sc, dbg_cd, dbg_bnd, dbg_c0 = rest[:4]
        rest = rest[4:]
    (scores, codes, colv,
     s_node, s_inc, s_outc, s_alc, s_cov,
     s_sort, s_pos, s_ocs, s_loc,
     s_csc, s_cpr,
     s_in_e, *rest2) = rest
    if PACK_EW:
        s_in_w = s_in_e  # packed into s_in_e; alias never indexed
    else:
        s_in_w, *rest2 = rest2
    (s_out_e, s_al,
     s_ag, s_ar, sm, s_colv, dma_sem, *tail) = rest2
    if MSA:
        if BAND:
            (s_next, s_begin, s_mark, s_chk, s_stack, s_col,
             s_bnd, s_c0c, s_pow2) = tail
        else:
            (s_next, s_begin, s_mark, s_chk, s_stack, s_col) = tail
    else:
        if BAND:
            s_bnd, s_c0c, s_pow2 = tail
    K = N + L
    KP = K + 8
    MN = N + 8
    ME = N * E + 8
    R1 = N + 1
    HORIZ = 2 * E
    BIGP = 2 * E + 1
    fNEG = jnp.float32(NEG)
    rg = range(G)

    # per-window region indexers; scrap slot = index N / N*E / KP-1 of the
    # window's own region (branchless masking, cudapoa warp-uniform style)
    def nd(g, i):
        return g * MN + i

    def ed(g, i):
        return g * ME + i

    def kd(g, i):
        return g * KP + i

    def cn(x, hi):
        return jnp.clip(x, 0, hi)

    def sel(ok, idx, scrap):
        return jnp.where(ok, idx, scrap)

    def vecg(vals, dtype):
        # (G, 1) vector from G per-window scalars
        if G == 1:
            return jnp.full((1, 1), vals[0], dtype)
        return jnp.concatenate(
            [jnp.full((1, 1), v, dtype) for v in vals], axis=0
        )

    # -- packed graph-array accessors -------------------------------------
    # SMEM is the binding constraint on G (windows fused per grid step);
    # edge lists are its dominant term. PACK_EW (unit-weight builds, where
    # accumulated edge weights stay tiny) fuses in-edge id and weight into
    # one word: (in_e + 1) | (in_w << 13). Out-edge and alignment lists
    # hold bare node ids and always pack two 16-bit halfwords per word
    # (word stride MEH, scrap word (N*E)//2 disjoint from real slots).
    MEH = (N * E) // 2 + 8

    if PACK_EW:
        def ie_get(idx):
            return (s_in_e[idx] & 0x1FFF) - 1

        def iw_get(idx):
            return s_in_e[idx] >> 13

        def iew_get(idx):
            w = s_in_e[idx]
            return (w & 0x1FFF) - 1, w >> 13

        def iew_set(idx, e, w):
            s_in_e[idx] = (e + 1) | (w << 13)

        def iw_add(idx, dw):
            s_in_e[idx] = s_in_e[idx] + (dw << 13)
    else:
        def ie_get(idx):
            return s_in_e[idx]

        def iw_get(idx):
            return s_in_w[idx]

        def iew_get(idx):
            return s_in_e[idx], s_in_w[idx]

        def iew_set(idx, e, w):
            s_in_e[idx] = e
            s_in_w[idx] = w

        def iw_add(idx, dw):
            s_in_w[idx] = s_in_w[idx] + dw

    def _h_get(ref, g, idx):
        w = ref[g * MEH + (idx >> 1)]
        return (w >> ((idx & 1) * 16)) & 0xFFFF

    def _h_set(ref, g, idx, val):
        sh = (idx & 1) * 16
        wi = g * MEH + (idx >> 1)
        ref[wi] = (ref[wi] & ~(0xFFFF << sh)) | (val << sh)

    def oe_get(g, idx):
        return _h_get(s_out_e, g, idx)

    def oe_set(g, idx, val):
        _h_set(s_out_e, g, idx, val)

    def al_get(g, idx):
        return _h_get(s_al, g, idx)

    def al_set(g, idx, val):
        _h_set(s_al, g, idx, val)

    def seq_at(g, s_, i):
        # seqs_s_ref packs four ASCII bytes per word
        w = seqs_s_ref[g, s_, i >> 2]
        return (w >> ((i & 3) * 8)) & 0xFF

    nss = [nseqs_ref[g, 0, 0] for g in rg]
    len0s = [lens_ref[g, 0, 0] for g in rg]

    iota_lp = jax.lax.broadcasted_iota(jnp.int32, (1, Lp), 1)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    slope_f = (jnp.float32(gap) * iota_lp).astype(jnp.float32)

    # ---------------- backbone (cudapoa_kernels.cuh:200-238) -------------
    for g in rg:
        live = nss[g] > 0
        sm[g * 8 + 0] = jnp.where(live, len0s[g], 0)
        sm[g * 8 + 1] = jnp.where(live, 0, 1)  # padded windows: skip all
        err_ref[g, 0, 0] = jnp.where(live, 0, 1)
        clen_ref[g, 0, 0] = 0
    sm[8 * G] = jnp.int32(_SRC_TAG)  # cache-key versioning (see _SRC_TAG)
    if BAND:
        _fill_pow2(s_pow2)  # power-of-two table for the exact divider

    max_len0 = _maxs([jnp.where(nss[g] > 0, len0s[g], 0) for g in rg])

    def bb(i, _):
        for g in rg:
            ok = (i < len0s[g]) & (nss[g] > 0)
            d = sel(ok, i, N)
            ic = cn(i, L - 1)
            s_node[nd(g, d)] = seq_at(g, 0, ic)
            s_inc[nd(g, d)] = jnp.where(i > 0, 1, 0)
            s_outc[nd(g, d)] = jnp.where(i < len0s[g] - 1, 1, 0)
            s_alc[nd(g, d)] = 0
            s_cov[nd(g, d)] = 1
            s_sort[nd(g, d)] = i
            s_pos[nd(g, d)] = i
            s_ocs[nd(g, d)] = jnp.where(i < len0s[g] - 1, 1, 0)
            de = sel(ok, i * E, N * E)
            if UNIT_W:
                w = jnp.int32(1)
                wp = jnp.int32(1)
            else:
                w = wts_s_ref[g, 0, ic]
                wp = wts_s_ref[g, 0, cn(i - 1, L - 1)]
            iew_set(ed(g, de), i - 1, jnp.where(i > 0, wp + w, w))
            oe_set(g, de, i + 1)
        return 0

    def bb2(i2, _):
        bb(2 * i2, None)
        bb(2 * i2 + 1, None)
        return 0

    jax.lax.fori_loop(0, (max_len0 + 1) // 2, bb2, 0)

    if MSA:
        # successor map: a sequence covers each node at most once, so the
        # covered out-edge is unique — s_next[node*S + s] replaces the
        # reference's per-edge coverage lists (cudapoa_add_alignment.cuh
        # :239-272) at 1/E the memory. Chain ends are written explicitly
        # (-1), so no O(N*S) prefill is needed.
        def bb_next(i, _):
            s_next[i * S] = jnp.where(i < len0s[0] - 1, i + 1, -1)
            return 0

        jax.lax.fori_loop(0, len0s[0], bb_next, 0)
        s_begin[0] = 0

    # ============== per-sequence loop =====================================
    def seq_body(s, _):
        rls = [lens_ref[g, 0, s] for g in rg]
        ncs0 = [sm[g * 8 + 0] for g in rg]
        errs0 = [sm[g * 8 + 1] for g in rg]
        # node-count guard (kernels.cuh:254-259)
        errs = [
            jnp.where(
                (s < nss[g]) & (errs0[g] == 0) & (ncs0[g] >= N), 1, errs0[g]
            )
            for g in rg
        ]
        for g in rg:
            sm[g * 8 + 1] = errs[g]
        runs = [(s < nss[g]) & (errs[g] == 0) for g in rg]
        any_run = _anys(runs)

        @pl.when(any_run)
        def _process():
            ncs = [jnp.where(runs[g], ncs0[g], 0) for g in rg]
            max_nc = _maxs(ncs)
            rl_vec = vecg(rls, jnp.int32)
            reads = jnp.concatenate(
                [
                    jnp.where(iota_l < rls[g], seqs_ref[g, pl.ds(s, 1), :], -1)
                    for g in rg
                ],
                axis=0,
            ) if G > 1 else jnp.where(
                iota_l < rls[0], seqs_ref[0, pl.ds(s, 1), :], -1
            )  # (G, L)

            # ---------------- NW (cudapoa_nw.cuh) -------------------------
            if BAND:
                # static-band NW (cudapoa_nw_banded.cuh via poa/banded.py)
                f32 = jnp.float32
                iota_b = jax.lax.broadcasted_iota(jnp.int32, (1, BAND), 1)
                slope_b = f32(gap) * iota_b.astype(f32)
                mcs = [rls[g] + 1 for g in rg]
                # gradient = (rl+1)/(nc+1) with CORRECTLY-ROUNDED f32
                # division (the reference's CUDA f32 div is IEEE; the VPU's
                # is not — see _ieee_div_mants). Mantissa/exponent kept for
                # the exact reciprocal in adaptive rule 2.
                _gdiv = [
                    _ieee_div_ints(
                        rls[g] + 1, jnp.maximum(ncs[g] + 1, 1), s_pow2
                    )
                    for g in rg
                ]
                grads = [t[0] for t in _gdiv]
                grad_ms = [t[1] for t in _gdiv]
                grad_es = [t[2] for t in _gdiv]
                MAXW = 1536  # CUDAPOA_MAX_ADAPTIVE_BAND_WIDTH
                SHIFT_L, SHIFT_R = -10, -11

                def make_bs_of(wds, bshs):
                    def bs_of(row, g):
                        """get_band_start_for_row (banded.py:43-49); f32
                        row*gradient truncation as in the reference."""
                        di = (row.astype(f32) * grads[g]).astype(jnp.int32)
                        sp = jnp.maximum(0, di - bshs[g])
                        sp = jnp.where(
                            mcs[g] < sp + wds[g],
                            jnp.maximum(0, mcs[g] - wds[g] + 4),
                            sp,
                        )
                        return sp - sp % 4

                    return bs_of

                def band_rules(g, rerun):
                    """Adaptive band sizing, ad-hoc rules 1-6
                    (banded.py:76-97). Returns (band_width, band_shift,
                    give_up)."""
                    wd = jnp.int32(BAND_CFG)
                    if ADAPT:
                        mcf = mcs[g].astype(f32)

                        def align128(x):
                            return ((x + 127) // 128) * 128

                        # f64-literal comparisons in the reference
                        # (gradient > 1.1 promotes to double): g32 > 1.1
                        # iff g32 >= f32(1.1) (f32(1.1) rounds up);
                        # g32 < 0.8 iff g32 < f32(0.8) (f32(0.8) rounds up)
                        wd = jnp.where(
                            grads[g] >= f32(1.1),
                            jnp.maximum(
                                wd,
                                align128(
                                    (mcf * f32(0.08) * grads[g]).astype(
                                        jnp.int32
                                    )
                                ),
                            ),
                            wd,
                        )
                        # rule 2's division: exact reciprocal of the f32
                        # gradient (deterministic across compiled/interp),
                        # then f32 multiplies
                        recip_g, _, _ = _ieee_div_mants(
                            jnp.int32(1 << 23), jnp.int32(0),
                            grad_ms[g], grad_es[g], s_pow2,
                        )
                        wd = jnp.where(
                            grads[g] < f32(0.8),
                            jnp.maximum(
                                wd,
                                align128(
                                    (mcf * f32(0.1) * recip_g).astype(
                                        jnp.int32
                                    )
                                ),
                            ),
                            wd,
                        )
                        wd = jnp.minimum(wd, MAXW)
                    give_up = (wd == MAXW) & (rerun != 0) if ADAPT else (
                        jnp.bool_(False)
                    )
                    bsh = wd // 2
                    if ADAPT:
                        can2 = wd <= MAXW // 2
                        dl = (rerun == SHIFT_L) & can2
                        dr = (rerun == SHIFT_R) & can2
                        bsh = jnp.where(
                            dl, (bsh.astype(f32) * f32(2.5)).astype(jnp.int32),
                            jnp.where(
                                dr,
                                (bsh.astype(f32) * f32(1.5)).astype(jnp.int32),
                                bsh,
                            ),
                        )
                        wd = jnp.where(dl | dr, wd * 2, wd)
                    return wd, bsh, give_up

                # 0-padded reads (banded.py read_pad semantics: chars past
                # the read length compare as code 0)
                reads0 = jnp.concatenate(
                    [
                        jnp.where(iota_l < rls[g], seqs_ref[g, pl.ds(s, 1), :], 0)
                        for g in rg
                    ],
                    axis=0,
                ) if G > 1 else jnp.where(
                    iota_l < rls[0], seqs_ref[0, pl.ds(s, 1), :], 0
                )  # (G, L)
                # width >= allocated band lanes (the profile roll slices
                # [:BAND]); in-guard lanes never index past rl + 4, and
                # the pow2 rounding (see _pow2_lanes: non-pow2-vreg
                # dynamic rolls are miscompiled) also zero-covers the
                # guard-clipped chunk past the read end with banded.py's
                # read_pad semantics
                LpB = _pow2_lanes(max(Lp + 8, BAND))
                reads_pad = jnp.pad(reads0, ((0, 0), (0, LpB - L)))  # (G, LpB)

                if PH & 1:
                    for g in rg:
                        # row 0: scores[0, slot k] = k*gap -> lane l =
                        # (l+1)*gap; boundary slot 0 = 0
                        scores[g * R1 : g * R1 + 1, :] = (
                            slope_b + f32(gap)
                        )
                        s_bnd[g * R1] = f32(0)
                        s_c0c[g * R1] = jnp.int32(HORIZ)

                # per-pass parameters (set by banded_pass before tracing
                # the loops below; the shift-rerun protocol traces the
                # bodies once per attempt)
                _pp = {}

                def banded_row_body(gp, _):
                    bs_of = _pp["bs_of"]
                    acts = [_pp["acts"][g] & (gp < ncs[g]) for g in rg]
                    row = gp + 1
                    nids = [
                        jnp.where(
                            acts[g], cn(s_sort[nd(g, cn(gp, N - 1))], N - 1), N
                        )
                        for g in rg
                    ]
                    pcs = [
                        jnp.where(acts[g], cn(s_inc[nd(g, nids[g])], E), 0)
                        for g in rg
                    ]
                    bss = [bs_of(row, g) for g in rg]

                    # boundary value + its traceback code (banded.py:136-148)
                    fes, c0s = [], []
                    for g in rg:
                        def fe_body(e, carry):
                            best, beste = carry
                            pe = cn(ie_get(ed(g, nids[g] * E + cn(e, E - 1))), N)
                            pi = cn(s_pos[nd(g, pe)] + 1, N)
                            v = s_bnd[g * R1 + jnp.where(pcs[g] > 0, pi, 0)]
                            take = (e < pcs[g]) & (v > best)
                            return (
                                jnp.where(take, v, best),
                                jnp.where(take, e, beste),
                            )

                        pen, ebest = jax.lax.fori_loop(
                            0, jnp.maximum(pcs[g], 1), fe_body,
                            (fNEG, jnp.int32(0)),
                        )
                        fe = jnp.where(
                            pcs[g] == 0,
                            f32(gap),  # vertical from row 0 (score 0)
                            jnp.where(
                                (bss[g] > 4) & (pcs[g] == 1),
                                fNEG,  # MIN + gap collapses in f32
                                pen + f32(gap),
                            ),
                        )
                        c0 = E + jnp.where(pcs[g] == 0, 0, ebest)
                        dst = sel(acts[g], row, 0)
                        # row 0's slot is rewritten only by inactive scrap
                        # writes; restore it afterwards
                        s_bnd[g * R1 + dst] = jnp.where(acts[g], fe, f32(0))
                        s_c0c[g * R1 + dst] = jnp.where(acts[g], c0, HORIZ)
                        fes.append(fe)
                        c0s.append(c0)

                    # per-window profile: lane l compares read[bs+l]
                    gb_vec = vecg([s_node[nd(g, nids[g])] for g in rg], jnp.int32)
                    shifted = [
                        pltpu.roll(
                            reads_pad[g : g + 1, :], shift=-bss[g], axis=1
                        )[:, :BAND]
                        for g in rg
                    ]
                    rd = (
                        jnp.concatenate(shifted, axis=0) if G > 1 else shifted[0]
                    )  # (G, BAND)
                    sub = jnp.where(rd == gb_vec, match, mismatch).astype(f32)

                    max_pc = _maxs(pcs)

                    def banded_pred(e, carry):
                        val, code = carry
                        cand_d, cand_v = [], []
                        for g in rg:
                            pe = cn(ie_get(ed(g, nids[g] * E + cn(e, E - 1))), N)
                            pi = jnp.where(
                                pcs[g] == 0, 0, cn(s_pos[nd(g, pe)] + 1, N)
                            )
                            pbs = bs_of(pi, g)
                            delta = bss[g] - pbs
                            prow = scores[pl.ds(g * R1 + pi, 1), :]
                            vert = pltpu.roll(prow, shift=-delta, axis=1)
                            diag = pltpu.roll(vert, shift=1, axis=1)
                            diag = jnp.where(
                                iota_b + delta == 0, s_bnd[g * R1 + pi], diag
                            )
                            # chunk-of-4 conservative guard (banded.py:165-170)
                            rp = bss[g] + (iota_b & ~3)
                            pbe = jnp.minimum(pbs + _pp["wds"][g] - 4, mcs[g])
                            ok = (rp >= pbs) & (rp <= pbe)
                            me = (e < pcs[g]) | ((e == 0) & (pcs[g] == 0))
                            ok = ok & me
                            cand_d.append(jnp.where(ok, diag, fNEG))
                            cand_v.append(jnp.where(ok, vert, fNEG))
                        dg = (
                            jnp.concatenate(cand_d, axis=0)
                            if G > 1 else cand_d[0]
                        ) + sub
                        vt = (
                            jnp.concatenate(cand_v, axis=0)
                            if G > 1 else cand_v[0]
                        ) + f32(gap)
                        for cand, cc in ((dg, e), (vt, E + e)):
                            better = cand > val
                            tie = cand == val
                            code = jnp.where(
                                better, cc,
                                jnp.where(tie, jnp.minimum(code, cc), code),
                            )
                            val = jnp.maximum(val, cand)
                        return val, code

                    val0 = jnp.full((G, BAND), fNEG, f32)
                    code0 = jnp.full((G, BAND), BIGP, jnp.int32)
                    val, code = jax.lax.fori_loop(
                        0, jnp.maximum(max_pc, 1), banded_pred, (val0, code0)
                    )

                    # in-band horizontal closure seeded from the boundary
                    fe_vec = vecg(fes, f32)
                    pre = jnp.where(
                        iota_b == 0, jnp.maximum(val, fe_vec + f32(gap)), val
                    )
                    m = pre - slope_b
                    sh = 1
                    while sh < BAND:
                        m = jnp.maximum(
                            m,
                            jnp.pad(
                                m, ((0, 0), (sh, 0)), constant_values=NEG
                            )[:, :BAND],
                        )
                        sh *= 2
                    rowv = m + slope_b
                    prevv = jnp.where(
                        iota_b == 0, fe_vec,
                        jnp.pad(rowv, ((0, 0), (1, 0)))[:, :BAND],
                    )
                    horiz = rowv == prevv + f32(gap)
                    fin = jnp.where(rowv == val, code, BIGP)
                    fin = jnp.minimum(fin, jnp.where(horiz, HORIZ, BIGP))
                    # lanes past the dynamic band width stay out of band
                    oob_l = iota_b >= _pp["wd_vec"]
                    rowv = jnp.where(oob_l, fNEG, rowv)
                    fin = jnp.where(oob_l, BIGP, fin)
                    for g in rg:
                        dst = sel(acts[g], g * R1 + row, g * R1)
                        row_out = jnp.where(
                            acts[g], rowv[g : g + 1, :],
                            scores[pl.ds(g * R1, 1), :],
                        )
                        fin_out = jnp.where(
                            acts[g], fin[g : g + 1, :],
                            codes[pl.ds(g * R1, 1), :],
                        )
                        scores[pl.ds(dst, 1), :] = row_out
                        codes[pl.ds(dst, 1), :] = fin_out
                    return 0

                TERM_B = BIGP     # walk ends with a final (nid/-1, j-1) entry
                BCELL_B = BIGP + 1  # boundary-cell visit: host banded rerun

                def banded_tb(pacts, wds, bshs, reruns):
                    """Band-aware traceback start + walk; writes sm slots
                    +1 (err), +2 (alignment length), +3 (shift code)."""
                    bs_of = _pp["bs_of"]
                    iota_r = jax.lax.broadcasted_iota(jnp.int32, (R1, 1), 0)
                    for g in rg:
                        blk = scores[g * R1 : (g + 1) * R1, :]
                        di = (iota_r.astype(f32) * grads[g]).astype(jnp.int32)
                        spv = jnp.maximum(0, di - bshs[g])
                        spv = jnp.where(
                            mcs[g] < spv + wds[g],
                            jnp.maximum(0, mcs[g] - wds[g] + 4),
                            spv,
                        )
                        bs_vec = spv - spv % 4  # (R1, 1)
                        lane_t = rls[g] - bs_vec - 1
                        mm = iota_b == lane_t  # (R1, BAND)
                        oob = (lane_t < 0) | (lane_t >= wds[g])
                        prod = jnp.where(mm, blk, 0.0) + jnp.where(
                            (iota_b == 0) & oob, fNEG, 0.0
                        )
                        ones_b = jnp.ones((1, BAND), jnp.float32)
                        cv = jax.lax.dot_general(
                            ones_b, prod,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            # HIGHEST: the MXU's default f32 path rounds
                            # through bf16 passes; scores with >8 mantissa
                            # bits came back off-by-one and flipped the
                            # traceback-start argmax (the r2 "Mosaic
                            # divergence" — ~3% of covid golden windows)
                            precision=jax.lax.Precision.HIGHEST,
                        )  # (1, R1)
                        colv[pl.ds(g * R1, R1)] = cv[0, :]
                    if not INTERP:
                        cpy = pltpu.make_async_copy(colv, s_colv, dma_sem)
                        cpy.start()
                        cpy.wait()

                    def col_at(g, r1):
                        if INTERP:
                            return colv[g * R1 + r1]
                        return s_colv[g * R1 + r1]

                    def best_body(r, carry):
                        bis, bss_ = carry
                        nbis, nbss = [], []
                        for g in rg:
                            sc = col_at(g, cn(r, N - 1) + 1)
                            take = (
                                pacts[g]
                                & (r < ncs[g])
                                & (s_ocs[nd(g, cn(r, N - 1))] == 0)
                                & (bss_[g] < sc)
                            )
                            nbis.append(jnp.where(take, r + 1, bis[g]))
                            nbss.append(jnp.where(take, sc, bss_[g]))
                        return tuple(nbis), tuple(nbss)

                    bests, _ = jax.lax.fori_loop(
                        0, max_nc, best_body,
                        (
                            tuple(jnp.int32(0) for _ in rg),
                            tuple(fNEG for _ in rg),
                        ),
                    )

                    def tb_cond(c):
                        iis, jjs = c[0], c[1]
                        alive = _anys(
                            [(iis[g] != 0) | (jjs[g] != 0) for g in rg]
                        )
                        return alive & (c[3] < K + 2)

                    def tb_body(c):
                        iis, jjs, kks, steps = c
                        nis, njs, nks = [], [], []
                        for g in rg:
                            i, j, k = iis[g], jjs[g], kks[g]
                            alive = (i != 0) | (j != 0)
                            crow = codes[pl.ds(g * R1 + cn(i, N), 1), :]
                            bs_i = bs_of(cn(i, N), g)
                            lane = j - bs_i - 1
                            cd_in = jnp.sum(
                                jnp.where(iota_b == lane, crow, 0)
                            )
                            c0 = s_c0c[g * R1 + cn(i, N)]
                            row0_in = j <= jnp.minimum(wds[g], mcs[g])
                            cd = jnp.where(
                                i == 0,
                                jnp.where(row0_in, HORIZ, TERM_B),
                                jnp.where(
                                    j == 0, c0,
                                    jnp.where(
                                        (lane >= 0) & (lane < wds[g]), cd_in,
                                        jnp.where(
                                            lane == -1, BCELL_B, TERM_B
                                        ),
                                    ),
                                ),
                            )
                            cd = jnp.where(alive, cd, HORIZ)
                            bad = alive & (cd == BCELL_B) & pacts[g]
                            sm[g * 8 + 1] = jnp.where(bad, 3, sm[g * 8 + 1])
                            cd = jnp.where(cd == BCELL_B, TERM_B, cd)

                            # ad-hoc rules 7-8 (banded.py:203-213): path too
                            # close to a band limit -> shift sentinel
                            shifted = jnp.bool_(False)
                            if ADAPT:
                                thr = jnp.maximum(1, mcs[g] // 1024)
                                chk = (
                                    alive & (i != 0) & (j != 0)
                                    & (reruns[g] == 0) & (wds[g] < MAXW)
                                    & (thr < j) & (j < mcs[g] - thr)
                                )
                                sl_ = chk & (j <= bs_i + thr)
                                sr_ = chk & (j >= bs_i + wds[g] - thr)
                                code_s = jnp.where(
                                    sl_, SHIFT_L, jnp.where(sr_, SHIFT_R, 0)
                                )
                                shifted = code_s != 0
                                sm[g * 8 + 3] = jnp.where(
                                    shifted & pacts[g], code_s, sm[g * 8 + 3]
                                )

                            is_term = (cd == TERM_B) | shifted
                            is_horiz = cd == HORIZ
                            is_diag = cd < E
                            e = jnp.where(is_horiz | is_term, 0, cd % E)
                            nid = cn(s_sort[nd(g, cn(i - 1, N - 1))], N - 1)
                            pc = s_inc[nd(g, nid)]
                            pred = cn(
                                ie_get(ed(g, nid * E + cn(e, E - 1))), N - 1
                            )
                            pi = jnp.where(
                                pc == 0, 0, cn(s_pos[nd(g, pred)] + 1, N)
                            )
                            prev_i = jnp.where(
                                is_term, 0, jnp.where(is_horiz, i, pi)
                            )
                            prev_j = jnp.where(
                                is_term, 0,
                                jnp.where(is_horiz | is_diag, j - 1, j),
                            )
                            emit = alive & ~shifted
                            dst = kd(g, sel(emit, cn(k, KP - 2), KP - 1))
                            s_ag[dst] = jnp.where(prev_i == i, -1, nid)
                            s_ar[dst] = jnp.where(prev_j == j, -1, j - 1)
                            nis.append(jnp.where(alive, prev_i, i))
                            njs.append(jnp.where(alive, prev_j, j))
                            nks.append(k + emit.astype(jnp.int32))
                        return tuple(nis), tuple(njs), tuple(nks), steps + 1

                    def tb_body2(c):
                        return tb_body(tb_body(c))

                    ifs, jfs, kfs, steps = jax.lax.while_loop(
                        tb_cond, tb_body2,
                        (
                            tuple(
                                jnp.where(pacts[g], bests[g], 0) for g in rg
                            ),
                            tuple(jnp.where(pacts[g], rls[g], 0) for g in rg),
                            tuple(jnp.int32(0) for _ in rg),
                            jnp.int32(0),
                        ),
                    )
                    for g in rg:
                        nonterm = (ifs[g] != 0) | (jfs[g] != 0)
                        no_shift = sm[g * 8 + 3] == 0 if ADAPT else True
                        sm[g * 8 + 1] = jnp.where(
                            pacts[g] & nonterm & no_shift, 3, sm[g * 8 + 1]
                        )
                        sm[g * 8 + 2] = jnp.where(
                            pacts[g], kfs[g], sm[g * 8 + 2]
                        )

                def banded_pass(pacts, wds, bshs, reruns):
                    _pp["acts"] = pacts
                    _pp["wds"] = wds
                    _pp["wd_vec"] = vecg(wds, jnp.int32)
                    _pp["bs_of"] = make_bs_of(wds, bshs)
                    if PH & 1:
                        # fresh lambda: lax caches traced bodies by function
                        # identity + avals, and the pass parameters in _pp
                        # are trace-time constants
                        jax.lax.fori_loop(
                            0, max_nc, lambda gp, c: banded_row_body(gp, c), 0
                        )
                    if PH & 2:
                        banded_tb(pacts, wds, bshs, reruns)

                # ---- banded orchestration: attempt 1 (+ shift rerun) -----
                z32 = jnp.int32(0)
                params1 = [band_rules(g, z32) for g in rg]
                wd1 = [p[0] for p in params1]
                bsh1 = [p[1] for p in params1]
                fit1 = [wd1[g] <= BAND for g in rg]
                for g in rg:
                    sm[g * 8 + 1] = jnp.where(
                        runs[g] & ~fit1[g], 6, sm[g * 8 + 1]
                    )
                    sm[g * 8 + 2] = jnp.where(runs[g], 0, sm[g * 8 + 2])
                    sm[g * 8 + 3] = jnp.where(runs[g], 0, sm[g * 8 + 3])
                acts1 = [runs[g] & fit1[g] for g in rg]
                banded_pass(acts1, wd1, bsh1, [z32] * G)

                if ADAPT:
                    shifts = [sm[g * 8 + 3] for g in rg]
                    params2 = [band_rules(g, shifts[g]) for g in rg]
                    wd2 = [p[0] for p in params2]
                    bsh2 = [p[1] for p in params2]
                    give2 = [p[2] for p in params2]
                    need2 = [(shifts[g] != 0) & acts1[g] for g in rg]
                    fit2 = [wd2[g] <= BAND for g in rg]
                    run2 = [need2[g] & ~give2[g] & fit2[g] for g in rg]
                    for g in rg:
                        # give-up (rule 3 + rerun) maps to the host chain's
                        # loop_count error; band > allocated lanes -> host
                        sm[g * 8 + 1] = jnp.where(
                            need2[g] & (give2[g] | ~fit2[g]), 3,
                            sm[g * 8 + 1],
                        )

                    @pl.when(_anys(run2))
                    def _rerun():
                        banded_pass(run2, wd2, bsh2, shifts)

                aln_lens = tuple(sm[g * 8 + 2] for g in rg)

                if DBG >= 0:
                    @pl.when(s == DBG)
                    def _dump():
                        for g in rg:
                            dbg_sc[g] = scores[pl.ds(g * R1, R1), :]
                            dbg_cd[g] = codes[pl.ds(g * R1, R1), :]

                            def _cpy(r, _):
                                dbg_bnd[g, 0, r] = s_bnd[g * R1 + r]
                                dbg_c0[g, 0, r] = s_c0c[g * R1 + r]
                                return 0

                            jax.lax.fori_loop(0, R1, _cpy, 0)

            if PH & 1 and not BAND:
                for g in rg:
                    scores[g * R1 : g * R1 + 1, :] = slope_f

            def row_body(gp, _):
                acts = [runs[g] & (gp < ncs[g]) for g in rg]
                nids = [
                    jnp.where(acts[g], cn(s_sort[nd(g, cn(gp, N - 1))], N - 1), N)
                    for g in rg
                ]
                pcs = [
                    jnp.where(acts[g], cn(s_inc[nd(g, nids[g])], E), 0)
                    for g in rg
                ]
                gb_vec = vecg([s_node[nd(g, nids[g])] for g in rg], jnp.int32)
                sub = jnp.where(reads == gb_vec, match, mismatch).astype(
                    jnp.float32
                )
                # shifted profile: sub_sh[j] = sub[j-1] (diag cost at col j)
                sub_sh = jnp.pad(sub, ((0, 0), (1, Lp - L - 1)))

                def pred_rows(e):
                    rows = []
                    for g in rg:
                        pe = cn(ie_get(ed(g, nids[g] * E + cn(e, E - 1))), N)
                        pp = jnp.where(
                            pcs[g] == 0, 0, cn(s_pos[nd(g, pe)] + 1, N)
                        )
                        rows.append(scores[pl.ds(g * R1 + pp, 1), :])
                    return (
                        jnp.concatenate(rows, axis=0) if G > 1 else rows[0]
                    )  # (G, Lp)

                # predecessor 0 fast path (single-pred rows dominate): codes
                # prefer diagonal on ties (diag code e < vert code E+e)
                prow = pred_rows(jnp.int32(0))
                diag = jnp.pad(prow, ((0, 0), (1, 0)))[:, :Lp] + sub_sh
                vert = prow + jnp.float32(gap)
                val = jnp.maximum(diag, vert)
                code = jnp.where(diag >= vert, 0, E)
                c0val = prow[:, 0:1] + jnp.float32(gap)
                c0code = jnp.full((G, 1), E, jnp.int32)

                max_pc = _maxs(pcs)

                def pred_body(e, carry):
                    val, code, c0val, c0code = carry
                    # i32 mask: materialized (G,1) bool vectors hit a Mosaic
                    # vreg-bitcast limitation (i1 -> i32)
                    me = vecg(
                        [(e < pcs[g]).astype(jnp.int32) for g in rg], jnp.int32
                    ) != 0
                    prow = pred_rows(e)
                    diag = jnp.where(
                        me, jnp.pad(prow, ((0, 0), (1, 0)))[:, :Lp] + sub_sh, fNEG
                    )
                    vert = jnp.where(me, prow + jnp.float32(gap), fNEG)
                    c0 = jnp.where(me, prow[:, 0:1] + jnp.float32(gap), fNEG)
                    for cand, cc in ((diag, e), (vert, E + e)):
                        better = cand > val
                        tie = cand == val
                        code = jnp.where(
                            better, cc, jnp.where(tie, jnp.minimum(code, cc), code)
                        )
                        val = jnp.maximum(val, cand)
                    c0code = jnp.where(
                        c0 > c0val, E + e,
                        jnp.where(c0 == c0val, jnp.minimum(c0code, E + e), c0code),
                    )
                    c0val = jnp.maximum(c0val, c0)
                    return val, code, c0val, c0code

                val, code, c0val, c0code = jax.lax.fori_loop(
                    1, jnp.maximum(max_pc, 1), pred_body,
                    (val, code, c0val, c0code),
                )
                row = jnp.where(iota_lp == 0, c0val, val)
                row = jnp.where(iota_lp > rl_vec, fNEG, row)
                # horizontal closure: prefix max of m = row - j*gap (exact:
                # scores are small integers in f32)
                m = row - slope_f
                sh = 1
                while sh < Lp:
                    m = jnp.maximum(
                        m, jnp.pad(m, ((0, 0), (sh, 0)), constant_values=NEG)[:, :Lp]
                    )
                    sh *= 2
                row = m + slope_f
                horiz = row == jnp.pad(row, ((0, 0), (1, 0)))[:, :Lp] + jnp.float32(gap)
                fin = jnp.where(row == val, code, BIGP)
                fin = jnp.minimum(fin, jnp.where(horiz, HORIZ, BIGP))
                fin = jnp.where(
                    iota_lp == 0, jnp.where(row == c0val, c0code, BIGP), fin
                )
                for g in rg:
                    scores[pl.ds(g * R1 + gp + 1, 1), :] = row[g : g + 1, :]
                    codes[pl.ds(g * R1 + gp + 1, 1), :] = fin[g : g + 1, :]
                return 0

            if PH & 1 and not BAND:
                # manual 2x unroll (dynamic bounds forbid unroll=): halves
                # loop-trip overhead; overshoot rows are masked by acts
                def row_body2(i2, _):
                    row_body(2 * i2, None)
                    row_body(2 * i2 + 1, None)
                    return 0

                jax.lax.fori_loop(0, (max_nc + 1) // 2, row_body2, 0)

            if PH & 2 and not BAND:
                # traceback start: first max at column rl among sink rows.
                # Column rl is extracted lane-major with one MXU dot per
                # window (mask . scores^T — exact: small ints in f32), DMA'd
                # to 1-D SMEM, then scanned scalar (3 ns/load). 1-D buffers:
                # 2-D (X, 1) SMEM scratch gets lane-padded to (X, 128).
                for g in rg:
                    blk = scores[g * R1 : (g + 1) * R1, :]
                    mask = (iota_lp == rls[g]).astype(jnp.float32)
                    cv = jax.lax.dot_general(
                        mask, blk,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        # HIGHEST — see the banded extractor above: default
                        # MXU f32 precision rounds scores through bf16 and
                        # corrupts the traceback-start column
                        precision=jax.lax.Precision.HIGHEST,
                    )  # (1, R1) lane-major
                    colv[pl.ds(g * R1, R1)] = cv[0, :]
                if not INTERP:
                    cpy = pltpu.make_async_copy(colv, s_colv, dma_sem)
                    cpy.start()
                    cpy.wait()

                def col_at(g, r1):
                    if INTERP:
                        return colv[g * R1 + r1]
                    return s_colv[g * R1 + r1]

                def best_body(r, carry):
                    bis, bss = carry
                    nbis, nbss = [], []
                    for g in rg:
                        sc = col_at(g, cn(r, N - 1) + 1)
                        take = (
                            runs[g]
                            & (r < ncs[g])
                            & (s_ocs[nd(g, cn(r, N - 1))] == 0)
                            & (bss[g] < sc)
                        )
                        nbis.append(jnp.where(take, r + 1, bis[g]))
                        nbss.append(jnp.where(take, sc, bss[g]))
                    return tuple(nbis), tuple(nbss)

                bests, _ = jax.lax.fori_loop(
                    0, max_nc, best_body,
                    (
                        tuple(jnp.int32(0) for _ in rg),
                        tuple(fNEG for _ in rg),
                    ),
                )

                # traceback walk (one fused step per iteration; finished
                # windows freeze their carry)
                def tb_cond(c):
                    iis, jjs, kks, steps = c
                    alive = _anys([(iis[g] != 0) | (jjs[g] != 0) for g in rg])
                    return alive & (steps < K + 2)

                def tb_body(c):
                    iis, jjs, kks, steps = c
                    nis, njs, nks = [], [], []
                    for g in rg:
                        i, j, k = iis[g], jjs[g], kks[g]
                        alive = (i != 0) | (j != 0)
                        crow = codes[pl.ds(g * R1 + cn(i, N), 1), :]
                        cd = jnp.sum(jnp.where(iota_lp == j, crow, 0))
                        cd = jnp.where(alive & (i != 0), cd, HORIZ)
                        is_horiz = cd == HORIZ
                        is_diag = cd < E
                        e = jnp.where(is_horiz, 0, cd % E)
                        nid = cn(s_sort[nd(g, cn(i - 1, N - 1))], N - 1)
                        pc = s_inc[nd(g, nid)]
                        pred = cn(ie_get(ed(g, nid * E + cn(e, E - 1))), N - 1)
                        pi = jnp.where(pc == 0, 0, cn(s_pos[nd(g, pred)] + 1, N))
                        prev_i = jnp.where(is_horiz, i, pi)
                        prev_j = jnp.where(is_horiz | is_diag, j - 1, j)
                        dst = kd(g, sel(alive, cn(k, KP - 2), KP - 1))
                        s_ag[dst] = jnp.where(prev_i == i, -1, nid)
                        s_ar[dst] = jnp.where(prev_j == j, -1, j - 1)
                        nis.append(jnp.where(alive, prev_i, i))
                        njs.append(jnp.where(alive, prev_j, j))
                        nks.append(k + alive.astype(jnp.int32))
                    return tuple(nis), tuple(njs), tuple(nks), steps + 1

                def tb_body2(c):
                    return tb_body(tb_body(c))

                ifs, jfs, aln_lens, steps = jax.lax.while_loop(
                    tb_cond, tb_body2,
                    (
                        tuple(jnp.where(runs[g], bests[g], 0) for g in rg),
                        tuple(jnp.where(runs[g], rls[g], 0) for g in rg),
                        tuple(jnp.int32(0) for _ in rg),
                        jnp.int32(0),
                    ),
                )
                for g in rg:
                    sm[g * 8 + 1] = jnp.where(
                        runs[g] & ((ifs[g] != 0) | (jfs[g] != 0)), 3, errs[g]
                    )
            elif not BAND:
                aln_lens = tuple(jnp.int32(0) for _ in rg)

            # ------------- add alignment (cudapoa_add_alignment.cuh) ------
            if PH & 4:
                max_aln = _maxs(list(aln_lens))

                def add_body(t, carry):
                    heads, prev_ws = carry
                    nheads, nprev = [], []
                    for g in rg:
                        head, prev_w = heads[g], prev_ws[g]
                        err_g = sm[g * 8 + 1]
                        act = runs[g] & (t < aln_lens[g]) & (err_g == 0)
                        p = kd(g, cn(aln_lens[g] - 1 - t, KP - 1))
                        read_pos = s_ar[p]
                        act2 = act & (read_pos != -1)
                        rp = cn(read_pos, L - 1)
                        base = seq_at(g, s, rp)
                        w = jnp.int32(1) if UNIT_W else wts_s_ref[g, s, rp]
                        gid = s_ag[p]
                        gid_c = cn(gid, N - 1)
                        gnode = s_node[nd(g, gid_c)]
                        alc_g = cn(s_alc[nd(g, gid_c)], E)
                        need_fa = act2 & (gid != -1) & (gnode != base)

                        def fa(a0, acc):
                            aid = cn(al_get(g, gid_c * E + a0), N - 1)
                            return jnp.where(
                                (acc == -1) & (s_node[nd(g, aid)] == base),
                                aid, acc,
                            )

                        aligned = jax.lax.fori_loop(
                            0, jnp.where(need_fa, alc_g, 0), fa, jnp.int32(-1)
                        )
                        reuse_graph = act2 & (gid != -1) & (gnode == base)
                        reuse_aligned = (
                            act2 & (gid != -1) & ~reuse_graph & (aligned != -1)
                        )
                        new_node = act2 & ~reuse_graph & ~reuse_aligned
                        nc_cur = sm[g * 8 + 0]
                        cur = jnp.where(
                            reuse_graph, gid_c,
                            jnp.where(
                                reuse_aligned, cn(aligned, N - 1),
                                cn(nc_cur, N - 1),
                            ),
                        )
                        sm[g * 8 + 0] = nc_cur + new_node.astype(jnp.int32)
                        ovf_n = new_node & (nc_cur + 1 >= N)
                        ok_create = new_node & ~ovf_n
                        dn = nd(g, sel(ok_create, cur, N))
                        s_node[dn] = base
                        s_inc[dn] = 0
                        s_outc[dn] = 0
                        s_alc[dn] = 0
                        s_cov[dn] = 0
                        # aligned-node linking
                        link = ok_create & (gid != -1)
                        na = cn(s_alc[nd(g, gid_c)], E)

                        def la(a0, _):
                            aid = cn(al_get(g, gid_c * E + a0), N - 1)
                            slot = cn(s_alc[nd(g, aid)], E - 1)
                            al_set(g, sel(link, aid * E + slot, N * E), cur)
                            s_alc[nd(g, sel(link, aid, N))] = (
                                s_alc[nd(g, aid)] + 1
                            )
                            al_set(g, sel(link, cur * E + a0, N * E), aid)
                            return 0

                        jax.lax.fori_loop(0, jnp.where(link, na, 0), la, 0)
                        al_set(g, sel(link, gid_c * E + na, N * E), cur)
                        s_alc[nd(g, sel(link, gid_c, N))] = na + 1
                        al_set(g, sel(link, cur * E + na, N * E), gid_c)
                        s_alc[nd(g, sel(link, cur, N))] = na + 1
                        ovf_a = link & (na + 1 > A - 1)
                        err_now = jnp.where(
                            ovf_n, 1, jnp.where(ovf_a, 2, 0)
                        )
                        # edge from head to cur
                        act3 = act2 & (err_now == 0) & (head != -1)
                        head_c = cn(head, N - 1)
                        ic = cn(s_inc[nd(g, cur)], E)

                        def fe(e0, acc):
                            return jnp.where(
                                ie_get(ed(g, cur * E + e0)) == head, e0, acc
                            )

                        eslot = jax.lax.fori_loop(
                            0, jnp.where(act3, ic, 0), fe, jnp.int32(-1)
                        )
                        bump = act3 & (eslot != -1)
                        bidx = ed(
                            g, sel(bump, cur * E + cn(eslot, E - 1), N * E)
                        )
                        iw_add(bidx, prev_w + w)
                        app = act3 & (eslot == -1)
                        oc = cn(s_outc[nd(g, head_c)], E - 1)
                        ic_c = cn(ic, E - 1)
                        aidx = ed(g, sel(app, cur * E + ic_c, N * E))
                        iew_set(aidx, head, prev_w + w)
                        s_inc[nd(g, sel(app, cur, N))] = ic + 1
                        oe_set(g, sel(app, head_c * E + oc, N * E), cur)
                        s_outc[nd(g, sel(app, head_c, N))] = oc + 1
                        ovf_e = app & ((oc + 1 >= E) | (ic + 1 >= E))
                        err_fin = jnp.where(ovf_e, 2, err_now)
                        okc = act2 & (err_fin == 0)
                        cidx = nd(g, sel(okc, cur, N))
                        s_cov[cidx] = s_cov[cidx] + 1
                        if MSA:
                            s_next[
                                sel(okc, jnp.where(head != -1, head_c, N), N) * S + s
                            ] = cur
                            s_begin[sel(okc & (read_pos == 0), s, S)] = cur
                        sm[g * 8 + 1] = jnp.where(act2, err_fin, err_g)
                        nheads.append(jnp.where(act2, cur, head))
                        nprev.append(jnp.where(act2, w, prev_w))
                    return tuple(nheads), tuple(nprev)

                def add_body2(t2, c):
                    return add_body(2 * t2 + 1, add_body(2 * t2, c))

                heads_f, _ = jax.lax.fori_loop(
                    0, (max_aln + 1) // 2, add_body2,
                    (
                        tuple(jnp.int32(-1) for _ in rg),
                        tuple(jnp.int32(0) for _ in rg),
                    ),
                )
                if MSA:
                    # explicit chain end (replaces the O(N*S) -1 prefill)
                    ok_end = runs[0] & (sm[1] == 0) & (heads_f[0] != -1)
                    s_next[
                        sel(ok_end, cn(heads_f[0], N - 1), N) * S + s
                    ] = -1

            # ------------- topological sort (cudapoa_topsort.cuh:46) ------
            if PH & 8:
                errs2 = [sm[g * 8 + 1] for g in rg]
                oks = [runs[g] & (errs2[g] == 0) for g in rg]
                ncs2 = [jnp.where(oks[g], sm[g * 8 + 0], 0) for g in rg]
                max_nc2 = _maxs(ncs2)

                def cp(i, _):
                    for g in rg:
                        ok = i < ncs2[g]
                        s_loc[nd(g, sel(ok, i, N))] = s_inc[
                            nd(g, cn(i, N - 1))
                        ]
                    return 0

                jax.lax.fori_loop(0, max_nc2, cp, 0)

                # branch-free Kahn: non-emitting iterations write to scrap
                def seed(i, tails):
                    nt = []
                    for g in rg:
                        ok = i < ncs2[g]
                        ic = cn(i, N - 1)
                        emit = ok & (s_loc[nd(g, ic)] == 0)
                        dst = sel(emit, tails[g], N)
                        s_sort[nd(g, dst)] = i
                        s_ocs[nd(g, dst)] = s_outc[nd(g, ic)]
                        s_pos[nd(g, sel(emit, ic, N))] = tails[g]
                        nt.append(tails[g] + emit.astype(jnp.int32))
                    return tuple(nt)

                def seed2(i2, c):
                    return seed(2 * i2 + 1, seed(2 * i2, c))

                tails = jax.lax.fori_loop(
                    0, (max_nc2 + 1) // 2, seed2,
                    tuple(jnp.int32(0) for _ in rg),
                )

                def expand(i, tails):
                    nodes = [cn(s_sort[nd(g, cn(i, N - 1))], N - 1) for g in rg]
                    bounds = [
                        jnp.where(i < ncs2[g], cn(s_outc[nd(g, nodes[g])], E), 0)
                        for g in rg
                    ]
                    maxb = _maxs(bounds)

                    def eb(e0, tails):
                        nt = []
                        for g in rg:
                            ok = e0 < bounds[g]
                            out = cn(
                                oe_get(g, nodes[g] * E + cn(e0, E - 1)),
                                N - 1,
                            )
                            lc = s_loc[nd(g, out)] - 1
                            s_loc[nd(g, sel(ok, out, N))] = lc
                            emit = ok & (lc == 0)
                            dst = sel(emit, tails[g], N)
                            s_sort[nd(g, dst)] = out
                            s_ocs[nd(g, dst)] = s_outc[nd(g, out)]
                            s_pos[nd(g, sel(emit, out, N))] = tails[g]
                            nt.append(tails[g] + emit.astype(jnp.int32))
                        return tuple(nt)

                    return jax.lax.fori_loop(0, maxb, eb, tails)

                def expand2(i2, c):
                    return expand(2 * i2 + 1, expand(2 * i2, c))

                jax.lax.fori_loop(0, (max_nc2 + 1) // 2, expand2, tails)

        return 0

    jax.lax.fori_loop(1, S, seq_body, 0)

    # =============== consensus (cudapoa_generate_consensus.cuh) ===========
    if PH & 16:
        cacts = [(sm[g * 8 + 1] == 0) & (nss[g] > 0) for g in rg]
        cncs = [jnp.where(cacts[g], sm[g * 8 + 0], 0) for g in rg]
        cmax_nc = _maxs(cncs)
        any_c = _anys(cacts)

        @pl.when(any_c)
        def _consensus():
            def cpass(gp, carry):
                max_ids, max_scs = carry
                nmi, nms = [], []
                for g in rg:
                    ok = gp < cncs[g]
                    nid = cn(s_sort[nd(g, cn(gp, N - 1))], N - 1)
                    pc = jnp.where(ok, cn(s_inc[nd(g, nid)], E), 0)

                    def eb(e0, c):
                        sc, p = c
                        _b, ew = iew_get(ed(g, nid * E + e0))
                        begin = cn(_b, N - 1)
                        take = (sc < ew) | (
                            (sc == ew)
                            & (p != -1)
                            & (s_csc[nd(g, cn(p, N - 1))] <= s_csc[nd(g, begin)])
                        )
                        return (
                            jnp.where(take, ew, sc),
                            jnp.where(take, begin, p),
                        )

                    sc, p = jax.lax.fori_loop(
                        0, pc, eb, (jnp.int32(-1), jnp.int32(-1))
                    )
                    sc = jnp.where(
                        p != -1, sc + s_csc[nd(g, cn(p, N - 1))], sc
                    )
                    s_csc[nd(g, sel(ok, nid, N))] = sc
                    s_cpr[nd(g, sel(ok, nid, N))] = p
                    upd = ok & (max_scs[g] <= sc)
                    nmi.append(jnp.where(upd, nid, max_ids[g]))
                    nms.append(jnp.where(upd, sc, max_scs[g]))
                return tuple(nmi), tuple(nms)

            def cpass2(i2, c):
                return cpass(2 * i2 + 1, cpass(2 * i2, c))

            max_ids, _ = jax.lax.fori_loop(
                0, (cmax_nc + 1) // 2, cpass2,
                (
                    tuple(jnp.int32(0) for _ in rg),
                    tuple(jnp.int32(-(1 << 30)) for _ in rg),
                ),
            )

            # branch completion (generate_consensus.cuh: re-pick when the
            # heaviest node is not a sink)
            def bc_cond(c):
                max_ids, loops, dones = c
                return _anys([~dones[g] for g in rg])

            def bc_body(c):
                max_ids, loops, dones = c
                nmi, nlp, ndn = [], [], []
                for g in rg:
                    act = ~dones[g]
                    mid = max_ids[g]
                    nid = cn(
                        s_sort[nd(g, cn(s_pos[nd(g, mid)], N - 1))], N - 1
                    )
                    obound = jnp.where(act, cn(s_outc[nd(g, nid)], E), 0)

                    def clear_oe(e0, _):
                        out = cn(oe_get(g, nid * E + e0), N - 1)
                        ibound = cn(s_inc[nd(g, out)], E)

                        def clear_ie(i0, _):
                            iid = cn(ie_get(ed(g, out * E + i0)), N - 1)
                            s_csc[nd(g, sel(iid != nid, iid, N))] = -1
                            return 0

                        jax.lax.fori_loop(0, ibound, clear_ie, 0)
                        return 0

                    jax.lax.fori_loop(0, obound, clear_oe, 0)
                    start = s_pos[nd(g, mid)]

                    def rescan(gp, carry):
                        m_id, m_sc = carry
                        ok = act & (gp > start) & (gp < cncs[g])
                        node = cn(s_sort[nd(g, cn(gp, N - 1))], N - 1)
                        pc = jnp.where(ok, cn(s_inc[nd(g, node)], E), 0)

                        def eb(e0, c2):
                            sc, p = c2
                            _b, ew = iew_get(ed(g, node * E + e0))
                            begin = cn(_b, N - 1)
                            skip = s_csc[nd(g, begin)] == -1
                            take = ~skip & (
                                (sc < ew)
                                | (
                                    (sc == ew)
                                    & (p != -1)
                                    & (
                                        s_csc[nd(g, cn(p, N - 1))]
                                        <= s_csc[nd(g, begin)]
                                    )
                                )
                            )
                            return (
                                jnp.where(take, ew, sc),
                                jnp.where(take, begin, p),
                            )

                        sc, p = jax.lax.fori_loop(
                            0, pc, eb, (jnp.int32(-1), jnp.int32(-1))
                        )
                        s_cpr[nd(g, sel(ok, node, N))] = p
                        sc = jnp.where(
                            p != -1, sc + s_csc[nd(g, cn(p, N - 1))], sc
                        )
                        s_csc[nd(g, sel(ok, node, N))] = sc
                        upd = ok & (m_sc <= sc)
                        return (
                            jnp.where(upd, node, m_id),
                            jnp.where(upd, sc, m_sc),
                        )

                    m_id, _ = jax.lax.fori_loop(
                        0, cmax_nc, rescan, (jnp.int32(0), jnp.int32(0))
                    )
                    mid2 = jnp.where(act, m_id, mid)
                    lp2 = loops[g] + act.astype(jnp.int32)
                    done2 = dones[g] | (
                        (s_outc[nd(g, mid2)] == 0) | (lp2 >= cncs[g])
                    )
                    nmi.append(mid2)
                    nlp.append(lp2)
                    ndn.append(done2)
                return tuple(nmi), tuple(nlp), tuple(ndn)

            dones0 = tuple(
                ~cacts[g] | (s_outc[nd(g, max_ids[g])] == 0) for g in rg
            )
            max_ids, loops, _ = jax.lax.while_loop(
                bc_cond, bc_body,
                (max_ids, tuple(jnp.int32(0) for _ in rg), dones0),
            )
            emit_oks = []
            for g in rg:
                fail = cacts[g] & (loops[g] >= cncs[g])
                sm[g * 8 + 1] = jnp.where(fail, 3, sm[g * 8 + 1])
                emit_oks.append(cacts[g] & ~fail)

            # emit consensus walking heaviest predecessors (BACKWARD order)
            def em_cond(c):
                nids, ks, dones = c
                return _anys([~dones[g] & (ks[g] < C) for g in rg])

            def em_body(c):
                nids, ks, dones = c
                nni, nks, ndn = [], [], []
                for g in rg:
                    ok = ~dones[g] & (ks[g] < C)
                    nid = nids[g]
                    abound = jnp.where(ok, cn(s_alc[nd(g, nid)], E), 0)

                    def cv(a0, acc):
                        return acc + s_cov[
                            nd(g, cn(al_get(g, nid * E + a0), N - 1))
                        ]

                    cov = jax.lax.fori_loop(0, abound, cv, s_cov[nd(g, nid)])
                    kc = cn(ks[g], C - 1)
                    cons_ref[g, 0, kc] = jnp.where(
                        ok, s_node[nd(g, nid)], cons_ref[g, 0, kc]
                    )
                    cov_ref[g, 0, kc] = jnp.where(ok, cov, cov_ref[g, 0, kc])
                    p = s_cpr[nd(g, nid)]
                    nni.append(jnp.where(ok & (p != -1), cn(p, N - 1), nid))
                    nks.append(ks[g] + ok.astype(jnp.int32))
                    ndn.append(dones[g] | (ok & (p == -1)))
                return tuple(nni), tuple(nks), tuple(ndn)

            nids_f, ks_f, _ = jax.lax.while_loop(
                em_cond, em_body,
                (
                    max_ids,
                    tuple(jnp.int32(0) for _ in rg),
                    tuple(~emit_oks[g] for g in rg),
                ),
            )
            for g in rg:
                clen_ref[g, 0, 0] = jnp.where(emit_oks[g], ks_f[g], 0)

    if MSA:
        assert G == 1, "MSA mode requires G == 1"
        STK = 2 * N + 8

        @pl.when(sm[1] == 0)
        def _msa():
            nc = sm[0]
            nseq = nss[0]

            def ini(i, _):
                s_mark[i] = 0
                s_chk[i] = 1
                return 0

            jax.lax.fori_loop(0, nc, ini, 0)

            # racon/SPOA-exact DFS ordering fused with the column map
            # (cudapoa_topsort.cuh:104 + cudapoa_generate_msa.cuh:35)
            def outer(i, col):
                def run(col):
                    s_stack[0] = i

                    def wc(c):
                        return c[0] >= 0

                    def wb(c):
                        top, col = c
                        nid = s_stack[top]
                        done = s_mark[nid] == 2

                        def pp(e0, t2):
                            b = ie_get(nid * E + e0)
                            push = (s_mark[b] != 2) & ~done
                            s_stack[jnp.where(push, t2 + 1, STK - 1)] = b
                            return t2 + push.astype(jnp.int32)

                        top2 = jax.lax.fori_loop(0, s_inc[nid], pp, top)
                        chk = s_chk[nid] == 1

                        def pa(a0, t2):
                            aid = al_get(0, nid * E + a0)
                            push = (s_mark[aid] != 2) & ~done & chk
                            s_stack[jnp.where(push, t2 + 1, STK - 1)] = aid
                            s_chk[jnp.where(push, aid, N)] = 0
                            return t2 + push.astype(jnp.int32)

                        top3 = jax.lax.fori_loop(0, s_alc[nid], pa, top2)
                        valid = done | (top3 == top)
                        emit = valid & ~done
                        s_mark[jnp.where(emit, nid, N)] = 2
                        s_mark[jnp.where((~valid) & (~done), nid, N)] = 1
                        emitc = emit & chk
                        s_col[jnp.where(emitc, nid, N)] = col

                        def ec(a0, _):
                            aid = al_get(0, nid * E + a0)
                            s_col[jnp.where(emitc, aid, N)] = col
                            return 0

                        jax.lax.fori_loop(0, s_alc[nid], ec, 0)
                        col = col + emitc.astype(jnp.int32)
                        top_new = jnp.where(valid, top - 1, top3)
                        return top_new, col

                    top_f, col = jax.lax.while_loop(wc, wb, (jnp.int32(0), col))
                    return col

                return jax.lax.cond(s_mark[i] == 0, run, lambda c: c, col)

            msa_len = jax.lax.fori_loop(0, nc, outer, jnp.int32(0))
            mlen_ref[0, 0, 0] = msa_len

            # per-sequence gapped rows (generateMSADevice,
            # cudapoa_generate_msa.cuh:56): prefill '-', then walk the
            # successor chain writing bases at the node columns
            def prefill(t, _):
                msa_ref[0, t // C, t % C] = 45  # '-'
                return 0

            jax.lax.fori_loop(0, S * C, prefill, 0)

            def emit_seq(sq, _):
                @pl.when(sq < nseq)
                def _():
                    def wc(c):
                        nid, steps = c
                        return (nid != -1) & (steps < N + 2)

                    def wb(c):
                        nid, steps = c
                        msa_ref[0, sq, s_col[nid]] = s_node[nid]
                        return s_next[nid * S + sq], steps + 1

                    jax.lax.while_loop(wc, wb, (s_begin[sq], jnp.int32(0)))

                return 0

            jax.lax.fori_loop(0, S, emit_seq, 0)

        @pl.when(sm[1] != 0)
        def _msa_err():
            mlen_ref[0, 0, 0] = 0

    for g in rg:
        err_ref[g, 0, 0] = sm[g * 8 + 1]


@functools.partial(
    jax.jit,
    static_argnames=(
        "S", "L", "N", "E", "A", "gap", "mismatch", "match", "interpret",
        "msa", "phases", "windows_per_step", "band_width", "band_alloc",
        "adaptive", "packed_seqs", "debug_scores_seq",
    ),
)
def poa_consensus_pallas(seqs, wts, lens, nseqs,
                         S: int, L: int, N: int, E: int, A: int,
                         gap: int = -8, mismatch: int = -6, match: int = 8,
                         interpret: bool | None = None, msa: bool = False,
                         phases: int = 0b11111, windows_per_step: int = 1,
                         band_width: int = 0, band_alloc: int | None = None,
                         adaptive: bool = False, packed_seqs: bool = False,
                         debug_scores_seq: int = -1):
    """Run the full POA chain, ``windows_per_step`` (G) windows per grid
    step. seqs/wts (B, S, L) i32, lens (B, S) i32, nseqs (B,) i32; B must
    be a multiple of G (pad with nseqs == 0 windows, which report err=1
    and are skipped in-kernel). Returns (consensus (B, C) i32 in BACKWARD
    order, coverage (B, C) i32, lengths (B,), err (B,)) and, when ``msa``,
    additionally (msa (B, S, C) i32 gapped rows, msa_len (B,)).

    Note: alignment lists share the per-node stride E with edge lists
    (A <= E is required; both are 50 in the reference).

    ``band_width`` > 0 selects the static-band NW variant
    (cudapoa_nw_banded.cuh semantics, bit-exact to poa/banded.py with
    adaptive=False); must be a positive multiple of 128. Windows whose
    traceback visits a merged-boundary cell (the reference's slot-0
    conflation, reachable only on degenerate inputs) report err=3 for a
    host banded rerun."""
    if A > E:
        raise ValueError("kernel requires max_alignments <= max_edges")
    if band_width and (band_width < 128 or band_width % 128):
        raise ValueError("band_width must be a positive multiple of 128")
    if band_alloc is None:
        band_alloc = band_width
    if band_width and (band_alloc % 128 or band_alloc < band_width):
        raise ValueError("band_alloc must be a multiple of 128 >= band_width")
    if band_width:
        # score/code rows are realigned with dynamic pltpu.roll, which is
        # miscompiled for non-pow2 vreg counts (see _pow2_lanes); lanes
        # past the dynamic band width are masked, so over-allocating is
        # semantics-free
        band_alloc = _pow2_lanes(band_alloc)
    if L % 4:
        raise ValueError("L must be a multiple of 4 (packed SMEM seqs)")
    if adaptive and not band_width:
        raise ValueError("adaptive banding requires band_width > 0")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # transfers ride a ~50 MB/s tunnel: accept narrow dtypes + broadcastable
    # weights and widen on device (jit body = device-side ops). Unit
    # weights (the common case) skip the per-base SMEM weight copy
    # entirely — the kernel substitutes the constant, halving the
    # per-window sequence SMEM and raising the windows-per-step budget.
    if packed_seqs:
        # (B, S, L/4) 2-bit packed upload -> unpack on device (4x fewer
        # H2D bytes through the tunnel). Unpacked values are base codes
        # 1..4 ((packed 2 bits) + 1) with positions past each read length
        # re-zeroed from ``lens`` — pad cells must never equal a base
        # (the banded read_pad guard cells compare as code 0,
        # banded.py:110-111), and code 0 would alias base 'A' otherwise.
        Bp, Sp, L4 = seqs.shape
        parts = [((seqs >> (2 * i)) & 3) + 1 for i in range(4)]
        seqs = jnp.stack(parts, axis=3).reshape(Bp, Sp, 4 * L4)
        pos_l = jnp.arange(4 * L4, dtype=jnp.int32)[None, None, :]
        seqs = jnp.where(
            pos_l < lens.astype(jnp.int32)[:, :, None], seqs, 0
        )
    seqs = seqs.astype(jnp.int32)
    unit_w = wts.size == 1
    if unit_w:
        wts = jnp.zeros((seqs.shape[0], 1, 1), jnp.int32)
    else:
        wts = jnp.broadcast_to(wts.astype(jnp.int32), seqs.shape)
    G = windows_per_step
    if msa and G != 1:
        raise ValueError("MSA mode requires windows_per_step == 1")
    B = seqs.shape[0]
    if B % G:
        raise ValueError("batch must be a multiple of windows_per_step")
    C = N
    Lp = _roundup(L + 1, 128)
    K = N + L
    MN = N + 8
    ME = N * E + 8
    MEH = (N * E) // 2 + 8
    KP = K + 8
    R1 = N + 1
    pack_ew = unit_w  # fused in-edge id/weight words need tiny weights

    kernel = functools.partial(
        _poa_kernel,
        S=S, L=L, N=N, E=E, A=A, C=C, Lp=Lp,
        gap=gap, mismatch=mismatch, match=match, MSA=msa, G=G, PH=phases,
        INTERP=interpret, BAND=band_alloc if band_width else 0,
        BAND_CFG=band_width, ADAPT=adaptive, UNIT_W=unit_w,
        DBG=debug_scores_seq, PACK_EW=pack_ew,
    )
    # SMEM per-base sequence copy: four ASCII bytes per word (L % 4 == 0)
    _s4 = seqs.reshape(B, S, L // 4, 4)
    seqs_packed = (
        _s4[..., 0] | (_s4[..., 1] << 8) | (_s4[..., 2] << 16)
        | (_s4[..., 3] << 24)
    )
    Wv = band_alloc if band_width else Lp  # score/code row width

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((G, 1, S), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((G, S, L), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, S, L // 4), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (G, 1, 1) if unit_w else (G, S, L),
                lambda b: (b, 0, 0), memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((G, 1, C), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((G, 1, C), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((G, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((G, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ] + ([
            pl.BlockSpec((G, S, C), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((G, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ] if msa else []) + ([
            pl.BlockSpec((G, R1, Wv), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R1, Wv), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, R1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((G, 1, R1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ] if debug_scores_seq >= 0 else []),
        scratch_shapes=[
            pltpu.VMEM((G * R1, Wv), jnp.float32),  # scores
            pltpu.VMEM((G * R1, Wv), jnp.int32),    # codes
            pltpu.VMEM((G * R1,), jnp.float32),     # colv (col-rl extraction)
            pltpu.SMEM((G * MN,), jnp.int32),   # s_node
            pltpu.SMEM((G * MN,), jnp.int32),   # s_inc
            pltpu.SMEM((G * MN,), jnp.int32),   # s_outc
            pltpu.SMEM((G * MN,), jnp.int32),   # s_alc
            pltpu.SMEM((G * MN,), jnp.int32),   # s_cov
            pltpu.SMEM((G * MN,), jnp.int32),   # s_sort
            pltpu.SMEM((G * MN,), jnp.int32),   # s_pos
            pltpu.SMEM((G * MN,), jnp.int32),   # s_ocs
            pltpu.SMEM((G * MN,), jnp.int32),   # s_loc
            pltpu.SMEM((G * MN,), jnp.int32),   # s_csc
            pltpu.SMEM((G * MN,), jnp.int32),   # s_cpr
            pltpu.SMEM((G * ME,), jnp.int32),   # s_in_e (packs in_w if pack_ew)
        ] + ([] if pack_ew else [
            pltpu.SMEM((G * ME,), jnp.int32),   # s_in_w
        ]) + [
            pltpu.SMEM((G * MEH,), jnp.int32),  # s_out_e (2 ids/word)
            pltpu.SMEM((G * MEH,), jnp.int32),  # s_al (2 ids/word)
            pltpu.SMEM((G * KP,), jnp.int32),   # s_ag
            pltpu.SMEM((G * KP,), jnp.int32),   # s_ar
            pltpu.SMEM((8 * G + 8,), jnp.int32),    # sm (per-window scalars)
            pltpu.SMEM((G * R1,), jnp.float32),     # s_colv
            pltpu.SemaphoreType.DMA,                # colv DMA semaphore
        ] + ([
            pltpu.SMEM(((N + 1) * S + 8,), jnp.int32),  # s_next (+scrap row)
            pltpu.SMEM((S + 8,), jnp.int32),       # s_begin
            pltpu.SMEM((N + 8,), jnp.int32),       # s_mark
            pltpu.SMEM((N + 8,), jnp.int32),       # s_chk
            pltpu.SMEM((2 * N + 8,), jnp.int32),   # s_stack
            pltpu.SMEM((N + 8,), jnp.int32),       # s_col
        ] if msa else []) + ([
            pltpu.SMEM((G * R1 + 8,), jnp.float32),  # s_bnd (slot-0 bound)
            pltpu.SMEM((G * R1 + 8,), jnp.int32),    # s_c0c (boundary code)
            pltpu.SMEM((64,), jnp.float32),          # s_pow2 (exact divider)
        ] if band_width else []),
    )

    out = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, C), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ] + ([
            jax.ShapeDtypeStruct((B, S, C), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ] if msa else []) + ([
            jax.ShapeDtypeStruct((B, R1, Wv), jnp.float32),
            jax.ShapeDtypeStruct((B, R1, Wv), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, R1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, R1), jnp.int32),
        ] if debug_scores_seq >= 0 else []),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        nseqs.reshape(B, 1, 1).astype(jnp.int32),
        lens.reshape(B, 1, S).astype(jnp.int32),
        seqs, seqs_packed, wts,
    )
    cons, cov, clen, err = out[:4]
    # uint8 consensus/msa: 4x fewer D2H bytes (values are ASCII bases);
    # coverage too when its bound (S base + S*A aligned) fits a byte
    cov_out = cov[:, 0, :]
    if S * (A + 1) < 256:
        cov_out = cov_out.astype(jnp.uint8)
    base = (
        cons[:, 0, :].astype(jnp.uint8), cov_out,
        clen[:, 0, 0], err[:, 0, 0],
    )
    if msa:
        base = base + (out[4].astype(jnp.uint8), out[5][:, 0, 0])
    if debug_scores_seq >= 0:
        base = base + tuple(out[-4:])
    return base
