import gzip
windows = []
with gzip.open("/root/repo/tests/data/poa_windows_covid.txt.gz", "rt") as f:
    rem = 0
    for line in f:
        line = line.rstrip("\n")
        if rem == 0:
            rem = int(line); windows.append([])
        else:
            windows[-1].append(line); rem -= 1
        if len(windows) > 140 and rem == 0: break
golden = [l.rstrip("\n") for l in open("/root/repo/tests/data/poa_golden_covid.txt")]

import genomeworks_tpu.poa.jax_poa as jp

def run(ids, force_g=None, label=""):
    sub = [windows[i] for i in ids]
    if force_g:
        orig = jp._pallas_poa_plan
        def patched(*a, **k):
            r = orig(*a, **k)
            return (r[0], r[1], r[2], r[3], force_g) if r else r
        jp._pallas_poa_plan = patched
    try:
        cons, cov, st = jp.poa_batch_consensus(sub, use_pallas=True)
    finally:
        if force_g:
            jp._pallas_poa_plan = orig
    bad = [i for k, i in enumerate(ids) if cons[k] != golden[i]]
    print(label, "ids", ids, "G", force_g or "auto", "bad:", bad, flush=True)

run([106], label="alone")
run([106], force_g=1, label="alone-G1")
run([105, 106], label="pair")
run([106, 107], label="pair2")
run([105, 106, 107, 108, 109], force_g=1, label="group-G1")

# Findings (2026-08-17, v5e via axon tunnel):
# - covid golden window 106 (and ~199 of 5776) produce a slightly different
#   consensus from the COMPILED per-window Pallas kernel than from the CPU
#   reference, the XLA lockstep path, AND the same kernel in interpret mode
#   (all three agree with the committed golden).
# - reproduces with the window alone, at G=1, and with only the first 4
#   sequences (lens 219/199/194/188) — not a fusion/interference issue.
#
# ROOT CAUSE (found + fixed in round 3): not a Mosaic miscompile at all.
# The traceback-start column extraction uses an MXU dot_general on the f32
# score block; the MXU's DEFAULT f32 precision rounds operands through
# bf16 passes, so any score with more than ~8 significant mantissa bits
# comes back perturbed, flipping the argmax over sink rows for windows
# whose column maxima are close. Interpret mode (and the CPU/XLA paths)
# compute the dot exactly — hence compiled-only, data-dependent.
# Fix: precision=jax.lax.Precision.HIGHEST on both column-extraction dots
# (ops/poa_pallas.py, full-band + banded). This script now prints
# "bad: []" on every line; the full 5776-window golden passes on-chip.
#
# The BANDED kernel had two further compiled-only divergence sources,
# found by dumping per-sequence DP state (experiments/banded_dbg_bisect.py)
# and probing ops in isolation:
# - VPU f32 division is ~1 ulp off IEEE for 34% of small-int rationals;
#   the band gradient (rl+1)/(nc+1) feeds int(row*gradient) truncations.
#   Fixed with an exact integer restoring divider (_ieee_div_ints).
# - dynamic-shift pltpu.roll is miscompiled for vector widths with a
#   non-pow2 vreg count (384/640/768/1536 lanes: result off by one vreg
#   for every nonzero shift; 128/256/512/1024 correct). The banded NW
#   rolls the read row (width max(Lp, BAND), 384 at the bench shape) and
#   score rows by dynamic band-start deltas. Fixed by padding every
#   dynamically-rolled buffer to a pow2 lane count (_pow2_lanes).
