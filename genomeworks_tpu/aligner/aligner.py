"""Batched aligner API.

Reference: cudaaligner/include/.../aligner.hpp:62-219 (``Aligner`` /
``FixedBandAligner``: add_alignment -> align_all -> get_alignments) and
src/aligner_global_myers_banded.cpp (the primary banded implementation with
dynamic buffer growth and band retry).

TPU design: alignments accumulate on host, are grouped into static-shape
length buckets (replacing the reference's byte-budget buffer planning), run
through the banded wavefront kernel per bucket, and band-edge failures are
retried at doubled band width (replacing the in-kernel widen-and-retry,
myers_gpu.cu:56,988).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from genomeworks_tpu.aligner.banded_nw import (
    band_offset,
    banded_nw_forward,
    traceback_host,
)
from genomeworks_tpu.aligner.types import Alignment, StatusType
from genomeworks_tpu.core.bucketing import next_pow2
from genomeworks_tpu.core.sequence import encode_bases, reverse_complement


@dataclasses.dataclass
class _Entry:
    query: str
    target: str


class Aligner:
    """Batched global (edit-distance) aligner with CIGAR output.

    Mirrors the reference Aligner lifecycle (aligner.hpp:76):
    ``add_alignment`` -> ``align_all`` -> ``get_alignments``; ``reset``
    clears the batch.
    """

    def __init__(
        self,
        max_bandwidth: int = 1024,
        max_query_length: int | None = None,
        max_target_length: int | None = None,
        max_alignments_per_launch: int = 512,
        use_pallas: bool | None = None,
        engine: str = "myers",
        ukkonen_p: int = 16,
    ):
        """``engine``: "myers" (bit-parallel banded Myers forward,
        ops/myers_banded_pallas.py — 32 cells per int32 op, the analogue
        of the reference's primary myers_banded_gpu path) or "nw" (the
        per-cell banded wavefront, ops/banded_nw_pallas.py). Both feed the
        same device RLE traceback and produce identical paths under the
        band-retry protocol.

        "myers_full" runs the same bit-parallel DP with the band spanning
        the whole matrix from the start (the reference's full-matrix
        myers_gpu path for short pairs, myers_gpu.cu:317-443) — exact
        with no retry ladder; prefer "myers" beyond a few kb.

        "ukkonen" is the reference's legacy Ukkonen band policy
        (cudaaligner/src/aligner_global_ukkonen.cpp, ukkonen_gpu.cu:40)
        on the same device DP: the band is sized up-front from the
        query/target length difference plus the radius ``ukkonen_p``
        (diagonals [min(0, diff) - p, max(0, diff) + p] — identical to
        ukkonen_cpu's band when W = |diff| + 2p + 1, see
        banded_nw.band_offset) and never grows: like the reference
        ukkonen aligner there is no retry; results are exact whenever the
        optimal path stays in that band (is_optimal reports it)."""
        self.max_bandwidth = max_bandwidth
        if use_pallas is None:
            import jax

            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas
        if engine not in ("myers", "nw", "ukkonen", "myers_full"):
            raise ValueError(f"unknown engine {engine!r}")
        self.engine = engine
        self.ukkonen_p = ukkonen_p
        self.max_query_length = max_query_length
        self.max_target_length = max_target_length
        self.max_alignments_per_launch = max_alignments_per_launch
        self._entries: list[_Entry] = []
        self._results: list[Alignment | None] = []

    # -- batch assembly ----------------------------------------------------
    def add_alignment(
        self,
        query: str,
        target: str,
        reverse_complement_query: bool = False,
        reverse_complement_target: bool = False,
    ) -> StatusType:
        """Queue one alignment (reference: aligner.hpp:90,
        aligner_global.cpp add_alignment incl. optional revcomp)."""
        if self.max_query_length is not None and len(query) > self.max_query_length:
            return StatusType.exceeded_max_length
        if self.max_target_length is not None and len(target) > self.max_target_length:
            return StatusType.exceeded_max_length
        if self.engine == "ukkonen" and self.max_target_length is not None:
            # Ukkonen band sizing is driven by the length difference; the
            # reference rejects oversized differences at add time rather
            # than allocating a huge band (aligner_global_ukkonen.cpp:30,
            # 53-58: |diff| > 0.1 * max_target_length).
            max_diff = int(self.max_target_length * 0.1)
            if abs(len(query) - len(target)) > max_diff:
                return StatusType.exceeded_max_alignment_difference
        if reverse_complement_query:
            query = reverse_complement(query)
        if reverse_complement_target:
            target = reverse_complement(target)
        self._entries.append(_Entry(query, target))
        return StatusType.success

    def reset(self) -> None:
        self._entries = []
        self._results = []

    # -- execution ----------------------------------------------------------
    def align_all(self) -> None:
        """Align every queued pair; bucket by length, retry band-limited
        alignments at doubled band width until optimal or full-width."""
        n = len(self._entries)
        self._results = [None] * n
        pending = list(range(n))
        band = None  # per-item initial bands assigned per bucket below

        # initial pass + retries with doubled bands
        todo = [(idx, self._initial_band(self._entries[idx])) for idx in pending]
        while todo:
            retry: list[tuple[int, int]] = []
            # group by (bucket_q, bucket_t, band)
            groups: dict[tuple[int, int, int], list[int]] = {}
            band_of: dict[int, int] = {}
            for idx, bw in todo:
                e = self._entries[idx]
                # one shared padded size for query and target keeps the set
                # of compiled kernel shapes small
                s = next_pow2(max(len(e.query), len(e.target), 1))
                bw = next_pow2(min(bw, self._full_band(e)))
                if self.use_pallas:
                    # Pallas kernel constraints: M % 128 == 0, W % 128 == 0
                    s = max(s, 128)
                    bw = max(bw, 128)
                band_of[idx] = bw
                groups.setdefault((s, s, bw), []).append(idx)
            for (mq, mt, bw), idxs in groups.items():
                for s in range(0, len(idxs), self.max_alignments_per_launch):
                    chunk = idxs[s : s + self.max_alignments_per_launch]
                    results = self._run_bucket(chunk, mq, mt, bw)
                    for idx, aln in zip(chunk, results):
                        full = bw >= self._full_band(self._entries[idx])
                        if full:
                            # band spans every diagonal: result is exact
                            aln.is_optimal = True
                        if (
                            aln.is_optimal
                            or bw >= self.max_bandwidth
                            or self.engine == "ukkonen"  # fixed band, no retry
                        ):
                            self._results[idx] = aln
                        else:
                            retry.append((idx, min(bw * 2, self.max_bandwidth)))
            todo = retry

    def get_alignments(self) -> list[Alignment]:
        return [r for r in self._results if r is not None]

    def get_device_alignments(self) -> "DeviceAlignments":
        """RLE CIGAR results as device arrays (reference:
        Aligner::get_device_alignments returning DeviceAlignmentsPtrs)."""
        return _alignments_to_device(self.get_alignments())

    # -- internals ----------------------------------------------------------
    def _initial_band(self, e: _Entry) -> int:
        diff = abs(len(e.query) - len(e.target))
        if self.engine == "myers_full":
            # full-matrix Myers (reference myers_gpu.cu:317-443 full path,
            # used for short pairs): the band spans every diagonal from
            # the start, so the result is exact with no retry ladder and
            # no max_bandwidth clamp
            return self._full_band(e)
        if self.engine == "ukkonen":
            # Ukkonen band sizing (aligner_global_ukkonen.cpp): diagonals
            # |j - i - diff_sign| within p of the length-difference path
            bw = diff + 2 * self.ukkonen_p + 1
            # clamp to max_bandwidth: without it a large length difference
            # (only possible when max_target_length is unset — add_alignment
            # rejects it otherwise) would size multi-GB device code planes;
            # the band-limited result reports is_optimal from the DP
            return min(bw, self.max_bandwidth, self._full_band(e))
        bw = max(64, next_pow2(diff + 1))
        return min(bw, self.max_bandwidth, self._full_band(e))

    @staticmethod
    def _full_band(e: _Entry) -> int:
        # band spanning every diagonal of the matrix => always optimal
        return len(e.query) + len(e.target) + 1

    def _run_bucket(self, idxs: list[int], mq: int, mt: int, bw: int) -> list[Alignment]:
        B = len(idxs)
        # the Pallas NW path wants the batch padded to a multiple of 8;
        # the bit-parallel Myers engine batches 128 alignments per vreg
        # lane. Long-sequence buckets always use the NW engine: its code
        # planes scale with the real batch (B x M/16 x W), while the myers
        # engine's column-major planes scale with the 128-padded batch
        # (M x W/32+3 x 128) — multi-GB at 100 kb lengths.
        engine = self.engine
        if engine == "ukkonen":
            engine = "myers"  # band policy only; primary kernel underneath
        if engine == "myers_full":
            engine = "myers"  # band = the whole matrix; same bit-parallel DP
        if engine == "myers" and mq > 8192:
            engine = "nw"
        if self.use_pallas and engine == "myers":
            B_pad = ((B + 127) // 128) * 128
        elif self.use_pallas:
            B_pad = ((B + 7) // 8) * 8
        else:
            B_pad = B
        q = np.zeros((B_pad, mq), dtype=np.uint8)
        t = np.zeros((B_pad, mt), dtype=np.uint8)
        # padded base codes must never spuriously match: pad query with 1,
        # target with 2 (padding cells are masked in the DP anyway)
        q += 1
        t += 2
        qlen = np.zeros(B_pad, dtype=np.int32)
        tlen = np.zeros(B_pad, dtype=np.int32)
        for r, idx in enumerate(idxs):
            e = self._entries[idx]
            qc = encode_bases(e.query)
            tc = encode_bases(e.target)
            q[r, : len(qc)] = qc
            t[r, : len(tc)] = tc
            qlen[r] = len(qc)
            tlen[r] = len(tc)

        dlo = np.asarray(band_offset(jnp.asarray(qlen), jnp.asarray(tlen), bw))
        use_pallas = self.use_pallas
        if use_pallas:
            try:
                return self._run_bucket_pallas(
                    idxs, engine, q, t, qlen, tlen, dlo, bw, B_pad
                )
            except Exception as exc:  # graceful degradation: the reference
                # skips OOM'd batches (main.cu:270-274); here a failed
                # kernel compile/launch (platform compile-helper crashes,
                # HBM exhaustion) re-runs the bucket through the XLA path
                import logging

                logging.getLogger("genomeworks_tpu").warning(
                    "pallas aligner bucket failed (%s); XLA fallback",
                    str(exc)[:120],
                )
        return self._run_bucket_xla(idxs, q, t, qlen, tlen, dlo, bw)

    def _run_bucket_pallas(
        self, idxs, engine, q, t, qlen, tlen, dlo, bw, B_pad
    ) -> list[Alignment]:
        if True:
            from genomeworks_tpu.ops.banded_nw_pallas import (
                banded_nw_forward_pallas,
                traceback_host_packed,
            )
            from genomeworks_tpu.ops.rle_traceback_pallas import (
                CHUNK_WORDS,
                LANES,
                ROWS_PER_WORD,
                rle_traceback_fits,
                rle_traceback_lockstep_pallas,
                rle_traceback_pallas,
            )

            from genomeworks_tpu.core.profiling import annotate

            if engine == "myers":
                from genomeworks_tpu.ops.myers_banded_pallas import (
                    myers_banded_forward_pallas,
                )

                with annotate("aligner/myers_forward"):
                    codes, fits = myers_banded_forward_pallas(
                        jnp.asarray(q), jnp.asarray(t), jnp.asarray(qlen),
                        jnp.asarray(tlen), bw,
                    )
            else:
                with annotate("aligner/nw_forward"):
                    codes, fits = banded_nw_forward_pallas(
                        jnp.asarray(q), jnp.asarray(t), jnp.asarray(qlen),
                        jnp.asarray(tlen), bw,
                    )
            if not rle_traceback_fits(q.shape[1], bw):
                # long-sequence bucket: one alignment's code plane exceeds
                # the RLE kernel's SMEM block. D2H only the REAL rows of
                # the chunk (not the lane-padded batch) and walk on host —
                # far cheaper than recompiling the whole bucket through
                # the XLA fallback.
                with annotate("aligner/host_traceback"):
                    codes_h = np.asarray(codes[: len(idxs)])
                    paths, edge = traceback_host_packed(
                        codes_h, qlen[: len(idxs)], tlen[: len(idxs)],
                        dlo[: len(idxs)], bw,
                    )
                return self._bucket_results(
                    idxs, paths, edge, np.asarray(fits)
                )
            # traceback stays on device; D2H is the RLE runs (~CIGAR-sized),
            # not the M/16 x W code planes (reference: myers_gpu.cu:444-530
            # emits RLE CIGARs device-side too)
            # batch-scale buckets walk 128 alignments per lane group in
            # lockstep (the scalar-chain kernel made the full pipeline
            # traceback-bound); small batches keep the scalar kernel
            M16 = q.shape[1] // ROWS_PER_WORD
            use_lockstep_tb = (
                B_pad >= LANES and M16 % CHUNK_WORDS == 0
            )
            tb_fn = (
                rle_traceback_lockstep_pallas if use_lockstep_tb
                else rle_traceback_pallas
            )
            with annotate("aligner/rle_traceback"):
                runs_d, nruns_d, _dist, edge_d, ovf_d = tb_fn(
                    codes, jnp.asarray(qlen), jnp.asarray(tlen),
                    jnp.asarray(dlo), bw,
                )
            runs_h = np.asarray(runs_d)
            nruns = np.asarray(nruns_d)
            edge = np.asarray(edge_d)
            ovf = np.asarray(ovf_d)
            paths = []
            codes_h = None
            for r in range(B_pad):
                if ovf[r]:
                    # >rcap runs: fall back to the host walk for this row
                    if codes_h is None:
                        codes_h = np.asarray(codes)
                    p, e = traceback_host_packed(
                        codes_h[r : r + 1], qlen[r : r + 1], tlen[r : r + 1],
                        dlo[r : r + 1], bw,
                    )
                    paths.append(p[0])
                    edge[r] |= e[0]
                    continue
                rr = runs_h[r, : nruns[r]][::-1]
                paths.append(
                    np.repeat((rr >> 28).astype(np.int8), rr & ((1 << 28) - 1))
                )
        return self._bucket_results(idxs, paths, edge, np.asarray(fits))

    def _run_bucket_xla(self, idxs, q, t, qlen, tlen, dlo, bw) -> list[Alignment]:
        dist, codes, fits = banded_nw_forward(
            jnp.asarray(q), jnp.asarray(t), jnp.asarray(qlen),
            jnp.asarray(tlen), bw,
        )
        paths, edge = traceback_host(np.asarray(codes), qlen, tlen, dlo, bw)
        return self._bucket_results(idxs, paths, edge, np.asarray(fits))

    def _bucket_results(self, idxs, paths, edge, fits) -> list[Alignment]:
        out = []
        for r, idx in enumerate(idxs):
            e = self._entries[idx]
            optimal = bool(fits[r]) and not bool(edge[r])
            out.append(
                Alignment(
                    query=e.query,
                    target=e.target,
                    states=paths[r],
                    status=StatusType.success,
                    is_optimal=optimal,
                )
            )
        return out


def create_aligner(max_bandwidth: int = 1024, **kwargs) -> Aligner:
    """Factory (reference: aligner.hpp create_aligner -> banded Myers)."""
    return Aligner(max_bandwidth=max_bandwidth, **kwargs)


class FixedBandAligner(Aligner):
    """Reference parity: FixedBandAligner (aligner.hpp:148) — an Aligner
    whose maximum bandwidth can be re-set between batches."""

    def reset_max_bandwidth(self, max_bandwidth: int) -> None:
        """Change the band ceiling; requires an empty batch (the reference
        invalidates any queued alignments, aligner.hpp:156-162 — here we
        enforce the stronger contract explicitly)."""
        if self._entries:
            raise RuntimeError(
                "reset_max_bandwidth with queued alignments; call reset() first"
            )
        self.max_bandwidth = max_bandwidth


@dataclasses.dataclass
class DeviceAlignments:
    """Device-resident alignment results — the TPU counterpart of the
    reference's ``DeviceAlignmentsPtrs`` (aligner.hpp:62): run-length
    encoded CIGAR buffers plus per-alignment metadata (bit 0 = is_optimal,
    aligner.hpp:67), all as device arrays for zero-copy downstream use."""

    cigar_ops: "jnp.ndarray"          # (total_runs,) int8 AlignmentState codes
    cigar_runlengths: "jnp.ndarray"   # (total_runs,) int32
    cigar_offsets: "jnp.ndarray"      # (n_alignments + 1,) int32
    metadata: "jnp.ndarray"           # (n_alignments,) int32

    def num_alignments(self) -> int:
        return int(self.cigar_offsets.shape[0]) - 1


def _alignments_to_device(alignments: "list[Alignment]") -> DeviceAlignments:
    ops: list[np.ndarray] = []
    runs: list[np.ndarray] = []
    offsets = [0]
    meta = np.zeros(len(alignments), dtype=np.int32)
    for i, aln in enumerate(alignments):
        states = np.asarray(aln.states, dtype=np.int8)
        if states.size:
            change = np.nonzero(states[1:] != states[:-1])[0] + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [len(states)]))
            ops.append(states[starts])
            runs.append((ends - starts).astype(np.int32))
            offsets.append(offsets[-1] + len(starts))
        else:
            offsets.append(offsets[-1])
        meta[i] = 1 if aln.is_optimal else 0
    cat = np.concatenate(ops) if ops else np.zeros(0, np.int8)
    rl = np.concatenate(runs) if runs else np.zeros(0, np.int32)
    return DeviceAlignments(
        jnp.asarray(cat), jnp.asarray(rl),
        jnp.asarray(np.asarray(offsets, dtype=np.int32)), jnp.asarray(meta),
    )
