"""Batch API for partial-order alignment — the cudapoa ``Batch`` surface.

Mirrors the reference public API (cudapoa/include/.../batch.hpp:46-204:
``Entry``/``Group``/``BatchConfig``/``Batch`` with add_poa_group ->
generate_poa -> get_consensus/get_msa/get_graphs/reset; enums
cudapoa.hpp:34-85; decode_error src/cudapoa.cpp:37) on top of the batched
TPU implementation in ``jax_poa``. Where the reference plans one pinned
host block + one device block and derives ``max_poas_`` from free GPU
memory (allocate_block.hpp), the TPU build packs groups into fixed-shape
padded tensors at generate_poa() time — XLA owns device memory, so batch
capacity is a direct parameter rather than a memory plan.
"""

from __future__ import annotations

import dataclasses
import enum

import numpy as np

from genomeworks_tpu.core.graph import DirectedGraph
from genomeworks_tpu.poa import jax_poa
from genomeworks_tpu.poa.cpu_reference import MAX_NODE_EDGES, MAX_NODE_ALIGNMENTS


class StatusType(enum.IntEnum):
    """cudapoa.hpp:34-53 StatusType."""

    success = 0
    exceeded_maximum_poas = 1
    exceeded_maximum_sequence_size = 2
    exceeded_maximum_sequences_per_poa = 3
    node_count_exceeded_maximum_graph_size = 4
    edge_count_exceeded_maximum_graph_size = 5
    exceeded_adaptive_banded_matrix_size = 6
    exceeded_maximum_predecessor_distance = 7
    loop_count_exceeded_upper_bound = 8
    output_type_unavailable = 9
    zero_weighted_poa_sequence = 10
    empty_poa_group = 11
    generic_error = 12


class BandMode(enum.IntEnum):
    """cudapoa.hpp:68-75 BandMode."""

    full_band = 0
    static_band = 1
    adaptive_band = 2
    static_band_traceback = 3
    adaptive_band_traceback = 4


class OutputType(enum.IntFlag):
    """cudapoa.hpp:80-84 OutputType."""

    consensus = 0x1
    msa = 0x2


_DECODE = {
    StatusType.exceeded_maximum_poas: (
        "Kernel Error: Number of groups per batch exceeded maximum POAs.",
        "Suggestion  : Increase the batch's max_poas capacity.",
    ),
    StatusType.exceeded_maximum_sequence_size: (
        "Kernel Error: Input read length or output consensus/MSA sequence length exceeded max sequence size.",
        "Suggestion  : Check BatchConfig.max_sequence_size and BatchConfig.max_consensus_size, increase if necessary.",
    ),
    StatusType.exceeded_maximum_sequences_per_poa: (
        "Kernel Error: Exceeded maximum number of reads per POA.",
        "Suggestion  : Check BatchConfig.max_sequences_per_poa and increase if necessary.",
    ),
    StatusType.node_count_exceeded_maximum_graph_size: (
        "Kernel Error: Node count exceeded maximum nodes per POA graph.",
        "Suggestion  : Check BatchConfig.max_nodes_per_graph and increase if necessary.",
    ),
    StatusType.edge_count_exceeded_maximum_graph_size: (
        "Kernel Error: Edge count exceeded maximum edges per graph.",
        "Suggestion  : Check default value of MAX_NODE_EDGES, note that increasing it increases memory per POA.",
    ),
    StatusType.exceeded_adaptive_banded_matrix_size: (
        "Kernel Error: Allocated buffer for score/traceback matrix in adaptive banding is not large enough.",
        "Suggestion  : Check BatchConfig.matrix_sequence_dimension and increase if necessary.",
    ),
    StatusType.exceeded_maximum_predecessor_distance: (
        "Kernel Error: Set value for maximum predecessor distance in Needleman-Wunsch algorithm with traceback buffer is not large enough.",
        "Suggestion  : Check BatchConfig.max_banded_pred_distance and increase if necessary.",
    ),
    StatusType.loop_count_exceeded_upper_bound: (
        "Kernel Error: Traceback in Needleman-Wunsch algorithm failed.",
        "Suggestion  : You may retry with a different banding mode.",
    ),
    StatusType.output_type_unavailable: (
        "Kernel Error: Output type not available.",
        "Suggestion  : Check MSA/Consensus selection for output type.",
    ),
    StatusType.zero_weighted_poa_sequence: (
        "Error      : Input sequence has all zero base weights.",
        "Suggestion : Check base weights of POA group sequences on host.",
    ),
    StatusType.empty_poa_group: (
        "Error      : No sequence was added to POA group.",
        "Suggestion : Check status vector in Batch.add_poa_group().",
    ),
    StatusType.generic_error: ("Unknown error.", ""),
}


def decode_error(error_type: StatusType) -> tuple[str, str]:
    """cudapoa.hpp:55 / src/cudapoa.cpp:37 — (message, hint) for a status."""
    if error_type == StatusType.success:
        return ("Success.", "")
    try:
        return _DECODE[StatusType(error_type)]
    except (KeyError, ValueError):
        raise RuntimeError("Unknown error type detected.")


def _align_up(x: int, to: int) -> int:
    return ((x + to - 1) // to) * to


CELLS_PER_THREAD = 4  # cudapoa_structs.cuh CUDAPOA_CELLS_PER_THREAD
MIN_BAND_WIDTH = 128  # cudapoa_structs.cuh CUDAPOA_MIN_BAND_WIDTH
BANDED_MATRIX_RIGHT_PADDING = 8  # cudapoa_structs.cuh (CELLS_PER_THREAD * 2)


@dataclasses.dataclass
class BatchConfig:
    """Upper limits for a POA batch (batch.hpp:60-86, ctor batch.cu:34-71).

    Constructed from (max_sequence_size, max_sequences_per_poa, band_width,
    band_mode) with the reference's derivations: consensus cap = 2x sequence
    size, graph cap = graph_length_factor x sequence size (4-aligned), band
    width 128-aligned, matrix dimension per band mode.
    """

    max_sequence_size: int = 1024
    max_sequences_per_poa: int = 100
    band_width: int = 256
    band_mode: BandMode = BandMode.full_band
    adaptive_storage_factor: float = 2.0
    graph_length_factor: float = 3.0
    max_pred_distance: int = 0

    def __post_init__(self):
        self.max_consensus_size = 2 * self.max_sequence_size
        self.alignment_band_width = _align_up(self.band_width, MIN_BAND_WIDTH)
        self.max_nodes_per_graph = _align_up(
            int(self.graph_length_factor * self.max_sequence_size),
            CELLS_PER_THREAD,
        )
        if self.band_mode == BandMode.full_band:
            self.matrix_sequence_dimension = _align_up(
                self.max_sequence_size, CELLS_PER_THREAD
            )
        elif self.band_mode in (BandMode.static_band, BandMode.static_band_traceback):
            self.matrix_sequence_dimension = _align_up(
                self.alignment_band_width + BANDED_MATRIX_RIGHT_PADDING,
                CELLS_PER_THREAD,
            )
        else:
            self.matrix_sequence_dimension = _align_up(
                int(
                    self.adaptive_storage_factor
                    * (self.alignment_band_width + BANDED_MATRIX_RIGHT_PADDING)
                ),
                CELLS_PER_THREAD,
            )
        self.max_banded_pred_distance = (
            self.max_pred_distance
            if self.max_pred_distance > 0
            else 2 * self.alignment_band_width
        )
        if self.max_sequence_size <= 0 or self.max_sequences_per_poa <= 0:
            raise ValueError("BatchConfig sizes must be positive")


# internal jax_poa error code -> public StatusType
_JAX_STATUS = {
    0: StatusType.success,
    1: StatusType.node_count_exceeded_maximum_graph_size,
    2: StatusType.edge_count_exceeded_maximum_graph_size,
    3: StatusType.loop_count_exceeded_upper_bound,
}

_next_batch_id = 0


class PoaBatch:
    """TPU POA batch: add_poa_group -> generate_poa -> get_* (cudapoa
    ``Batch``, cudapoa_batch.cuh:60). Groups are lists of (sequence,
    weights|None) pairs or plain strings."""

    def __init__(
        self,
        batch_config: BatchConfig | None = None,
        output_mask: OutputType = OutputType.consensus,
        gap_score: int = -8,
        mismatch_score: int = -6,
        match_score: int = 8,
        max_poas: int | None = None,
        strict_banded: bool = True,
    ) -> None:
        """``strict_banded`` (default True): when the config selects a
        banded mode, run the exact banded-NW chain (cudapoa_nw_banded.cuh
        semantics — the in-kernel static/adaptive band with shift rerun on
        TPU, the host chain elsewhere). Set False to treat banded modes as
        a performance hint and run the full-band kernel instead (full band
        is at least as accurate; banding exists for speed/fit)."""
        global _next_batch_id
        self.strict_banded = strict_banded
        self.batch_config = batch_config or BatchConfig()
        self.output_mask = OutputType(output_mask)
        self.gap_score = gap_score
        self.mismatch_score = mismatch_score
        self.match_score = match_score
        self.max_poas = max_poas
        self._batch_id = _next_batch_id
        _next_batch_id += 1
        self.reset()

    # -- assembly ------------------------------------------------------------
    def batch_id(self) -> int:
        return self._batch_id

    def get_total_poas(self) -> int:
        return len(self._groups)

    def add_poa_group(self, group) -> tuple[StatusType, list[StatusType]]:
        """Add one POA group. ``group`` is a list of sequences (str) or
        (sequence, weights) pairs. Returns (group status, per-seq status);
        entries violating batch limits are skipped, the rest are added
        (batch.hpp:102-117 semantics)."""
        if self.max_poas is not None and len(self._groups) >= self.max_poas:
            return StatusType.exceeded_maximum_poas, []
        cfg = self.batch_config
        seqs: list[str] = []
        wts: list[np.ndarray] = []
        per_seq: list[StatusType] = []
        for i, entry in enumerate(group):
            if isinstance(entry, tuple):
                seq, w = entry
            else:
                seq, w = entry, None
            if i >= cfg.max_sequences_per_poa:
                per_seq.append(StatusType.exceeded_maximum_sequences_per_poa)
                continue
            if len(seq) > cfg.max_sequence_size:  # cudapoa_batch.cuh:477
                per_seq.append(StatusType.exceeded_maximum_sequence_size)
                continue
            if w is None:
                w = np.ones(len(seq), dtype=np.int32)
            else:
                w = np.asarray(w, dtype=np.int32)
                if len(w) != len(seq):
                    per_seq.append(StatusType.generic_error)
                    continue
                if len(w) and not w.any():
                    per_seq.append(StatusType.zero_weighted_poa_sequence)
                    continue
            seqs.append(seq)
            wts.append(w)
            per_seq.append(StatusType.success)
        if not seqs:
            return StatusType.empty_poa_group, per_seq
        self._groups.append(seqs)
        self._weights.append(wts)
        self._generated = False
        return StatusType.success, per_seq

    # -- compute ---------------------------------------------------------------
    def generate_poa(self) -> None:
        """Run the batched POA over all added groups (Batch::generate_poa,
        cudapoa_batch.cuh:160). Consensus-only batches run the per-window
        Pallas kernel; MSA batches build the full lockstep graph state."""
        if not self._groups:
            raise RuntimeError("generate_poa on empty batch")
        cfg = self.batch_config
        self._consensus_cache = None
        self._msa_cache = None
        if self.strict_banded and cfg.band_mode != BandMode.full_band:
            self._generate_banded_strict()
            return
        if self.output_mask & OutputType.msa:
            import jax

            fits = jax_poa._pallas_poa_plan(
                self._groups, cfg.max_nodes_per_graph,
                MAX_NODE_EDGES, MAX_NODE_ALIGNMENTS, True,
            )
            if jax.default_backend() != "cpu" and fits is not None:
                # per-window Pallas kernel computes MSA (and consensus if
                # also requested) without materializing lockstep state
                msa, status = jax_poa.poa_batch_msa(
                    self._groups,
                    gap=self.gap_score,
                    mismatch=self.mismatch_score,
                    match=self.match_score,
                    max_nodes=cfg.max_nodes_per_graph,
                    weights=self._weights,
                )
                out_m, out_ms = [], []
                for m, st in zip(msa, status):
                    if st != 0:
                        out_m.append([])
                        out_ms.append(_JAX_STATUS.get(st, StatusType.generic_error))
                    elif m and len(m[0]) >= cfg.max_consensus_size:
                        out_m.append([])
                        out_ms.append(StatusType.exceeded_maximum_sequence_size)
                    else:
                        out_m.append(m)
                        out_ms.append(StatusType.success)
                self._msa_cache = (out_m, out_ms)
                if self.output_mask & OutputType.consensus:
                    cons, cov, cst = jax_poa.poa_batch_consensus(
                        self._groups,
                        gap=self.gap_score,
                        mismatch=self.mismatch_score,
                        match=self.match_score,
                        max_nodes=cfg.max_nodes_per_graph,
                        weights=self._weights,
                    )
                    self._consensus_cache = (
                        cons,
                        cov,
                        [_JAX_STATUS.get(s, StatusType.generic_error) for s in cst],
                    )
                self._state = None
                self._nseqs = None
                self._generated = True
                return
            state, nseqs = jax_poa.build_windows_graphs(
                self._groups,
                gap=self.gap_score,
                mismatch=self.mismatch_score,
                match=self.match_score,
                max_nodes=cfg.max_nodes_per_graph,
                weights=self._weights,
                msa=True,
            )
            self._state = state
            self._nseqs = nseqs
        else:
            cons, cov, status = jax_poa.poa_batch_consensus(
                self._groups,
                gap=self.gap_score,
                mismatch=self.mismatch_score,
                match=self.match_score,
                max_nodes=cfg.max_nodes_per_graph,
                weights=self._weights,
            )
            out_c, out_v, out_s = [], [], []
            for c, v, s in zip(cons, cov, status):
                if s != 0:
                    out_c.append("")
                    out_v.append(np.zeros(0, np.int32))
                    out_s.append(_JAX_STATUS.get(s, StatusType.generic_error))
                elif len(c) >= cfg.max_consensus_size:
                    out_c.append("")
                    out_v.append(np.zeros(0, np.int32))
                    out_s.append(StatusType.exceeded_maximum_sequence_size)
                else:
                    out_c.append(c)
                    out_v.append(v)
                    out_s.append(StatusType.success)
            self._consensus_cache = (out_c, out_v, out_s)
            self._state = None
            self._nseqs = None
        self._generated = True

    def _generate_banded_strict(self) -> None:
        """Exact banded-NW chain per window (cudapoa_nw_banded.cuh +
        rerun protocol). Static-band consensus runs the TPU kernel's
        banded NW variant (ops/poa_pallas.py, bit-exact to poa/banded.py)
        with per-window host fallback; other combinations run the host
        chain directly."""
        import jax

        from genomeworks_tpu.poa.cpu_reference import PoaError, poa_consensus, poa_msa

        cfg = self.batch_config
        mode = {
            BandMode.static_band: "static_band",
            BandMode.adaptive_band: "adaptive_band",
            BandMode.static_band_traceback: "static_band_traceback",
            BandMode.adaptive_band_traceback: "adaptive_band_traceback",
        }[cfg.band_mode]
        tb_mode = cfg.band_mode in (
            BandMode.static_band_traceback, BandMode.adaptive_band_traceback
        )

        if not tb_mode and jax.default_backend() != "cpu":
            # device banded chain: consensus and/or MSA both run the
            # banded Pallas kernel (the reference instantiates every
            # band mode x output type on device,
            # cudapoa_kernels.cuh:613-1053); r4 dropped banded MSA to a
            # per-window host loop
            if self.output_mask & OutputType.consensus:
                cons, cov, cst = jax_poa.poa_batch_consensus_banded(
                    self._groups,
                    gap=self.gap_score,
                    mismatch=self.mismatch_score,
                    match=self.match_score,
                    max_nodes=cfg.max_nodes_per_graph,
                    band_width=cfg.alignment_band_width,
                    weights=self._weights,
                    band_mode=mode,
                )
                self._consensus_cache = (
                    [c if s == 0 else "" for c, s in zip(cons, cst)],
                    [
                        v if s == 0 else np.zeros(0, np.int32)
                        for v, s in zip(cov, cst)
                    ],
                    [_JAX_STATUS.get(s, StatusType.generic_error) for s in cst],
                )
            if self.output_mask & OutputType.msa:
                msa, mst = jax_poa.poa_batch_msa_banded(
                    self._groups,
                    gap=self.gap_score,
                    mismatch=self.mismatch_score,
                    match=self.match_score,
                    max_nodes=cfg.max_nodes_per_graph,
                    band_width=cfg.alignment_band_width,
                    weights=self._weights,
                    band_mode=mode,
                )
                out_m, out_ms = [], []
                for m, st in zip(msa, mst):
                    if st != 0:
                        out_m.append([])
                        out_ms.append(
                            _JAX_STATUS.get(st, StatusType.generic_error)
                        )
                    elif m and len(m[0]) >= cfg.max_consensus_size:
                        out_m.append([])
                        out_ms.append(StatusType.exceeded_maximum_sequence_size)
                    else:
                        out_m.append(m)
                        out_ms.append(StatusType.success)
                self._msa_cache = (out_m, out_ms)
            self._state = None
            self._nseqs = None
            self._generated = True
            return
        kw = dict(
            gap=self.gap_score, mismatch=self.mismatch_score,
            match=self.match_score, max_nodes=cfg.max_nodes_per_graph,
            band_mode=mode, band_width=cfg.alignment_band_width,
        )
        if tb_mode:
            # cudapoa_nw_tb_banded.cuh rolling score-buffer height
            kw["max_pred_distance"] = cfg.max_banded_pred_distance
        _ERR = {
            "node_count_exceeded_maximum_graph_size": StatusType.node_count_exceeded_maximum_graph_size,
            "edge_count_exceeded_maximum_graph_size": StatusType.edge_count_exceeded_maximum_graph_size,
            "exceeded_adaptive_banded_matrix_size": StatusType.exceeded_adaptive_banded_matrix_size,
            "exceeded_maximum_predecessor_distance": StatusType.exceeded_maximum_predecessor_distance,
            "loop_count_exceeded_upper_bound": StatusType.loop_count_exceeded_upper_bound,
        }
        want_cons = bool(self.output_mask & OutputType.consensus)
        want_msa = bool(self.output_mask & OutputType.msa)
        out_c, out_v, out_s = [], [], []
        out_m, out_ms = [], []
        for g_i, seqs in enumerate(self._groups):
            w = self._weights[g_i]
            try:
                if want_cons:
                    c, v = poa_consensus(seqs, w, **kw)
                    out_c.append(c)
                    out_v.append(v)
                    out_s.append(StatusType.success)
                if want_msa:
                    out_m.append(poa_msa(seqs, w, **kw))
                    out_ms.append(StatusType.success)
            except PoaError as e:
                st = _ERR.get(str(e), StatusType.generic_error)
                if want_cons:
                    out_c.append("")
                    out_v.append(np.zeros(0, np.int32))
                    out_s.append(st)
                if want_msa:
                    out_m.append([])
                    out_ms.append(st)
        if want_cons:
            self._consensus_cache = (out_c, out_v, out_s)
        if want_msa:
            self._msa_cache = (out_m, out_ms)
        self._state = None
        self._nseqs = None
        self._generated = True

    def _require_generated(self):
        if not self._generated:
            raise RuntimeError("call generate_poa() first")

    def get_consensus(self):
        """Returns (consensus list, coverage list, per-window StatusType)."""
        self._require_generated()
        if not (self.output_mask & OutputType.consensus):
            n = len(self._groups)
            return [""] * n, [np.zeros(0, np.int32)] * n, [
                StatusType.output_type_unavailable
            ] * n
        if self._consensus_cache is None:
            import jax.numpy as jnp

            B = len(self._groups)
            cons, cov, length, err = jax_poa.consensus_batched(
                self._state, jnp.ones(B, dtype=bool)
            )
            cons = np.asarray(cons)
            cov = np.asarray(cov)
            length = np.asarray(length)
            err = np.asarray(err)
            out_c, out_v, out_s = [], [], []
            for b in range(B):
                if err[b] != 0:
                    out_c.append("")
                    out_v.append(np.zeros(0, np.int32))
                    out_s.append(_JAX_STATUS.get(int(err[b]), StatusType.generic_error))
                else:
                    k = int(length[b])
                    if k >= self.batch_config.max_consensus_size:
                        # consensus longer than the configured cap
                        # (cudapoa_generate_consensus.cuh emits
                        # exceeded_maximum_sequence_size in-kernel)
                        out_c.append("")
                        out_v.append(np.zeros(0, np.int32))
                        out_s.append(StatusType.exceeded_maximum_sequence_size)
                        continue
                    out_c.append(
                        bytes(cons[b, :k][::-1].astype(np.uint8)).decode("latin1")
                    )
                    out_v.append(cov[b, :k][::-1].copy())
                    out_s.append(StatusType.success)
            self._consensus_cache = (out_c, out_v, out_s)
        return self._consensus_cache

    def get_msa(self):
        """Returns (list of per-window MSA row lists, per-window status)."""
        self._require_generated()
        if not (self.output_mask & OutputType.msa):
            n = len(self._groups)
            return [[]] * n, [StatusType.output_type_unavailable] * n
        if self._msa_cache is None:
            err = np.asarray(self._state["error"])
            node_count = np.asarray(self._state["node_count"])
            nodes = np.asarray(self._state["nodes"])
            in_edges = np.asarray(self._state["in_edges"])
            in_count = np.asarray(self._state["in_count"])
            al = np.asarray(self._state["al"])
            al_count = np.asarray(self._state["al_count"])
            seq_next = np.asarray(self._state["seq_next"])
            begin = np.asarray(self._state["begin"])
            out_msa, out_status = [], []
            for b in range(len(self._groups)):
                if err[b] != 0:
                    out_msa.append([])
                    out_status.append(
                        _JAX_STATUS.get(int(err[b]), StatusType.generic_error)
                    )
                    continue
                n = int(node_count[b])
                node_to_col, msa_len = jax_poa._racon_sort_host(
                    n, in_edges[b], in_count[b], al[b], al_count[b]
                )
                if msa_len >= self.batch_config.max_consensus_size:
                    out_msa.append([])
                    out_status.append(StatusType.exceeded_maximum_sequence_size)
                    continue
                ns = int(self._nseqs[b])
                cur = begin[b, :ns].copy()
                rows = np.full((ns, msa_len), ord("-"), dtype=np.uint8)
                live = np.ones(ns, dtype=bool)
                sidx = np.arange(ns)
                while live.any():
                    c = np.clip(cur, 0, n - 1)
                    rows[live, node_to_col[c[live]]] = nodes[b][c[live]]
                    nxt = seq_next[b][c, sidx]
                    cur = np.where(live, nxt, cur)
                    live = live & (cur != -1)
                out_msa.append([bytes(r).decode("latin1") for r in rows])
                out_status.append(StatusType.success)
            self._msa_cache = (out_msa, out_status)
        return self._msa_cache

    def get_graphs(self) -> tuple[list[DirectedGraph], list[StatusType]]:
        """Export each window's POA graph as a DirectedGraph with base
        labels and edge weights (Batch::get_graphs, cudapoa_batch.cuh:315)."""
        self._require_generated()
        if self._state is None:
            # consensus ran through the Pallas kernel, which does not export
            # graph arrays — build the lockstep graph state on demand
            self._state, self._nseqs = jax_poa.build_windows_graphs(
                self._groups,
                gap=self.gap_score,
                mismatch=self.mismatch_score,
                match=self.match_score,
                max_nodes=self.batch_config.max_nodes_per_graph,
                weights=self._weights,
            )
        err = np.asarray(self._state["error"])
        node_count = np.asarray(self._state["node_count"])
        nodes = np.asarray(self._state["nodes"])
        in_edges = np.asarray(self._state["in_edges"])
        in_count = np.asarray(self._state["in_count"])
        in_w = np.asarray(self._state["in_w"])
        graphs: list[DirectedGraph] = []
        status: list[StatusType] = []
        for b in range(len(self._groups)):
            g = DirectedGraph()
            if err[b] != 0:
                graphs.append(g)
                status.append(_JAX_STATUS.get(int(err[b]), StatusType.generic_error))
                continue
            n = int(node_count[b])
            for nid in range(n):
                g.set_node_label(nid, chr(int(nodes[b, nid])))
                for e in range(int(in_count[b, nid])):
                    g.add_edge(int(in_edges[b, nid, e]), nid, int(in_w[b, nid, e]))
            graphs.append(g)
            status.append(StatusType.success)
        return graphs, status

    def reset(self) -> None:
        """Clear all groups and results (Batch::reset)."""
        self._groups: list[list[str]] = []
        self._weights: list[list[np.ndarray]] = []
        self._state = None
        self._nseqs = None
        self._generated = False
        self._consensus_cache = None
        self._msa_cache = None


def create_batch(
    batch_config: BatchConfig | None = None,
    output_mask: OutputType = OutputType.consensus,
    gap_score: int = -8,
    mismatch_score: int = -6,
    match_score: int = 8,
    max_poas: int | None = None,
) -> PoaBatch:
    """Factory mirroring cudapoa create_batch (batch.cu:116). Device/stream
    arguments have no TPU analogue: XLA owns placement and async dispatch."""
    return PoaBatch(
        batch_config, output_mask, gap_score, mismatch_score, match_score, max_poas
    )
