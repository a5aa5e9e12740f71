"""Host driver for the lockstep POA kernels (ops/poa_lockstep_pallas.py).

Graph state lives in "plane layout": one window per vector lane, 128
windows per group. A (B, N) per-window array becomes (NG, N, 128) with
NG = B / 128; edge lists (B, N, E) become (NG, E, N, 128) so the edge
slot is a leading (uniform) index and every in-kernel access is a
one-hot gather over N only.

The phase semantics are the parity-tested XLA lockstep chain in
poa.jax_poa (itself a port of the cudapoa kernels); this module provides
the layout conversions and the per-round kernel composition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from genomeworks_tpu.ops import poa_lockstep_pallas as lk

W = lk.W


def pad_groups(B: int) -> int:
    return (B + W - 1) // W


def to_planes(state, NG: int):
    """jax_poa graph state (leading dim B = NG*128) -> plane layout."""

    def t2(x):
        _, N = x.shape
        return jnp.transpose(x.reshape(NG, W, N), (0, 2, 1))

    def t3(x):
        _, N, E = x.shape
        return jnp.transpose(x.reshape(NG, W, N, E), (0, 3, 2, 1))

    def t1(x):
        return x.reshape(NG, 1, W)

    return {
        "nodes": t2(state["nodes"]),
        "in_count": t2(state["in_count"]),
        "out_count": t2(state["out_count"]),
        "al_count": t2(state["al_count"]),
        "cov": t2(state["cov"]),
        "sortp": t2(state["sorted"]),
        "pos": t2(state["pos_of"]),
        "in_e": t3(state["in_edges"]),
        "in_w": t3(state["in_w"]),
        "out_e": t3(state["out_edges"]),
        "al": t3(state["al"]),
        "node_count": t1(state["node_count"]),
        "error": t1(state["error"]),
    }


def from_planes(planes):
    """Plane layout -> jax_poa graph state layout."""

    def t2(x):
        NG, N, _ = x.shape
        return jnp.transpose(x, (0, 2, 1)).reshape(NG * W, N)

    def t3(x):
        NG, E, N, _ = x.shape
        return jnp.transpose(x, (0, 3, 2, 1)).reshape(NG * W, N, E)

    def t1(x):
        return x.reshape(-1)

    return {
        "nodes": t2(planes["nodes"]),
        "in_count": t2(planes["in_count"]),
        "out_count": t2(planes["out_count"]),
        "al_count": t2(planes["al_count"]),
        "cov": t2(planes["cov"]),
        "sorted": t2(planes["sortp"]),
        "pos_of": t2(planes["pos"]),
        "in_edges": t3(planes["in_e"]),
        "in_w": t3(planes["in_w"]),
        "out_edges": t3(planes["out_e"]),
        "al": t3(planes["al"]),
        "node_count": t1(planes["node_count"]),
        "error": t1(planes["error"]),
    }


def read_planes(seqs, lens, Lp: int):
    """(B, S, L) char codes + (B, S) lengths -> (NG, S, Lp, 128) read
    planes (sublane j holds read[j-1]; 0 elsewhere) + (NG, S, 128) lens."""
    B, S, L = seqs.shape
    NG = B // W
    iota = jnp.arange(Lp)[None, None, :]
    sh = jnp.zeros((B, S, Lp), seqs.dtype).at[:, :, 1 : L + 1].set(seqs)
    sh = jnp.where(iota <= lens[:, :, None], sh, 0)
    pl_ = jnp.transpose(sh.reshape(NG, W, S, Lp), (0, 2, 3, 1))
    ln = jnp.transpose(lens.reshape(NG, W, S), (0, 2, 1))
    return pl_, ln
