"""Genome/sequence simulators for tests and benchmarks.

Reference: common/base/include/.../utils/genomeutils.hpp:33-144
(generate_random_genome / generate_random_sequence: mutate, insert, delete
off a backbone) and pygenomeworks/genomeworks/simulators/genomesim.py
(Poisson/Markov genome simulators).
"""

from __future__ import annotations

import numpy as np

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def generate_random_genome(length: int, rng: np.random.Generator | None = None) -> str:
    """Uniform random ACGT genome (genomeutils.hpp:33)."""
    rng = rng or np.random.default_rng(0)
    return _BASES[rng.integers(0, 4, size=length)].tobytes().decode("ascii")


def mutate_sequence(
    backbone: str,
    rng: np.random.Generator | None = None,
    snv_rate: float = 0.02,
    indel_rate: float = 0.02,
    max_indel_len: int = 3,
) -> str:
    """Derive a mutated sequence from a backbone with substitutions and
    short indels (genomeutils.hpp:45 generate_random_sequence semantics)."""
    rng = rng or np.random.default_rng(0)
    out = []
    for ch in backbone:
        r = rng.random()
        if r < indel_rate / 2:
            # deletion: skip this base
            continue
        if r < indel_rate:
            # insertion: add 1..max_indel_len random bases then the base
            n = int(rng.integers(1, max_indel_len + 1))
            out.append(_BASES[rng.integers(0, 4, size=n)].tobytes().decode("ascii"))
        if rng.random() < snv_rate:
            out.append(chr(_BASES[rng.integers(0, 4)]))
        else:
            out.append(ch)
    return "".join(out)


class PoissonGenomeSimulator:
    """Uniform-base genome simulator
    (pygenomeworks genomesim.py:38 PoissonGenomeSimulator)."""

    def __init__(self, seed: int = 0):
        self._rng = np.random.default_rng(seed)

    def build_reference(self, reference_length: int) -> str:
        return generate_random_genome(reference_length, self._rng)


class MarkovGenomeSimulator:
    """First-order Markov-chain genome simulator
    (pygenomeworks genomesim.py:59 MarkovGenomeSimulator)."""

    def __init__(self, seed: int = 0):
        self._rng = np.random.default_rng(seed)

    def build_reference(
        self, reference_length: int, transitions: dict[str, dict[str, float]] | None = None
    ) -> str:
        bases = "ACGT"
        if transitions is None:
            probs = np.full((4, 4), 0.25)
        else:
            probs = np.array(
                [[transitions[a][b] for b in bases] for a in bases], dtype=np.float64
            )
            probs /= probs.sum(axis=1, keepdims=True)
        out = np.empty(reference_length, dtype=np.uint8)
        state = int(self._rng.integers(0, 4))
        for i in range(reference_length):
            state = int(self._rng.choice(4, p=probs[state]))
            out[i] = _BASES[state]
        return out.tobytes().decode("ascii")
