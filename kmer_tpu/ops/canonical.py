"""Canonical k-mer selection — pure jnp bit ops on multi-word keys.

canonical(kmer) = lexicographic min(forward, reverse-complement).
The reference never canonicalizes (nothing in main.rs touches reverse
complements), so this is OFF in parity mode and a capability extension
for real k-mer counting workloads (BASELINE.json configs 2).
"""

from __future__ import annotations

import jax.numpy as jnp

from .extract import kmer_lanes, rc_kmer_lanes, SENTINEL


def lex_lt(a: list[jnp.ndarray], b: list[jnp.ndarray]) -> jnp.ndarray:
    """Elementwise a < b over W-word keys (MSW first)."""
    assert len(a) == len(b)
    lt = jnp.zeros(a[0].shape, bool)
    eq = jnp.ones(a[0].shape, bool)
    for aw, bw in zip(a, b):
        lt = lt | (eq & (aw < bw))
        eq = eq & (aw == bw)
    return lt


def lex_eq(a: list[jnp.ndarray], b: list[jnp.ndarray]) -> jnp.ndarray:
    eq = jnp.ones(a[0].shape, bool)
    for aw, bw in zip(a, b):
        eq = eq & (aw == bw)
    return eq


def lex_min(a: list[jnp.ndarray], b: list[jnp.ndarray]) -> list[jnp.ndarray]:
    take_a = lex_lt(a, b)
    return [jnp.where(take_a, aw, bw) for aw, bw in zip(a, b)]


def canonical_kmer_lanes(codes: jnp.ndarray, lengths: jnp.ndarray, k: int,
                         *, limits: jnp.ndarray | None = None,
                         mask_ambiguous: bool = False):
    """min(forward, revcomp) key per lane; sentinel on invalid lanes.

    Forward and RC keys are built by two slice-sums over the same code
    slices (extract.py) — XLA fuses both into one pass over the batch.
    """
    fwd, valid = kmer_lanes(codes, lengths, k, limits=limits, sentinel=False,
                            mask_ambiguous=mask_ambiguous)
    rc, _ = rc_kmer_lanes(codes, lengths, k, sentinel=False)
    mn = lex_min(fwd, rc)
    return [jnp.where(valid, w, SENTINEL) for w in mn], valid
