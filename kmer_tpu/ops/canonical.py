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


def _reverse_fields32(x: jnp.ndarray) -> jnp.ndarray:
    """Reverse the 16 two-bit fields of each uint32 lane (4 butterfly
    steps — stops at 2-bit granularity so bases stay intact)."""
    x = (x >> jnp.uint32(16)) | (x << jnp.uint32(16))
    x = ((x & jnp.uint32(0xFF00FF00)) >> jnp.uint32(8)) | \
        ((x & jnp.uint32(0x00FF00FF)) << jnp.uint32(8))
    x = ((x & jnp.uint32(0xF0F0F0F0)) >> jnp.uint32(4)) | \
        ((x & jnp.uint32(0x0F0F0F0F)) << jnp.uint32(4))
    x = ((x & jnp.uint32(0xCCCCCCCC)) >> jnp.uint32(2)) | \
        ((x & jnp.uint32(0x33333333)) << jnp.uint32(2))
    return x


def revcomp_words(words: list[jnp.ndarray], n_bases: int) -> list[jnp.ndarray]:
    """Reverse-complement keys from FORWARD keys by pure bit tricks —
    no second pass over the code matrix (rc_kmer_lanes re-slices it
    2k more times).  complement = bitwise NOT per 2-bit field; reversal
    = per-word butterfly + word swap + a (32W - 2k)-bit realign shift.
    """
    W = len(words)
    bits = 2 * n_bases
    rev = [_reverse_fields32(~w) for w in reversed(words)]
    sh = 32 * W - bits
    if sh == 32:
        out = [jnp.zeros_like(rev[0])] + rev[:-1]
    elif sh:
        out = []
        for i in range(W):
            w = rev[i] >> jnp.uint32(sh)
            if i > 0:
                w = w | (rev[i - 1] << jnp.uint32(32 - sh))
            out.append(w)
    else:
        out = rev
    s = bits - 32 * (W - 1)
    if s < 32:
        out[0] = out[0] & jnp.uint32((1 << s) - 1)
    return out


def canonical_kmer_lanes(codes: jnp.ndarray, lengths: jnp.ndarray, k: int,
                         *, limits: jnp.ndarray | None = None,
                         mask_ambiguous: bool = False):
    """min(forward, revcomp) key per lane; sentinel on invalid lanes.

    The RC key is derived from the forward key by bit tricks
    (revcomp_words) — measured cheaper than a second slice-sum over the
    code matrix.  Ambiguity poisoning (skip_invalid) still needs the
    slice-level mask, which the forward extraction provides.
    """
    fwd, valid = kmer_lanes(codes, lengths, k, limits=limits, sentinel=False,
                            mask_ambiguous=mask_ambiguous)
    # ambiguity codes are masked to 2 bits inside the extraction, so
    # amb-poisoned lanes hold well-formed (garbage) keys with
    # valid=False — the sentinel overwrite below disposes of them
    rc = revcomp_words(fwd, k)
    mn = lex_min(fwd, rc)
    return [jnp.where(valid, w, SENTINEL) for w in mn], valid
