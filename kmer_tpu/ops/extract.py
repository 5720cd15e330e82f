"""Vectorized rolling-window k-mer extraction (jnp, TPU-first).

Replaces the reference's per-window string slicing + allocation hot loop
(k-mer-count/src/main.rs:63-81: 3.55M iterations, two UTF-8 checks and a
heap alloc each) with a static-shape slice-sum: the key contribution of
base offset j within the window is a single shifted slice of the code
matrix, so a k-mer key is built from k fused shift-or ops over (B, P)
lanes — no gather, no per-window work, fully on the VPU.

All shapes are static (XLA requirement): a read batch is a (B, L) uint8
code matrix plus a length vector; lanes whose window overruns the read
carry the all-ones sentinel key and sort to the end (the reference's
`r_end > len` break, main.rs:73-75, becomes a validity mask).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .encode import words_per_key

SENTINEL = jnp.uint32(0xFFFFFFFF)


def _apply_sentinel(words: list[jnp.ndarray], valid: jnp.ndarray) -> list[jnp.ndarray]:
    return [jnp.where(valid, w, SENTINEL) for w in words]


def _valid_mask(B, P, lengths, span, limits):
    pos = lax.broadcasted_iota(jnp.int32, (B, P), 1)
    valid = pos <= (lengths.astype(jnp.int32)[:, None] - span)
    if limits is not None:
        valid = valid & (pos < limits.astype(jnp.int32)[:, None])
    return valid


def kmer_lanes(codes: jnp.ndarray, lengths: jnp.ndarray, k: int,
               *, limits: jnp.ndarray | None = None, sentinel: bool = True,
               mask_ambiguous: bool = False):
    """All k-mer keys of every read in a batch.

    Args:
      codes:   (B, L) uint8 2-bit base codes, rows padded past `lengths`.
      lengths: (B,) int32 true read lengths.
      k:       k-mer size (static).
      limits:  optional (B,) int32 — row owns only window starts o <
               limits[b] (segment-seam ownership, io.fasta.segment_records).
      mask_ambiguous: treat codes >= 4 (encode.AMBIG_CODE, i.e. N/IUPAC
               bases in skip-invalid mode) as window poison — any window
               containing one is masked out.

    Returns:
      words: list of W uint32 arrays, each (B, P) with P = L-k+1,
             most-significant word first; invalid lanes = sentinel.
      valid: (B, P) bool — lane p of row b is a real owned k-mer.
    """
    B, L = codes.shape
    assert L >= k, f"batch width {L} < k={k}"
    P = L - k + 1
    W = words_per_key(k)
    c32 = codes.astype(jnp.uint32)
    words = [jnp.zeros((B, P), dtype=jnp.uint32) for _ in range(W)]
    amb = jnp.zeros((B, P), bool) if mask_ambiguous else None
    for j in range(k):
        bitpos = 2 * (k - 1 - j)
        wi = W - 1 - bitpos // 32
        sh = bitpos % 32
        sl = lax.dynamic_slice_in_dim(c32, j, P, axis=1)
        words[wi] = words[wi] | ((sl & jnp.uint32(3)) << jnp.uint32(sh))
        if mask_ambiguous:
            amb = amb | (sl >= 4)
    valid = _valid_mask(B, P, lengths, k, limits)
    if mask_ambiguous:
        valid = valid & ~amb
    if sentinel:
        words = _apply_sentinel(words, valid)
    return words, valid


def rc_kmer_lanes(codes: jnp.ndarray, lengths: jnp.ndarray, k: int,
                  *, limits: jnp.ndarray | None = None, sentinel: bool = True,
                  mask_ambiguous: bool = False):
    """Reverse-complement k-mer keys for every lane of `kmer_lanes`.

    The RC of window [p, p+k) read 5'→3' on the other strand puts base
    p+j (complemented) at RC position k-1-j, i.e. at bit position 2j —
    so the RC key is the same slice-sum with complement codes (3-c) and
    mirrored shifts.  No reversal gather needed.
    """
    B, L = codes.shape
    P = L - k + 1
    W = words_per_key(k)
    c32 = codes.astype(jnp.uint32)
    words = [jnp.zeros((B, P), dtype=jnp.uint32) for _ in range(W)]
    amb = jnp.zeros((B, P), bool) if mask_ambiguous else None
    for j in range(k):
        bitpos = 2 * j
        wi = W - 1 - bitpos // 32
        sh = bitpos % 32
        sl = lax.dynamic_slice_in_dim(c32, j, P, axis=1)
        words[wi] = words[wi] | ((jnp.uint32(3) - (sl & jnp.uint32(3)))
                                << jnp.uint32(sh))
        if mask_ambiguous:
            amb = amb | (sl >= 4)
    valid = _valid_mask(B, P, lengths, k, limits)
    if mask_ambiguous:
        valid = valid & ~amb
    if sentinel:
        words = _apply_sentinel(words, valid)
    return words, valid


# ---------------------------------------------------------------------------
# Reference-parity gapped L+R extraction.
#
# The reference emits, for every read, every chunk size c in [c_min, c_max]
# and every window offset o with o + c <= len, the 54-mer
#     seq[o : o+27] ++ seq[o+c-27 : o+c]
# (main.rs:63-79 / test.py:22-38).  TPU-first formulation: the L part is
# the 27-mer key at position o and the R part is the 27-mer key at
# position o+c-27, so we compute ALL 27-mer keys once (one slice-sum) and
# the gapped key is two gathers + a word-level shift-or combine — the
# 61-chunk-size sweep shares one K27 table instead of re-slicing strings.
# ---------------------------------------------------------------------------

GAP_L = 27           # main.rs:48
GAP_R = 27           # main.rs:49
GAP_C_MIN = 80       # main.rs:63
GAP_C_MAX = 140      # main.rs:63 (`80..141`)


def _extract32(S: list[jnp.ndarray], p: int) -> jnp.ndarray:
    """Bits [p, p+32) of the multi-word big integer S (MS word first),
    for static p (negative p = the value shifted left by -p)."""
    Ws = len(S)
    if p <= -32:
        return jnp.zeros_like(S[0])
    if p < 0:
        return S[Ws - 1] << jnp.uint32(-p)
    q, sh = divmod(p, 32)
    lo = Ws - 1 - q
    if lo < 0:
        return jnp.zeros_like(S[0])
    w = S[lo] >> jnp.uint32(sh) if sh else S[lo]
    if sh and lo - 1 >= 0:
        w = w | (S[lo - 1] << jnp.uint32(32 - sh))
    return w


def _combine_lr(l_words: list[jnp.ndarray], r_words: list[jnp.ndarray],
                l_len: int, r_len: int) -> list[jnp.ndarray]:
    """value = L * 4^r_len + R as words_per_key(l_len+r_len) words."""
    W = words_per_key(l_len + r_len)
    out = []
    for wo in range(W):
        p = 32 * (W - 1 - wo)
        out.append(_extract32(r_words, p) |
                   _extract32(l_words, p - 2 * r_len))
    return out


def gapped_lanes(codes: jnp.ndarray, lengths: jnp.ndarray,
                 l_len: int = GAP_L, r_len: int = GAP_R,
                 c_min: int = GAP_C_MIN, c_max: int = GAP_C_MAX,
                 *, limits: jnp.ndarray | None = None,
                 mask_ambiguous: bool = False):
    """All gapped L+R chunk keys of a batch, reference semantics.

    Returns:
      words: list of W uint32 arrays (B, C, O) — 2(l_len+r_len)-bit
             keys, MSW first, C = number of chunk sizes, O = offsets for
             the smallest c; invalid (o + c > len) lanes = sentinel.
      valid: (B, C, O) bool.
    """
    assert l_len >= 1 and r_len >= 1
    assert c_min >= l_len + r_len, "L and R windows must not overlap"
    B, L = codes.shape
    n_c = c_max - c_min + 1
    O = max(L - c_min + 1, 0)
    W = words_per_key(l_len + r_len)
    if O == 0 or L < max(l_len, r_len):
        words = [jnp.full((B, n_c, max(O, 0)), SENTINEL, jnp.uint32)
                 for _ in range(W)]
        return words, jnp.zeros((B, n_c, max(O, 0)), bool)

    # Sub-key tables: the l_len-mer key at every position (and the
    # r_len-mer table, shared when l == r).  sentinel=False — validity
    # of a gapped lane is decided by its own mask below; the ambiguity
    # masks of both windows feed into it.
    lw, lval = kmer_lanes(codes, lengths, l_len, sentinel=False,
                          mask_ambiguous=mask_ambiguous)
    if r_len == l_len:
        rw, rval = lw, lval
    else:
        rw, rval = kmer_lanes(codes, lengths, r_len, sentinel=False,
                              mask_ambiguous=mask_ambiguous)

    c_vals = jnp.arange(c_min, c_max + 1, dtype=jnp.int32)          # (C,)
    o_vals = jnp.arange(O, dtype=jnp.int32)                          # (O,)
    c_grid = c_vals[None, :, None]                                   # (1,C,1)
    o_grid = o_vals[None, None, :]                                   # (1,1,O)
    r0 = o_grid + c_grid - r_len                                     # (1,C,O)
    valid = (o_grid + c_grid) <= lengths.astype(jnp.int32)[:, None, None]
    if limits is not None:
        valid = valid & (o_grid < limits.astype(jnp.int32)[:, None, None])

    Pl = L - l_len + 1
    Pr = L - r_len + 1
    l_idx = jnp.clip(jnp.broadcast_to(o_grid, (1, n_c, O)), 0, Pl - 1)
    r_idx = jnp.clip(r0, 0, Pr - 1)
    l_idx = jnp.broadcast_to(l_idx, (B, n_c, O)).reshape(B, 1, -1)
    r_idx = jnp.broadcast_to(r_idx, (B, n_c, O)).reshape(B, 1, -1)

    def gather(tbl, idx):
        return jnp.take_along_axis(tbl[:, None, :], idx,
                                   axis=2).reshape(B, n_c, O)

    l_g = [gather(w, l_idx) for w in lw]
    r_g = [gather(w, r_idx) for w in rw]
    words = _combine_lr(l_g, r_g, l_len, r_len)
    if mask_ambiguous:
        amb_ok = (gather(lval.astype(jnp.uint32), l_idx) != 0) & \
                 (gather(rval.astype(jnp.uint32), r_idx) != 0)
        valid = valid & amb_ok
    words = _apply_sentinel(words, valid)
    return words, valid
