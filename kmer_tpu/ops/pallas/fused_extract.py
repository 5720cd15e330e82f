"""Fully fused count step: extraction -> canonical -> repack ->
grouped sort -> run-length in ONE Pallas kernel.

This is VERDICT r1 #1's "fuse extraction->binning so keys never
round-trip HBM unsorted", in the transposed (sublane-axis) layout that
made both halves fast individually: the two-stage fast path (XLA
slice-sum extraction + pallas_t sort kernel) writes ~8 B/key of
repacked words to HBM and immediately reads them back — ~68 MB of pure
round-trip per 4.26 M-key batch.  Here each grid step loads one
(L, 512) tile of transposed codes (~80 KB), builds the repacked
canonical key words by sublane slice-sum in VMEM (forward and
reverse-complement accumulated in the same loop, the repack folded into
the shift positions), sorts each seg-sublane segment with the shared
bitonic network (fused_count._sort_runlen), and writes sorted keys +
run counts.  HBM sees the codes once in and each key once out.

Replaces the reference's per-window string slicing + Vec::sort
(k-mer-count/src/main.rs:63-90) on the ungapped sort-mode hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..encode import words_per_key
from .fused_count import _dedup_runlen, _sort_runlen

SENTINEL = 0xFFFFFFFF
BLOCK_LANES = 512
# every selectable banded-matmul backend — drivers derive eligibility
# from THIS tuple (parallel.distributed.pairs_eligible); enumerating
# the names elsewhere drifts when a variant is added
MXU_BACKENDS = ("mxu", "mxu8", "mxus", "mxus8")


def _rev_fields32(x):
    """Reverse the 16 two-bit fields of each uint32 lane (butterfly;
    in-kernel twin of ops/canonical._reverse_fields32)."""
    x = (x >> jnp.uint32(16)) | (x << jnp.uint32(16))
    x = ((x & jnp.uint32(0xFF00FF00)) >> jnp.uint32(8)) | \
        ((x & jnp.uint32(0x00FF00FF)) << jnp.uint32(8))
    x = ((x & jnp.uint32(0xF0F0F0F0)) >> jnp.uint32(4)) | \
        ((x & jnp.uint32(0x0F0F0F0F)) << jnp.uint32(4))
    x = ((x & jnp.uint32(0xCCCCCCCC)) >> jnp.uint32(2)) | \
        ((x & jnp.uint32(0x33333333)) << jnp.uint32(2))
    return x


def _doubling_pair(c, n: int, P: int, mask_ambiguous: bool):
    """The n-base window value at rows 0..P-1 of transposed codes `c`
    as a 64-bit pair (hi = value bits [32, 2n), lo = bits [0, 32)), by
    O(log n) shift-or DOUBLING instead of the O(n) slice-sum: level
    tables D_w hold the w-base value at every row (D_2w[o] =
    D_w[o] << 2w | D_w[o+w]) and n's binary decomposition stitches
    them (V_n[o] = V_m[o] << 2p | D_p[o+m]).  The XLA-level version of
    this measured SLOWER than slice-sum (docs/DESIGN.md — full-size
    intermediates round-tripping HBM); in-kernel every level lives in
    VMEM, so it trades ~n offset slices for ~log2(n) (measured on v5e:
    k=21 step 0.27 ms vs 0.31, k=31 0.25 vs 0.33).

    Returns (hi, lo, amb_u32); amb_u32 is nonzero where the window has
    an ambiguous base (None unless mask_ambiguous).  n <= 31."""
    assert n <= 31, n
    amb1 = None
    if mask_ambiguous:
        amb1 = (c >= 4).astype(jnp.uint32)
        c = c & jnp.uint32(3)
    levels, ambl = {1: c}, {1: amb1}
    w = 1
    while 2 * w <= min(n, 16):
        a = levels[w]
        h = a.shape[0] - w
        levels[2 * w] = ((lax.slice_in_dim(a, 0, h, axis=0)
                          << jnp.uint32(2 * w))
                         | lax.slice_in_dim(a, w, w + h, axis=0))
        if mask_ambiguous:
            am = ambl[w]
            ambl[2 * w] = (lax.slice_in_dim(am, 0, h, axis=0)
                           | lax.slice_in_dim(am, w, w + h, axis=0))
        w *= 2
    parts = [p for p in (16, 8, 4, 2, 1) if n & p]   # binary, each once
    p0 = parts[0]
    acc_lo = lax.slice_in_dim(levels[p0], 0, P, axis=0)
    acc_hi = jnp.zeros_like(acc_lo)
    amb_acc = (lax.slice_in_dim(ambl[p0], 0, P, axis=0)
               if mask_ambiguous else None)
    off, width = p0, p0
    for p in parts[1:]:
        s = jnp.uint32(2 * p)
        if 2 * (width + p) > 32:                     # lo overflows to hi
            acc_hi = (acc_hi << s) | (acc_lo >> jnp.uint32(32 - 2 * p))
        acc_lo = ((acc_lo << s)
                  | lax.slice_in_dim(levels[p], off, off + P, axis=0))
        if mask_ambiguous:
            amb_acc = amb_acc | lax.slice_in_dim(ambl[p], off,
                                                 off + P, axis=0)
        off += p
        width += p
    return acc_hi, acc_lo, amb_acc


_MXU_SUB = 12          # bases per MXU subword: 4^12 - 1 = 2^24 - 1 is the
                       # largest window value exactly representable in the
                       # f32 accumulator (and every 4^j weight is a power
                       # of two, exact in bfloat16)
_MXU_SUB8 = 4          # bases per s8 MXU subword: weights 1/4/16/64 all
                       # fit int8 and the s32 accumulator is exact by
                       # construction — the s8xs8->s32 path has NO float
                       # conversions at all (VERDICT r3 #1a): codes feed
                       # the systolic array as int8 and chunks come out
                       # s32 -> u32 (a bitcast), killing the per-tile
                       # i32->f32->bf16 in / f32->i32->u32 out chains of
                       # the f32 path.  More, narrower chunks (8-bit LE)
                       # mean a few extra u32 stitch ops and 3x the MXU
                       # rows — but int8 MXU throughput is 2x bf16 and
                       # the array was mostly idle.


def mxu_fits(k: int, L: int, canonical: bool, mask_ambiguous: bool,
             seg: int = 4, block_lanes: int = 512,
             budget_bytes: int = 24 * 1024 * 1024,
             span: int | None = None, sub: int = _MXU_SUB,
             shared: bool = False) -> bool:
    """Whether the MXU extraction's VMEM-resident operands (the stacked
    weight matrix + the matmul accumulator) fit a conservative budget
    for this (k, L).  Both grow with n_blk * R ~ O(k/sub * L), so long
    reads at large k must fall back (callers pick doubling for W <= 2,
    the XLA path otherwise).  sub selects the backend geometry: 12-base
    bf16 subwords (weights 2 B/elem, 16-row tiles) or 4-base s8
    subwords (1 B/elem, 32-row tiles, 3x the blocks)."""
    span = span or k          # spaced seeds: window span > n_bases
    P = L - span + 1
    if P < 1 or k > 63:
        return False
    P_pad = -(-P // seg) * seg
    L_pad = P_pad + span - 1
    row_align = 32 if sub == _MXU_SUB8 else 16
    wbytes = 1 if sub == _MXU_SUB8 else 2
    n_sub = -(-k // sub)
    if shared:
        # one rolling-value band per strand (+ the window amb band)
        P_ext = P_pad + sub * (n_sub - 1)
        R_ext = -(-P_ext // row_align) * row_align
        rows = ((2 if canonical else 1) * R_ext
                + ((-(-P_pad // row_align) * row_align)
                   if mask_ambiguous else 0))
    else:
        R = -(-P_pad // row_align) * row_align
        n_blk = ((2 * n_sub if canonical else n_sub)
                 + (1 if mask_ambiguous else 0))
        rows = n_blk * R
    return rows * (L_pad * wbytes + block_lanes * 4) <= budget_bytes


def select_fused_extract(k: int, L: int, canonical: bool,
                         mask_ambiguous: bool = False,
                         block_lanes: int = 512) -> str | None:
    """Fused-kernel extraction backend policy — ONE definition shared by
    every step-selection site (pipeline/count.py, parallel/distributed).

    Returns the `extract=` argument for fused_extract_count_T, or None
    when the fused kernel is not eligible (caller falls back to the XLA
    extraction path).

    env KMER_TPU_FUSED_EXTRACT:
      auto (default)  doubling for single-word keys (k <= 15: parity
                      within noise, simpler integer path); mxu for
                      every other k <= 63 whose VMEM operands fit —
                      the banded-matmul extraction measured 5.5-6.7x
                      over the XLA fallback at k=33/45/63 and a
                      consistent same-process win over doubling at
                      W=2 (k=21: 0.257 vs 0.268 ms at seg=2, k=31:
                      0.270 vs 0.285 — r3 alternated sweeps), and it
                      covers the s==0 widths k=16/32/48; unfit falls
                      back to doubling (W <= 2) / XLA (wide keys).
      mxu / mxu8      force the f32 / all-integer s8 banded-matmul
                      variant wherever it fits; doubling downgrade for
                      W <= 2; None otherwise.
      doubling /      force (W <= 2 only; None otherwise — the escape
      slicesum        hatch back to the XLA path for wide keys).
    """
    import os
    req = os.environ.get("KMER_TPU_FUSED_EXTRACT", "auto")
    base = words_per_key(k) <= 2 and 2 * k != 32
    if req in MXU_BACKENDS:
        sub = _MXU_SUB8 if req.endswith("8") else _MXU_SUB
        if mxu_fits(k, L, canonical, mask_ambiguous, sub=sub,
                    shared=req.startswith("mxus"),
                    block_lanes=block_lanes):
            return req
        return "doubling" if base else None
    if req in ("doubling", "slicesum"):
        return req if base else None
    if words_per_key(k) == 1:
        return "doubling"
    if base:
        # W=2 with a residual word (k=17..31): per-chunk mxu (2 bands/
        # strand already; the shared tables measured parity-to-slightly-
        # behind here, r4 sweeps)
        return ("mxu" if mxu_fits(k, L, canonical, mask_ambiguous,
                                  block_lanes=block_lanes)
                else "doubling")
    # wide keys (k>=33) and the s==0 widths (k=16/32/48): SHARED-BAND
    # extraction — one rolling-value band per strand instead of n_sub,
    # measured ~15% over per-chunk mxu at k=45 (r4 sweeps)
    if mxu_fits(k, L, canonical, mask_ambiguous, shared=True,
                block_lanes=block_lanes):
        return "mxus"
    if mxu_fits(k, L, canonical, mask_ambiguous,
                block_lanes=block_lanes):
        return "mxu"
    return None


def _mxu_weights(k: int, P_pad: int, L_pad: int, canonical: bool,
                 mask_ambiguous: bool,
                 positions: tuple[int, ...] | None = None,
                 sub: int = _MXU_SUB):
    """Host-built banded weight matrix for the MXU extraction path.

    Row block m (height R = P_pad rounded up to the sublane tile — 16
    for bf16, 32 for int8 — so in-kernel slices stay aligned) holds
    W[p, p+j] = 4^(q-sub*m) for significance
    q = k-1-j in [sub*m, sub*m+sub): the matmul W @ codes yields, per
    output row p, the m-th 2*sub-bit little-endian chunk of the forward
    window value sum_j codes[p+j] * 4^(k-1-j).  Canonical adds the
    REVERSE-weighted blocks (S = sum_j c[p+j] * 4^j; the reverse
    complement is then ~S in 2k bits, since all-3s minus a base is its
    complement).  mask_ambiguous appends one all-ones band: the matmul
    of the (code >= 4) indicator counts ambiguous bases per window.

    SPACED SEEDS ride the same algebra for free: `positions` maps the
    key's selected index i to source offset positions[i] (contiguous
    k-mers are positions = 0..k-1), so don't-care bases simply have no
    band — including in the ambiguity indicator, which is the correct
    spaced semantics (an N at a don't-care never poisons the window).

    sub=_MXU_SUB (12): bf16 weights, f32 accumulation (both exact: all
    weights are powers of two <= 4^11, chunks < 2^24).
    sub=_MXU_SUB8 (4): int8 weights 1/4/16/64, s32 accumulation — the
    all-integer variant (chunks < 2^8).

    Returns (weights float32 (n_blocks * R, L_pad), R, n_sub)."""
    import numpy as np
    if positions is None:
        positions = tuple(range(k))
    assert len(positions) == k, (len(positions), k)
    row_align = 32 if sub == _MXU_SUB8 else 16
    R = -(-P_pad // row_align) * row_align
    n_sub = -(-k // sub)
    rows = np.arange(P_pad)

    def band(sig_to_j):
        W = np.zeros((R, L_pad), np.float32)
        for q in range(sub * m, min(sub * m + sub, k)):
            j = sig_to_j(q)
            cols = rows + j
            ok = cols < L_pad
            W[rows[ok], cols[ok]] = float(1 << (2 * (q - sub * m)))
        return W

    blocks = []
    for m in range(n_sub):
        blocks.append(band(lambda q: positions[k - 1 - q]))  # forward
    if canonical:
        for m in range(n_sub):
            blocks.append(band(lambda q: positions[q]))      # reversed S
    if mask_ambiguous:
        W = np.zeros((R, L_pad), np.float32)
        for j in positions:
            cols = rows + j
            ok = cols < L_pad
            W[rows[ok], cols[ok]] = 1.0
        blocks.append(W)
    return np.concatenate(blocks, axis=0), R, n_sub


def _mxu_weights_shared(k: int, P_pad: int, L_pad: int, canonical: bool,
                        mask_ambiguous: bool, sub: int = _MXU_SUB):
    """SHARED-BAND weight matrix (r4): every full value chunk is a
    shifted copy of ONE rolling sub-base value — forward chunk m at
    window p equals V[p + k - sub*(m+1)] where V[q] = sum_{i<sub}
    c[q+i] * 4^(sub-1-i), and the reverse-weighted chunks are slices
    of S[q] = sum_{i<sub} c[q+i] * 4^i.  So the matmul needs ONE band
    per strand (heights extended by sub*(n_sub-1) rows so every shifted
    slice is in range) instead of n_sub bands per strand: 2x less MXU
    work at k=21 canonical, ~3x at k=45 — and the f32->i32->u32 (or
    s32->u32) conversion runs once per BAND instead of once per CHUNK.
    Partial top chunks come from the same tables by shift/mask (top w
    digits of V = `V >> 2*(sub-w)`, low w digits of S = `S & mask`).

    Contiguous windows only (spaced seeds keep the per-chunk bands —
    their chunks are not shifted copies of each other).

    Returns (weights float32 (rows, L_pad), R_ext, R_amb)."""
    import numpy as np
    row_align = 32 if sub == _MXU_SUB8 else 16
    n_sub = -(-k // sub)
    P_ext = P_pad + sub * (n_sub - 1)
    R_ext = -(-P_ext // row_align) * row_align
    R_amb = -(-P_pad // row_align) * row_align
    rows = np.arange(P_ext)

    def band(weight_of_i):
        W = np.zeros((R_ext, L_pad), np.float32)
        for i in range(sub):
            cols = rows + i
            ok = cols < L_pad
            W[rows[ok], cols[ok]] = float(weight_of_i(i))
        return W

    blocks = [band(lambda i: 1 << (2 * (sub - 1 - i)))]       # V
    if canonical:
        blocks.append(band(lambda i: 1 << (2 * i)))           # S
    if mask_ambiguous:
        Wa = np.zeros((R_amb, L_pad), np.float32)
        ra = np.arange(P_pad)
        for j in range(k):
            cols = ra + j
            ok = cols < L_pad
            Wa[ra[ok], cols[ok]] = 1.0
        blocks.append(Wa)
    return np.concatenate(blocks, axis=0), R_ext, R_amb


def _mxu_extract_shared(c, w_ref, k: int, P_pad: int, n_words: int,
                        canonical: bool, mask_ambiguous: bool,
                        sub: int = _MXU_SUB):
    """Shared-band MXU extraction (see _mxu_weights_shared): one rolling
    value table per strand, chunks as shifted in-VMEM slices, one
    convert per band.  Returns (repacked word list, amb) with the
    canonical min already selected."""
    n_sub = -(-k // sub)
    cw = 2 * sub
    row_align = 32 if sub == _MXU_SUB8 else 16
    P_ext = P_pad + sub * (n_sub - 1)
    R_ext = -(-P_ext // row_align) * row_align
    n_band = 2 if canonical else 1
    cm = (c & jnp.uint32(3)) if mask_ambiguous else c
    if sub == _MXU_SUB8:
        cb = cm.astype(jnp.int32).astype(jnp.int8)
        acc = jnp.dot(w_ref[:n_band * R_ext], cb,
                      preferred_element_type=jnp.int32)

        def table(b):
            t = lax.slice_in_dim(acc, b * R_ext, b * R_ext + P_ext, axis=0)
            return t.astype(jnp.uint32)
    else:
        cb = cm.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
        acc = jnp.dot(w_ref[:n_band * R_ext], cb,
                      preferred_element_type=jnp.float32)

        def table(b):
            t = lax.slice_in_dim(acc, b * R_ext, b * R_ext + P_ext, axis=0)
            return t.astype(jnp.int32).astype(jnp.uint32)

    w_top = k - sub * (n_sub - 1)         # top chunk width in bases
    v = table(0)
    fchunks = []
    for m in range(n_sub):
        if m < n_sub - 1 or w_top == sub:
            off = k - sub * (m + 1)
            fchunks.append(lax.slice_in_dim(v, off, off + P_pad, axis=0))
        else:
            # top partial chunk = V's top w digits (missing LOW digits
            # near the read end are zero-weighted and shifted out)
            fchunks.append(lax.slice_in_dim(v, 0, P_pad, axis=0)
                           >> jnp.uint32(2 * (sub - w_top)))
    fw = _chunks_to_repacked(fchunks, k, n_words, cw)
    if canonical:
        s = table(1)
        rc_chunks = []
        for m in range(n_sub):
            ch = lax.slice_in_dim(s, sub * m, sub * m + P_pad, axis=0)
            wbits = min(2 * k - cw * m, cw)
            mask = jnp.uint32((1 << wbits) - 1)
            # RC = bitwise NOT in wbits; the top partial S chunk carries
            # garbage digits above wbits (real bases beyond the key) —
            # (ch ^ mask) & mask clears them
            rc = ch ^ mask
            if wbits < cw:
                rc = rc & mask
            rc_chunks.append(rc)
        rw = _chunks_to_repacked(rc_chunks, k, n_words, cw)
        lt = rw[0] < fw[0]
        eq = rw[0] == fw[0]
        for rj, fj in zip(rw[1:], fw[1:]):
            lt = lt | (eq & (rj < fj))
            eq = eq & (rj == fj)
        fw = [jnp.where(lt, rj, fj) for rj, fj in zip(rw, fw)]
    amb = None
    if mask_ambiguous:
        base = n_band * R_ext
        R_amb = (w_ref.shape[0] - base)
        wa = lax.slice_in_dim(w_ref[:], base, base + R_amb, axis=0)
        if sub == _MXU_SUB8:
            ind = (c >= 4).astype(jnp.int32).astype(jnp.int8)
            acc_a = jnp.dot(wa, ind, preferred_element_type=jnp.int32)
            amb = lax.slice_in_dim(acc_a, 0, P_pad, axis=0) > 0
        else:
            ind = (c >= 4).astype(jnp.int32).astype(jnp.float32) \
                .astype(jnp.bfloat16)
            acc_a = jnp.dot(wa, ind, preferred_element_type=jnp.float32)
            amb = lax.slice_in_dim(acc_a, 0, P_pad, axis=0) > 0.5
    return fw, amb


def _bits32(chunks, t: int, width: int = 32, cw: int = 24):
    """Value bits [t, t+width) as one u32, from little-endian cw-bit
    chunks.  All shift amounts are static and < 32 (a 32-bit window
    spans at most ceil(32/cw)+1 chunks); u32 left shifts drop bits
    >= 32."""
    out = None
    for m in range(t // cw, len(chunks)):
        base = cw * m
        if base >= t + width:
            break
        if base <= t:
            term = chunks[m] >> jnp.uint32(t - base)
        else:
            term = chunks[m] << jnp.uint32(base - t)
        out = term if out is None else (out | term)
    if width < 32:
        out = out & jnp.uint32((1 << width) - 1)
    return out


def _chunks_to_repacked(chunks, k: int, n_words: int, cw: int = 24):
    """cw-bit LE value chunks -> repacked words (32 key bits per word
    from the TOP, s-bit residual last — ops/count.repack_words).  When
    2k is a multiple of 32 (s == 0: k = 16, 32, 48) the residual word
    carries no key bits and is emitted as the all-zero flag payload
    (repack_words' s == 0 convention: 0 on real lanes, SENTINEL on
    invalid ones — the kernel's sentinel select provides the latter)."""
    bits = 2 * k
    s = bits - 32 * (n_words - 1)
    ws = [_bits32(chunks, bits - 32 * (j + 1), cw=cw)
          for j in range(n_words - 1)]
    ws.append(_bits32(chunks, 0, width=s, cw=cw) if s
              else jnp.zeros_like(ws[0]))
    return ws


def _mxu_extract(c, w_ref, k: int, P_pad: int, n_words: int,
                 canonical: bool, mask_ambiguous: bool,
                 sub: int = _MXU_SUB):
    """MXU extraction: banded matmuls build the key subwords, so the
    O(k) (or O(log k)) sublane-slice shift-or chains become one
    systolic-array pass; the VPU only converts and stitches.  Exact by
    construction: every weight is a power of two (bf16-exact), every
    window subvalue < 2^24 (f32-exact).  Works for ANY word count
    (k <= 63) — the doubling path's 64-bit accumulator pair caps it at
    W <= 2, but chunks stitch into arbitrarily many repacked words.

    sub=_MXU_SUB8 is the ALL-INTEGER variant (VERDICT r3 #1a): int8
    weights 1/4/16/64, codes enter the array as s8 (i32->i8 truncate —
    values 0..3), chunks come out s32 and BITCAST to u32 — zero float
    conversions on either side of the matmul, at the cost of 3x the
    weight blocks (4-base chunks) and a few more u32 stitch terms.

    Returns (repacked word list, amb) with the canonical min ALREADY
    selected."""
    n_sub = -(-k // sub)
    cw = 2 * sub                # chunk width in bits
    n_blk = (2 * n_sub if canonical else n_sub) + (1 if mask_ambiguous else 0)
    R = w_ref.shape[0] // n_blk
    n_val = n_blk - (1 if mask_ambiguous else 0)   # value bands only —
    # the amb band multiplies the indicator, not the codes, in its own
    # dot below; including it here would waste 1/n_blk of the MXU work
    cm = (c & jnp.uint32(3)) if mask_ambiguous else c
    if sub == _MXU_SUB8:
        cb = cm.astype(jnp.int32).astype(jnp.int8)
        acc = jnp.dot(w_ref[:n_val * R], cb,
                      preferred_element_type=jnp.int32)

        def chunk(i):
            s = lax.slice_in_dim(acc, i * R, i * R + P_pad, axis=0)
            return s.astype(jnp.uint32)            # s32 -> u32 bitcast
    else:
        # Mosaic has no u32->f32 convert; i32 hop is exact (codes 0..7)
        cb = cm.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
        acc = jnp.dot(w_ref[:n_val * R], cb,
                      preferred_element_type=jnp.float32)

        def chunk(i):
            s = lax.slice_in_dim(acc, i * R, i * R + P_pad, axis=0)
            return s.astype(jnp.int32).astype(jnp.uint32)

    fw = _chunks_to_repacked([chunk(m) for m in range(n_sub)], k,
                             n_words, cw)
    if canonical:
        # reverse complement = all-3s minus S = bitwise NOT in 2k bits,
        # which is chunk-wise XOR with each chunk's width mask (the
        # chunks partition the bit range — no borrows)
        rc_chunks = []
        for m in range(n_sub):
            wbits = min(2 * k - cw * m, cw)
            rc_chunks.append(chunk(n_sub + m)
                             ^ jnp.uint32((1 << wbits) - 1))
        rw = _chunks_to_repacked(rc_chunks, k, n_words, cw)
        # lexicographic min over repacked words (word 0 most significant)
        lt = rw[0] < fw[0]
        eq = rw[0] == fw[0]
        for rj, fj in zip(rw[1:], fw[1:]):
            lt = lt | (eq & (rj < fj))
            eq = eq & (rj == fj)
        fw = [jnp.where(lt, rj, fj) for rj, fj in zip(rw, fw)]
    amb = None
    if mask_ambiguous:
        # dot the FULL R-row band (tile-aligned for int8 weights) and
        # slice the accumulator instead of the weights
        wa = lax.slice_in_dim(w_ref[:], (n_blk - 1) * R, n_blk * R,
                              axis=0)
        if sub == _MXU_SUB8:
            ind = (c >= 4).astype(jnp.int32).astype(jnp.int8)
            acc_a = jnp.dot(wa, ind, preferred_element_type=jnp.int32)
            amb = lax.slice_in_dim(acc_a, 0, P_pad, axis=0) > 0
        else:
            ind = (c >= 4).astype(jnp.int32).astype(jnp.float32) \
                .astype(jnp.bfloat16)
            acc_a = jnp.dot(wa, ind, preferred_element_type=jnp.float32)
            amb = lax.slice_in_dim(acc_a, 0, P_pad, axis=0) > 0.5
    return fw, amb


def _doubling_repacked(c, k: int, P_pad: int, n_words: int,
                       mask_ambiguous: bool):
    """_doubling_pair realigned to the repacked layout: (ftop, fbot,
    amb_bool); fbot is None for n_words == 1."""
    acc_hi, acc_lo, amb_acc = _doubling_pair(c, k, P_pad, mask_ambiguous)
    amb = (amb_acc != 0) if mask_ambiguous else None
    if n_words == 1:
        return acc_lo, None, amb
    s_res = 2 * k - 32
    ftop = (acc_hi << jnp.uint32(32 - s_res)) | (acc_lo >> jnp.uint32(s_res))
    fbot = acc_lo & jnp.uint32((1 << s_res) - 1)
    return ftop, fbot, amb


def _kernel(codes_ref, len_ref, lim_ref, *rest, k: int, P: int,
            P_pad: int, seg: int, n_words: int, canonical: bool,
            mask_ambiguous: bool, algo: str = "sort",
            extract_algo: str = "slicesum", span: int | None = None):
    span = span or k           # spaced seeds: window span > n_bases
    if extract_algo.startswith("mxu"):
        w_ref, out_refs = rest[0], rest[1:]
    else:
        w_ref, out_refs = None, rest
    c = codes_ref[:].astype(jnp.uint32)              # (L_pad, bw)
    bw = c.shape[1]
    shape = (P_pad, bw)
    low = 2 * k - 32 if n_words == 2 else 0          # bits in the bot word
    fwords = None
    if extract_algo in ("mxus", "mxus8"):
        fwords, amb = _mxu_extract_shared(
            c, w_ref, k, P_pad, n_words, canonical, mask_ambiguous,
            sub=_MXU_SUB8 if extract_algo == "mxus8" else _MXU_SUB)
        ftop = fbot = None
    elif extract_algo in ("mxu", "mxu8"):
        fwords, amb = _mxu_extract(
            c, w_ref, k, P_pad, n_words, canonical, mask_ambiguous,
            sub=_MXU_SUB8 if extract_algo == "mxu8" else _MXU_SUB)
        ftop = fbot = None
    elif extract_algo == "copy":
        # MEASUREMENT ONLY (scripts/vpu_floor.py): no extraction at
        # all — pseudo-key words are raw code slices.  Times the
        # IRREDUCIBLE tile work of this kernel shape: codes in, W key
        # planes + count plane out, validity test, sentinel select.
        # Output is NOT a k-mer table.
        fwords = [lax.slice_in_dim(c, min(j, span - 1),
                                   min(j, span - 1) + P_pad, axis=0)
                  for j in range(n_words)]
        amb = jnp.zeros(shape, bool) if mask_ambiguous else None
        ftop = fbot = None
    elif extract_algo == "doubling":
        ftop, fbot, amb = _doubling_repacked(c, k, P_pad, n_words,
                                             mask_ambiguous)
        if fbot is None:
            fbot = jnp.zeros(shape, jnp.uint32)
    else:
        ftop = jnp.zeros(shape, jnp.uint32)
        fbot = jnp.zeros(shape, jnp.uint32)
        amb = jnp.zeros(shape, bool) if mask_ambiguous else None
        for j in range(k):
            sl = lax.slice_in_dim(c, j, j + P_pad, axis=0)
            if mask_ambiguous:
                amb = amb | (sl >= 4)
                sl = sl & jnp.uint32(3)
            fpos = 2 * (k - 1 - j)
            if fpos >= low:
                ftop = ftop | (sl << jnp.uint32(fpos - low))
            else:
                fbot = fbot | (sl << jnp.uint32(fpos))
    if canonical and fwords is None:                 # mxu selects in-path
        # RC from the FORWARD words by pure bit tricks instead of a
        # second k-iteration accumulation (ops/canonical.revcomp_words
        # adapted to the repacked layout): align V to the top of the
        # 64-bit pair, complement + butterfly-reverse each word, swap
        # words, realign to repacked (top-32 | s-residual)
        if n_words == 2:
            s = low                                  # residual bits
            y_hi = _rev_fields32(~(fbot << jnp.uint32(32 - s)))
            y_lo = _rev_fields32(~ftop)
            rtop = ((y_hi & jnp.uint32((1 << s) - 1)) << jnp.uint32(32 - s)
                    ) | (y_lo >> jnp.uint32(s))
            rbot = y_lo & jnp.uint32((1 << s) - 1)
            take_rc = (rtop < ftop) | ((rtop == ftop) & (rbot < fbot))
            fbot = jnp.where(take_rc, rbot, fbot)
        else:
            rtop = _rev_fields32(~(ftop << jnp.uint32(32 - 2 * k))
                                 ) & jnp.uint32((1 << (2 * k)) - 1)
            take_rc = rtop < ftop
        ftop = jnp.where(take_rc, rtop, ftop)
    pos = lax.broadcasted_iota(jnp.int32, shape, 0)
    valid = (pos < P) & (pos <= len_ref[:] - span) & (pos < lim_ref[:])
    if mask_ambiguous:
        valid = valid & ~amb
    sent = jnp.uint32(SENTINEL)
    if fwords is not None:                           # mxu: any W
        ws = [jnp.where(valid, w, sent) for w in fwords]
    elif n_words == 2:
        ws = [jnp.where(valid, ftop, sent), jnp.where(valid, fbot, sent)]
    else:
        ws = [jnp.where(valid, ftop, sent)]
    if algo == "raw":
        # DEBUG/measurement only: no collapse at all — every valid lane
        # emits count 1 (still contract-correct; the host aggregates
        # everything).  Isolates the collapse stage's cost.
        for r, w in zip(out_refs[:n_words], ws):
            r[:] = w
        out_refs[n_words][:] = valid.astype(out_refs[n_words].dtype)
        return
    if algo == "packed":
        # MEASUREMENT ONLY (scripts/vpu_floor.py): same dedup as prod,
        # but the residual key word (s = 2k-32(W-1) bits) and the
        # count (<= seg, 2 bits at seg=2) share ONE u16 plane —
        # 6 B/lane out instead of 9 at W=2.  Probes whether the
        # kernel-shape floor is store-bandwidth-bound; NOT a table
        # contract (no consumer decodes it).
        s_res = 2 * k - 32 * (n_words - 1)
        sw, cnt = _dedup_runlen(ws, seg, axis=0)
        for r, w in zip(out_refs[:n_words - 1], sw[:-1]):
            r[:] = w
        packed = ((sw[-1] & jnp.uint32((1 << s_res) - 1))
                  | (cnt.astype(jnp.uint32) << jnp.uint32(s_res)))
        out_refs[n_words - 1][:] = packed.astype(jnp.uint16)
        return
    if algo == "dedup":
        # all-pairs in-segment dedup, segmented over the full array:
        # seg-1 full-height passes, no per-segment unroll
        sw, cnt = _dedup_runlen(ws, seg, axis=0)
        for r, w in zip(out_refs[:n_words], sw):
            r[:] = w
        out_refs[n_words][:] = cnt.astype(out_refs[n_words].dtype)
        return
    for s in range(P_pad // seg):
        seg_ws = [lax.slice_in_dim(w, s * seg, (s + 1) * seg, axis=0)
                  for w in ws]
        sw, cnt = _sort_runlen(seg_ws, seg, axis=0)
        for r, w in zip(out_refs[:n_words], sw):
            r[s * seg:(s + 1) * seg, :] = w
        out_refs[n_words][s * seg:(s + 1) * seg, :] = \
            cnt.astype(out_refs[n_words].dtype)


def fused_extract_count_T(codes_t: jnp.ndarray, lengths: jnp.ndarray,
                          limits: jnp.ndarray | None, k: int, *,
                          canonical: bool = False,
                          mask_ambiguous: bool = False,
                          seg: int = 16,
                          block_lanes: int = BLOCK_LANES,
                          algo: str | None = None,
                          extract: str | None = None,
                          positions: tuple[int, ...] | None = None,
                          interpret: bool = False):
    """(L, B) uint8 transposed codes -> (repacked_words_flat, counts_flat).

    Output follows the grouped partial-aggregation contract
    (ops/count.grouped_count_repacked): the flat stream is partitioned
    into seg-sized sublane segments of the (P_pad, B_pad) lane grid,
    each independently sorted and run-length encoded; equal keys may
    recur across segments (host KmerTable.from_pairs aggregates).
    Rows >= P and padded lanes carry SENTINEL keys with count 0.

    Supports W <= 2 key words (k <= 15 or 17 <= k <= 31) with the
    doubling/slicesum extractors; the MXU extractor
    (KMER_TPU_FUSED_EXTRACT=mxu) lifts that to ANY k <= 63, including
    the s == 0 widths k = 16/32/48 (its 24-bit chunks stitch into
    arbitrarily many repacked words).  seg must be a power of two.
    """
    import os
    L, B = codes_t.shape
    span = (positions[-1] + 1) if positions else k
    if positions is not None:
        assert len(positions) == k and positions[0] == 0, positions
    P = L - span + 1
    assert P >= 1, (L, span)
    assert seg >= 2 and (seg & (seg - 1)) == 0, seg
    W = words_per_key(k)
    extract_algo = extract or os.environ.get("KMER_TPU_FUSED_EXTRACT",
                                             "auto")
    # the tile override must resolve BEFORE backend selection so the
    # fits-guard budgets the tile the kernel will actually allocate
    block_lanes = int(os.environ.get("KMER_TPU_FUSED_BL",
                                     str(block_lanes)))
    if positions is not None:
        # spaced seeds exist only in the per-chunk banded-matmul
        # formulation (doubling/slicesum assume contiguous windows;
        # the shared-band tables assume chunks are shifted copies)
        if extract_algo not in ("mxu", "mxu8"):
            extract_algo = "mxu"
    elif extract_algo == "auto":
        extract_algo = select_fused_extract(k, L, canonical,
                                            mask_ambiguous,
                                            block_lanes=block_lanes)
        if extract_algo is None:
            raise ValueError(
                f"no fused extraction backend fits (k={k}, L={L}); "
                f"use the XLA path")
    if extract_algo.startswith("mxu"):
        assert k <= 63, (k, "unsupported key width")
    elif extract_algo != "copy":
        assert W <= 2 and 2 * k != 32, (k, "use the untransposed path")
    P_pad = -(-P // seg) * seg
    L_pad = P_pad + span - 1
    # small batches: shrink the lane block to the 128-lane tile multiple
    # covering B instead of padding way past it
    block_lanes = min(block_lanes, -(-B // 128) * 128)
    pad_b = (-B) % block_lanes
    if L_pad > L or pad_b:
        codes_t = jnp.pad(codes_t, ((0, L_pad - L), (0, pad_b)))
    if limits is None:
        limits = jnp.full((B,), P, jnp.int32)
    if pad_b:
        lengths = jnp.pad(lengths, (0, pad_b))
        limits = jnp.pad(limits, (0, pad_b))
    Bp = B + pad_b
    len2 = lengths.reshape(1, Bp).astype(jnp.int32)
    lim2 = limits.reshape(1, Bp).astype(jnp.int32)

    cspec = pl.BlockSpec((L_pad, block_lanes), lambda q: (0, q),
                         memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((1, block_lanes), lambda q: (0, q),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((P_pad, block_lanes), lambda q: (0, q),
                         memory_space=pltpu.VMEM)
    # i8 counts are the DEFAULT (VERDICT r3 #1b): in-segment runs never
    # exceed seg, device time measured neutral (VPU-bound step), and
    # the count plane is 1/4 the write traffic in-kernel AND 1/4 the
    # count D2H downstream.  KMER_TPU_COUNTS_DTYPE=i32 restores the
    # full plane; seg > 127 always uses i32.
    cnt_dtype = (jnp.int8 if os.environ.get("KMER_TPU_COUNTS_DTYPE",
                                            "i8") == "i8" and seg <= 127
                 else jnp.int32)
    out_shapes = ([jax.ShapeDtypeStruct((P_pad, Bp), jnp.uint32)
                   for _ in range(W)]
                  + [jax.ShapeDtypeStruct((P_pad, Bp), cnt_dtype)])
    if algo is None:
        algo = os.environ.get("KMER_TPU_FUSED_ALGO", "sort")
    if algo == "packed":          # measurement-only (see _kernel)
        # residual key bits + count bits (count <= seg) must fit u16
        assert 2 * k - 32 * (W - 1) + (seg + 1).bit_length() <= 16, k
        out_shapes = ([jax.ShapeDtypeStruct((P_pad, Bp), jnp.uint32)
                       for _ in range(W - 1)]
                      + [jax.ShapeDtypeStruct((P_pad, Bp), jnp.uint16)])
    in_specs = [cspec, rspec, rspec]
    operands = [codes_t, len2, lim2]
    if extract_algo.startswith("mxu"):
        sub = _MXU_SUB8 if extract_algo.endswith("8") else _MXU_SUB
        if extract_algo in ("mxus", "mxus8"):
            wmat, _Re, _Ra = _mxu_weights_shared(k, P_pad, L_pad,
                                                 canonical,
                                                 mask_ambiguous, sub=sub)
        else:
            wmat, _R, _ = _mxu_weights(k, P_pad, L_pad, canonical,
                                       mask_ambiguous, positions,
                                       sub=sub)
        wj = jnp.asarray(wmat, jnp.int8 if extract_algo.endswith("8")
                         else jnp.bfloat16)
        in_specs.append(pl.BlockSpec(wj.shape, lambda q: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(wj)
    outs = pl.pallas_call(
        functools.partial(_kernel, k=k, P=P, P_pad=P_pad, seg=seg,
                          n_words=W, canonical=canonical,
                          mask_ambiguous=mask_ambiguous, algo=algo,
                          extract_algo=extract_algo, span=span),
        grid=(Bp // block_lanes,),
        in_specs=in_specs,
        out_specs=[ospec] * len(out_shapes),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    if algo == "packed":          # measurement-only raw planes
        return [w.reshape(-1) for w in outs[:-1]], outs[-1].reshape(-1)
    return [w.reshape(-1) for w in outs[:W]], outs[W].reshape(-1)
