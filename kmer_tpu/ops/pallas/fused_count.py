"""Fused grouped sort + run-length Pallas kernel — the sort-mode hot
path (replaces the reference's Vec::sort + implicit run counting,
k-mer-count/src/main.rs:87-90, with a TPU-resident formulation).

Why fused: measured on v5e (scripts/r2_sort_experiments.py), the XLA
grouped sort costs ~0.97 ms and the separate run-length scan ~0.80 ms
per 4.26 M keys — the scan's reverse cummin alone makes log(m) HBM-level
passes.  Here one kernel invocation DMAs a block of groups into VMEM,
runs the full bitonic network and the suffix-min run-length scan on
registers/VMEM, and writes back sorted keys + run counts: HBM sees each
key exactly once in and once out.

Key layout: repacked words (ops/count.repack_words) — word 0 is the
32-bit sort key, the remaining words ride as payload (single-word
comparator; ties may leave equal keys non-adjacent, absorbed by the
partial-aggregation contract).  The LAST word doubles as the validity
channel (< 2^s for real lanes, SENTINEL for invalid ones).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SENTINEL = 0xFFFFFFFF          # plain int: jnp constants can't be
                               # closure-captured by a pallas kernel

# block of groups per grid step: (BLOCK_G, m) uint32 per word array.
# 64 x 512 x 4 B = 128 KiB per operand; a W=2 kernel keeps ~8 live
# arrays -> ~1 MiB VMEM, well inside the 16 MiB/core budget.
BLOCK_G = 64


def _sort_runlen(ws: list, m: int, axis: int):
    """Bitonic sort + run-length over VMEM-resident repacked word arrays
    along `axis` (1 = m on lanes, 0 = m on sublanes — compare-exchange
    strides >= 8 are then vreg-index moves instead of lane rotations).
    m must be a power of two.  Validity comes from the LAST word
    (SENTINEL on invalid lanes).  Returns (sorted_ws, counts)."""
    idx = lax.broadcasted_iota(jnp.uint32, ws[0].shape, axis)
    idx_i = idx.astype(jnp.int32)

    # ---- bitonic sort along `axis` (m a power of two) ----
    k_ = 2
    while k_ <= m:
        asc = (idx & k_) == 0                        # ascending block
        j = k_ // 2
        while j >= 1:
            upper = (idx & j) != 0                   # partner is below
            take_min = asc ^ upper
            partner = [jnp.where(upper,
                                 pltpu.roll(w, j, axis=axis),     # x[i-j]
                                 pltpu.roll(w, m - j, axis=axis))  # x[i+j]
                       for w in ws]
            p0, w0 = partner[0], ws[0]
            # strict compares keep equal-key pairs in place on BOTH
            # sides (a non-strict variant would duplicate one payload
            # and drop the other).  Pure i1 logic — a select over bool
            # vectors hits an unsupported i8->i1 truncation in Mosaic.
            takep = ((p0 < w0) & take_min) | ((p0 > w0) & ~take_min)
            ws = [jnp.where(takep, pw, w) for pw, w in zip(partner, ws)]
            j //= 2
        k_ *= 2

    # ---- run-length (suffix-min of start positions), all in VMEM ----
    is_start = idx == 0
    for w in ws:
        is_start = is_start | (w != pltpu.roll(w, 1, axis=axis))
    sp = jnp.where(is_start, idx_i, m)
    d = 1
    while d < m:
        sh = jnp.where(idx_i >= m - d, m,
                       pltpu.roll(sp, m - d, axis=axis))
        sp = jnp.minimum(sp, sh)                     # min over [i, i+2d)
        d *= 2
    next_start = jnp.where(idx_i == m - 1, m,
                           pltpu.roll(sp, m - 1, axis=axis))
    valid = ws[-1] != jnp.uint32(SENTINEL)
    counts = jnp.where(is_start & valid, next_start - idx_i, 0)
    return ws, counts


def _dedup_runlen(ws: list, seg: int, axis: int):
    """All-pairs duplicate counting within seg-sized segments — NO
    sort.  For each lane: the number of equal keys at larger in-segment
    positions plus itself, emitted at the FIRST occurrence; later
    duplicates emit 0.  Keys stream through in their original order.

    Equivalent to sort+run-length under the partial-aggregation
    contract (callers only need equal keys collapsed within a segment,
    never sorted order): seg-1 shifted full-word comparisons replace
    the bitonic's log^2(seg) compare-exchange stages of key compares
    PLUS per-word payload selects — and unlike the 1-word-comparator
    sort it compares ALL words, so there are no tie leaks.  The win
    grows with key width (gapped W=4 keys need no wide comparator).

    Runs SEGMENTED OVER THE WHOLE ARRAY: one roll per distance d over
    the full axis with an (idx & (seg-1)) guard confining pairs to
    their segment — seg-1 full-array passes total, instead of an
    unrolled per-segment loop (which at gapped stream depths would be
    hundreds of segments' worth of Mosaic instructions).  The axis
    length must be a multiple of seg; seg a power of two."""
    n = ws[0].shape[axis]
    assert n % seg == 0 and (seg & (seg - 1)) == 0, (n, seg)
    idx = lax.broadcasted_iota(jnp.int32, ws[0].shape, axis)
    s_idx = idx & (seg - 1)                  # position within segment
    total = jnp.ones(ws[0].shape, jnp.int32)          # self
    dupc = jnp.zeros(ws[0].shape, jnp.int32)
    for d in range(1, seg):
        eq = s_idx < (seg - d)           # row i pairs with row i+d
        for w in ws:
            eq = eq & (w == pltpu.roll(w, n - d, axis=axis))  # x[i+d]
        # roll as i32, not i1 (Mosaic: "Rotate with non-32-bit data" is
        # unimplemented); the source-side s_idx guard already zeroes
        # every lane that would wrap across a segment (or the array
        # end), so the rolled value needs no destination mask
        eqi = eq.astype(jnp.int32)
        total = total + eqi
        dupc = dupc + pltpu.roll(eqi, d, axis=axis)  # i+d: earlier equal
    valid = ws[-1] != jnp.uint32(SENTINEL)
    counts = jnp.where(valid & (dupc == 0), total, 0)
    return ws, counts


def _kernel(*refs, n_words: int, m: int, axis: int = 1):
    in_refs = refs[:n_words]
    out_refs = refs[n_words:2 * n_words]
    cnt_ref = refs[2 * n_words]
    ws, counts = _sort_runlen([r[:] for r in in_refs], m, axis)
    for r, w in zip(out_refs, ws):
        r[:] = w
    cnt_ref[:] = counts


def _scan_kernel(*refs, n_words: int, m: int):
    """Run-length only: inputs already group-sorted (XLA's variadic sort
    is measured-faster than the in-kernel bitonic; the scan is where
    XLA loses — lax.cummin makes log(m) full passes while this kernel
    does the suffix-min entirely in VMEM, one HBM read + one write)."""
    in_refs = refs[:n_words]
    cnt_ref = refs[n_words]
    ws = [r[:] for r in in_refs]
    idx = lax.broadcasted_iota(jnp.uint32, ws[0].shape, 1)
    idx_i = idx.astype(jnp.int32)
    is_start = idx == 0
    for w in ws:
        is_start = is_start | (w != pltpu.roll(w, 1, axis=1))
    sp = jnp.where(is_start, idx_i, m)
    d = 1
    while d < m:
        sh = jnp.where(idx_i >= m - d, m, pltpu.roll(sp, m - d, axis=1))
        sp = jnp.minimum(sp, sh)
        d *= 2
    next_start = jnp.where(idx_i == m - 1, m, pltpu.roll(sp, m - 1, axis=1))
    valid = ws[-1] != jnp.uint32(SENTINEL)
    cnt_ref[:] = jnp.where(is_start & valid, next_start - idx_i, 0)


def run_lengths_grouped_pallas(sorted_2d: list[jnp.ndarray], *,
                               block_groups: int = BLOCK_G,
                               interpret: bool = False) -> jnp.ndarray:
    """counts (G, m) for group-sorted repacked words; validity from the
    last word.  Requires G % block_groups == 0 and m a multiple of 128."""
    G, m = sorted_2d[0].shape
    assert G % block_groups == 0, (G, block_groups)
    assert m % 128 == 0, m
    n_words = len(sorted_2d)
    spec = pl.BlockSpec((block_groups, m), lambda q: (q, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_scan_kernel, n_words=n_words, m=m),
        grid=(G // block_groups,),
        in_specs=[spec] * n_words,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((G, m), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*sorted_2d)


def fused_grouped_count(rwords: list[jnp.ndarray], *,
                        block_groups: int = BLOCK_G,
                        interpret: bool = False):
    """Sort each row of the (G, m) repacked word arrays by word 0
    (payload words follow) and run-length encode the rows.

    Requires m a power of two >= 128 and G a multiple of block_groups
    (callers pad with sentinel groups).  Returns (sorted_rwords,
    counts) with counts[i] = multiplicity of the run starting at lane i
    (0 elsewhere / for sentinel runs).
    """
    G, m = rwords[0].shape
    assert m >= 128 and (m & (m - 1)) == 0, f"m={m} must be a pow2 >= 128"
    assert G % block_groups == 0, (G, block_groups)
    n_words = len(rwords)

    spec = pl.BlockSpec((block_groups, m), lambda q: (q, 0),
                        memory_space=pltpu.VMEM)
    out_shapes = ([jax.ShapeDtypeStruct((G, m), jnp.uint32)
                   for _ in range(n_words)]
                  + [jax.ShapeDtypeStruct((G, m), jnp.int32)])
    outs = pl.pallas_call(
        functools.partial(_kernel, n_words=n_words, m=m),
        grid=(G // block_groups,),
        in_specs=[spec] * n_words,
        out_specs=[spec] * (n_words + 1),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*rwords)
    return list(outs[:n_words]), outs[n_words]


def fused_grouped_count_sublane(rwords_t: list[jnp.ndarray], *,
                                block_lanes: int = 512,
                                interpret: bool = False):
    """Transposed variant: arrays are (m, G) with the sort axis on
    SUBLANES — bitonic strides >= 8 become vreg-index moves instead of
    lane rotations (the axis-1 kernel measured slower than XLA's sort;
    this probes whether roll cost was the reason).  Requires m a power
    of two (any >= 2) and G a multiple of block_lanes.
    Returns (sorted_rwords_t, counts_t), same (m, G) layout.
    """
    m, G = rwords_t[0].shape
    assert (m & (m - 1)) == 0, f"m={m} must be a pow2"
    assert G % block_lanes == 0, (G, block_lanes)
    n_words = len(rwords_t)

    spec = pl.BlockSpec((m, block_lanes), lambda q: (0, q),
                        memory_space=pltpu.VMEM)
    out_shapes = ([jax.ShapeDtypeStruct((m, G), jnp.uint32)
                   for _ in range(n_words)]
                  + [jax.ShapeDtypeStruct((m, G), jnp.int32)])
    outs = pl.pallas_call(
        functools.partial(_kernel, n_words=n_words, m=m, axis=0),
        grid=(G // block_lanes,),
        in_specs=[spec] * n_words,
        out_specs=[spec] * (n_words + 1),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*rwords_t)
    return list(outs[:n_words]), outs[n_words]
