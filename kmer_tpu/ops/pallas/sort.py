"""Pallas TPU bitonic sort over multi-word uint32 keys (SURVEY.md §7.5 —
"the hard kernel").

Why not lax.sort: XLA lowers sort to a comparator network where every
stage round-trips HBM — log^2(n) ≈ 400 passes for n = 1M keys, which is
exactly HBM-bound (~20 ms measured for 2-word keys).  Here the network
is restructured around VMEM residency:

  * The flat array (padded to a power of two) is split into chunks of M
    elements; a chunk lives in VMEM as an (r_c, 128) matrix in
    column-major order (within-chunk index t = c*r_c + i at row i, lane
    c).  One pallas grid step sorts a whole chunk: ALL log^2(M) ≈ 190
    compare-exchange stages run on-chip — sublane rolls for distances
    < r_c, lane rolls for larger — so a chunk makes exactly one HBM
    round trip for its entire sort instead of one per stage.
  * Merge levels above M cross chunks.  Their upper stages are cheap
    jnp row-space compare-exchanges (chunk q pairs with q ^ (jj/M) at
    identical row/lane — one fused XLA pass each; only ~6 exist for
    n = 2^21), and each level's within-chunk tail (all stages jj < M)
    is again a single pallas pass.
  * Direction masks derive from the within-chunk iota; global levels
    feed the per-chunk direction bit via program_id.

The comparator is lexicographic over W uint32 words (MSW first), so the
same kernel sorts 42-bit k=21 keys (W=2), single-word small-k keys, and
the 108-bit gapped parity keys (W=4).  The all-ones sentinel of invalid
lanes sorts to the end, which also makes power-of-two padding free.

Reference replaced: the per-record Vec<String> comparison sort at
k-mer-count/src/main.rs:87 (and the dead LSD radix sort, main.rs:9-40).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SENTINEL = jnp.uint32(0xFFFFFFFF)

LANES = 128              # lane (minor) dim of the on-chip chunk matrix
# Elements per VMEM-resident chunk.  2^16 compiles within the default
# 16 MiB scoped-vmem limit (the unrolled ~150-stage network keeps many
# temporaries live); larger chunks (2^17-2^18, slightly faster) need
# jax.jit(..., compiler_options={"xla_tpu_scoped_vmem_limit_kib":
# "65536"}) — v5e has headroom beyond the conservative default.
DEFAULT_CHUNK = 1 << 16
_MIN_FLAT = 1024         # below this, lax.sort is fine


def _lex_lt(a: list[jnp.ndarray], b: list[jnp.ndarray]) -> jnp.ndarray:
    """a < b lexicographic over word lists (MSW first), elementwise."""
    lt = eq = None
    for aw, bw in zip(a, b):
        if lt is None:
            lt, eq = aw < bw, aw == bw
        else:
            lt = lt | (eq & (aw < bw))
            eq = eq & (aw == bw)
    return lt


def _chunk_stage(vs, t_idx, jj: int, r_c: int, asc):
    """One in-chunk compare-exchange at within-chunk distance jj.

    Partner of t is t ^ jj: a sublane roll when jj < r_c, a lane roll
    otherwise (t = c*r_c + i, so distance jj/r_c in lanes).
    """
    upper = (t_idx & jj) != 0
    if jj < r_c:
        axis, d, size = 0, jj, r_c
    else:
        axis, d, size = 1, jj // r_c, LANES
    ps = [jnp.where(upper, pltpu.roll(v, d, axis=axis),
                    pltpu.roll(v, size - d, axis=axis)) for v in vs]
    lt = _lex_lt(ps, vs)                 # partner < self
    take_min = asc == ~upper
    sel = take_min == lt
    return [jnp.where(sel, p, v) for p, v in zip(ps, vs)]


def _chunk_sort_kernel(*refs, W: int, r_c: int, log2m: int):
    """Fully sort one chunk: bitonic levels kk = 2..M in VMEM.

    The final level's direction is the global bitonic direction bit of
    flat index bit log2(M), i.e. the chunk parity (program_id bit 0) —
    so after this kernel adjacent chunks form ascending/descending pairs
    ready for the cross-chunk merge.
    """
    in_refs, out_refs = refs[:W], refs[W:]
    vs = [ref[:] for ref in in_refs]
    i_idx = lax.broadcasted_iota(jnp.int32, (r_c, LANES), 0)
    c_idx = lax.broadcasted_iota(jnp.int32, (r_c, LANES), 1)
    t_idx = c_idx * r_c + i_idx
    last_asc = (pl.program_id(0) & 1) == 0
    for m in range(1, log2m + 1):
        kk = 1 << m
        asc = (t_idx & kk) == 0 if m < log2m else \
            jnp.full((r_c, LANES), last_asc, bool)
        for je in range(m - 1, -1, -1):
            vs = _chunk_stage(vs, t_idx, 1 << je, r_c, asc)
    for ref, v in zip(out_refs, vs):
        ref[:] = v


def _chunk_merge_kernel(*refs, W: int, r_c: int, log2m: int, kk_over_m: int):
    """Within-chunk tail (jj = M/2..1) of a global merge level kk: the
    direction bit (f & kk) is a chunk-index bit, constant per chunk."""
    in_refs, out_refs = refs[:W], refs[W:]
    vs = [ref[:] for ref in in_refs]
    i_idx = lax.broadcasted_iota(jnp.int32, (r_c, LANES), 0)
    c_idx = lax.broadcasted_iota(jnp.int32, (r_c, LANES), 1)
    t_idx = c_idx * r_c + i_idx
    asc_s = (pl.program_id(0) & kk_over_m) == 0
    asc = jnp.full((r_c, LANES), asc_s, bool)
    for je in range(log2m - 1, -1, -1):
        vs = _chunk_stage(vs, t_idx, 1 << je, r_c, asc)
    for ref, v in zip(out_refs, vs):
        ref[:] = v


def _pallas_chunks(kernel, arrs: list[jnp.ndarray], r_c: int,
                   interpret: bool, **kw) -> list[jnp.ndarray]:
    W = len(arrs)
    rows = arrs[0].shape[0]
    grid = (rows // r_c,)
    spec = pl.BlockSpec((r_c, LANES), lambda q: (q, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(kernel, W=W, r_c=r_c, **kw),
        grid=grid,
        in_specs=[spec] * W,
        out_specs=[spec] * W,
        out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.uint32)] * W,
        input_output_aliases={i: i for i in range(W)},
        interpret=interpret,
    )(*arrs)
    return list(out)


def _cross_chunk_stage(arrs: list[jnp.ndarray], dr: int, kkr: int
                       ) -> list[jnp.ndarray]:
    """Compare-exchange at flat distance jj >= M as one fused jnp pass.

    In the (rows, LANES) layout, flat partner f ^ jj is the SAME row
    offset and lane in chunk q ^ (jj/M): row distance dr = (jj/M)*r_c.
    Direction bit (f & kk) is row bit kkr = (kk/M)*r_c.
    """
    rows, s = arrs[0].shape
    g = rows // (2 * dr)
    xs = [a.reshape(g, 2, dr, s) for a in arrs]
    a_side = [x[:, 0] for x in xs]
    b_side = [x[:, 1] for x in xs]
    lt = _lex_lt(b_side, a_side)        # b < a, shape (g, dr, s)
    grp = lax.broadcasted_iota(jnp.int32, lt.shape, 0)
    asc = ((grp * 2 * dr) & kkr) == 0
    swap = asc == lt
    new_a = [jnp.where(swap, b, a) for a, b in zip(a_side, b_side)]
    new_b = [jnp.where(swap, a, b) for a, b in zip(a_side, b_side)]
    return [jnp.stack([na, nb], axis=1).reshape(rows, s)
            for na, nb in zip(new_a, new_b)]


def sort_words_pallas(words: list[jnp.ndarray], *,
                      chunk: int = DEFAULT_CHUNK,
                      interpret: bool = False) -> list[jnp.ndarray]:
    """Lexicographic multiset sort of flattened W-word uint32 keys.

    Drop-in replacement for ops.count.sort_words (the lax.sort path):
    returns the W sorted flat arrays, sentinels (and the power-of-two
    padding) at the end, truncated back to the input length.
    """
    flat = [w.reshape(-1).astype(jnp.uint32) for w in words]
    N = flat[0].shape[0]
    if N < _MIN_FLAT:
        return list(lax.sort(tuple(flat), num_keys=len(flat)))
    n = 1 << math.ceil(math.log2(N))
    M = min(chunk, n)
    r_c = M // LANES
    log2m = int(math.log2(M))
    pad = n - N
    if pad:
        flat = [jnp.concatenate([f, jnp.full((pad,), SENTINEL, jnp.uint32)])
                for f in flat]
    n_chunks = n // M
    # per-chunk column-major cell labels: f = q*M + c*r_c + i lives at
    # arr[q*r_c+i, c].  The INPUT assignment of values to cells is an
    # arbitrary bijection (we sort a multiset), so a plain row-major
    # reshape suffices on the way in; only the way OUT needs the real
    # inverse mapping.
    arrs = [f.reshape(n_chunks * r_c, LANES) for f in flat]

    arrs = _pallas_chunks(_chunk_sort_kernel, arrs, r_c, interpret,
                          log2m=log2m)
    log2n = int(math.log2(n))
    for m in range(log2m + 1, log2n + 1):
        kk = 1 << m
        for je in range(m - 1, log2m - 1, -1):
            jj = 1 << je
            arrs = _cross_chunk_stage(arrs, (jj // M) * r_c,
                                      (kk // M) * r_c)
        arrs = _pallas_chunks(_chunk_merge_kernel, arrs, r_c, interpret,
                              log2m=log2m, kk_over_m=kk // M)

    out = [a.reshape(n_chunks, r_c, LANES).swapaxes(1, 2).reshape(-1)[:N]
           for a in arrs]
    return out
