"""Fully fused gapped count step: sub-key tables -> per-chunk-size
combine -> in-segment collapse, in ONE Pallas kernel.

The gapped workload (reference main.rs:63-79: for every chunk size c in
[c_min, c_max] and offset o with o + c <= len, count the key
seq[o:o+l_len] ++ seq[o+c-r_len:o+c]) previously ran as XLA static-slice
extraction + a 3-comparator grouped sort — the sort dominating (each
W=4 key is 16 B of sort traffic).  Here one grid step loads a
(L, block_lanes) tile of transposed codes (~1 B/base), builds the
l_len-/r_len-mer sub-key tables by sublane slice-sum in VMEM, combines
them into REPACKED key words for every (c, o) lane with static-shift
word extraction (no gather — a per-lane gather serializes on TPU), and
collapses equal keys within seg-sized segments of the c-major stream.
HBM sees the codes once in and each key+count once out; there is no
sort at all in the dedup algorithm (ops/pallas/fused_count._dedup_runlen
— the partial-aggregation contract never needs sorted order, only
equal-keys-collapsed, and the host KmerTable.from_pairs absorbs the
rest).

Layout notes: keys are emitted in the repacked sort layout
(ops/count.repack_words): words 0..W-2 carry 32 key bits each from the
TOP of the 2*(l_len+r_len)-bit value, the LAST word carries the s
residual bits and doubles as the validity channel (SENTINEL on invalid
lanes).  Collapse segments may span chunk-size boundaries of the
c-major stream — equal (L, R) keys at different c are the SAME key, so
cross-boundary collapse is not just sound but free aggregation.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..encode import words_per_key
from ..extract import _extract32
from .fused_count import _dedup_runlen, _sort_runlen

SENTINEL = 0xFFFFFFFF


def _gapped_mxu_weights(n_len: int, P: int, L_pad: int,
                        mask_ambiguous: bool):
    """Host-built banded weights for one gapped sub-key table: exactly
    fused_extract._mxu_weights' forward(+amb) blocks — no RC bands, the
    gapped mode never canonicalizes (reference main.rs)."""
    from .fused_extract import _mxu_weights
    w, _R, _n = _mxu_weights(n_len, P, L_pad, canonical=False,
                             mask_ambiguous=mask_ambiguous)
    return w


def _build_table_mxu(c, w_ref, n_len: int, P: int, mask_ambiguous: bool):
    """MXU sub-key table: one banded matmul yields the <=3 24-bit
    subword chunks of every n_len-mer (exactness per
    fused_extract._mxu_extract); VPU converts and stitches into the
    (hi, lo) 32-bit-packed layout."""
    from .fused_extract import _MXU_SUB, _bits32
    n_sub = -(-n_len // _MXU_SUB)
    n_blk = n_sub + (1 if mask_ambiguous else 0)
    R = w_ref.shape[0] // n_blk
    cm = (c & jnp.uint32(3)) if mask_ambiguous else c
    # Mosaic has no u32->f32 convert; i32 hop is exact (codes 0..7)
    cb = cm.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
    # value bands only — the amb band rides its own indicator dot below
    acc = jnp.dot(w_ref[:n_sub * R], cb, preferred_element_type=jnp.float32)

    def chunk(i):
        s = lax.slice_in_dim(acc, i * R, i * R + P, axis=0)
        return s.astype(jnp.int32).astype(jnp.uint32)

    chunks = [chunk(m) for m in range(n_sub)]
    lo = _bits32(chunks, 0)
    hi = (_bits32(chunks, 32) if 2 * n_len > 32
          else jnp.zeros_like(lo))
    amb = None
    if mask_ambiguous:
        ind = (c >= 4).astype(jnp.int32).astype(jnp.float32) \
            .astype(jnp.bfloat16)
        wa = lax.slice_in_dim(w_ref[:], n_sub * R, n_sub * R + P, axis=0)
        amb = jnp.dot(wa, ind, preferred_element_type=jnp.float32) > 0.5
    W = words_per_key(n_len)
    return ([hi, lo] if W == 2 else [lo]), amb


def _build_table(c, n_len: int, P: int, mask_ambiguous: bool,
                 extract_algo: str = "doubling"):
    """Sub-key table: the n_len-mer value at rows 0..P-1 of transposed
    codes `c`, as 32-bit-packed words (MS first, _extract32's layout).
    Default O(log n) doubling (fused_extract._doubling_pair — its
    64-bit pair IS this layout); KMER_TPU_FUSED_EXTRACT=slicesum
    restores the O(n) slice-sum.  Returns (words, amb)."""
    W = words_per_key(n_len)
    assert W <= 2, n_len
    if extract_algo == "doubling":
        from .fused_extract import _doubling_pair
        hi, lo, amb_acc = _doubling_pair(c, n_len, P, mask_ambiguous)
        amb = (amb_acc != 0) if mask_ambiguous else None
        return ([hi, lo] if W == 2 else [lo]), amb
    shape = (P, c.shape[1])
    hi = jnp.zeros(shape, jnp.uint32) if W == 2 else None
    lo = jnp.zeros(shape, jnp.uint32)
    amb = jnp.zeros(shape, bool) if mask_ambiguous else None
    for j in range(n_len):
        sl = lax.slice_in_dim(c, j, j + P, axis=0)
        if mask_ambiguous:
            amb = amb | (sl >= 4)
            sl = sl & jnp.uint32(3)
        pos = 2 * (n_len - 1 - j)
        if pos >= 32:
            hi = hi | (sl << jnp.uint32(pos - 32))
        else:
            lo = lo | (sl << jnp.uint32(pos))
    return ([hi, lo] if W == 2 else [lo]), amb


def _kernel(codes_ref, len_ref, lim_ref, *rest, l_len: int, r_len: int,
            c_min: int, c_max: int, L: int, T_pad: int, seg: int,
            n_words: int, s_bits: int, mask_ambiguous: bool, algo: str,
            extract_algo: str = "doubling"):
    if extract_algo == "mxu":
        n_w = 1 if r_len == l_len else 2
        w_refs, out_refs = rest[:n_w], rest[n_w:]
    else:
        w_refs, out_refs = (), rest
    c = codes_ref[:].astype(jnp.uint32)              # (L_pad, bl)
    bl = c.shape[1]
    P_l = L - l_len + 1
    P_r = L - r_len + 1
    if extract_algo == "mxu":
        lw, lamb = _build_table_mxu(c, w_refs[0], l_len, P_l,
                                    mask_ambiguous)
        if r_len == l_len:
            rw, ramb = lw, lamb
        else:
            rw, ramb = _build_table_mxu(c, w_refs[1], r_len, P_r,
                                        mask_ambiguous)
    else:
        lw, lamb = _build_table(c, l_len, P_l, mask_ambiguous, extract_algo)
        if r_len == l_len:
            rw, ramb = lw, lamb
        else:
            rw, ramb = _build_table(c, r_len, P_r, mask_ambiguous,
                                    extract_algo)

    lens = len_ref[:].astype(jnp.int32)              # (1, bl)
    lims = lim_ref[:].astype(jnp.int32)
    bits = 2 * (l_len + r_len)
    sent = jnp.uint32(SENTINEL)
    parts = [[] for _ in range(n_words)]
    val_rows = 0
    for cv in range(c_min, c_max + 1):
        O_c = L - cv + 1
        if O_c <= 0:
            continue
        ls = [lax.slice_in_dim(w, 0, O_c, axis=0) for w in lw]
        rs = [lax.slice_in_dim(w, cv - r_len, cv - r_len + O_c, axis=0)
              for w in rw]
        o = lax.broadcasted_iota(jnp.int32, (O_c, bl), 0)
        valid = ((o + cv) <= lens) & (o < lims)
        if mask_ambiguous:
            valid = valid & ~lax.slice_in_dim(lamb, 0, O_c, axis=0)
            valid = valid & ~lax.slice_in_dim(
                ramb, cv - r_len, cv - r_len + O_c, axis=0)
        # repacked combine: word j < W-1 = V bits [bits-32(j+1), ...+32),
        # last word = the s_bits residual [0, s_bits)
        for j in range(n_words):
            p = bits - 32 * (j + 1) if j < n_words - 1 else 0
            w = _extract32(rs, p) | _extract32(ls, p - 2 * r_len)
            if j == n_words - 1:
                w = w & jnp.uint32((1 << s_bits) - 1)
            parts[j].append(jnp.where(valid, w, sent))
        val_rows += O_c
    pad_rows = T_pad - val_rows
    ws = []
    for j in range(n_words):
        if pad_rows:
            parts[j].append(jnp.full((pad_rows, bl), sent, jnp.uint32))
        ws.append(jnp.concatenate(parts[j], axis=0))

    if algo == "dedup":
        sw, cnt = _dedup_runlen(ws, seg, axis=0)
        for r, w in zip(out_refs[:n_words], sw):
            r[:] = w
        out_refs[n_words][:] = cnt.astype(out_refs[n_words].dtype)
        return
    for s in range(T_pad // seg):
        seg_ws = [lax.slice_in_dim(w, s * seg, (s + 1) * seg, axis=0)
                  for w in ws]
        sw, cnt = _sort_runlen(seg_ws, seg, axis=0)
        for r, w in zip(out_refs[:n_words], sw):
            r[s * seg:(s + 1) * seg, :] = w
        out_refs[n_words][s * seg:(s + 1) * seg, :] = \
            cnt.astype(out_refs[n_words].dtype)


def fused_gapped_fits(L: int, l_len: int, r_len: int, c_min: int,
                      c_max: int, block_lanes: int = 256,
                      seg: int = 2, cnt_bytes: int = 1) -> bool:
    """Whether the fused gapped kernel's VMEM footprint fits at this
    read length.  The scoped windows scale with T_pad = total chunk
    lanes per read column (sum over c of L-c+1), so long reads blow the
    128 MiB v5e budget: at L=512 the kernel wants ~228 MiB (measured,
    r4 tpu_check).  Model: per lane, the code tile (L u8) + n_words u32
    output planes + count plane + ~2 u32 sub-key tables + combine/dedup
    temporaries.  Measured calibration (r4): L=512 wanted 228 MiB of
    the 128 MiB budget; L=321 (grid 2) 107.25 MiB of the 96 MiB scoped
    limit; L=279 compact at grid 8 wanted 141.86 MiB — Mosaic
    double-buffers the output windows once the grid exceeds ~2 steps
    AND the kernel adds register-spill slots ~0.65x the window bytes,
    so the worst case is ~3.3x the single-buffered windows.  The cap
    is therefore 40 MiB of modeled bytes (max L ~215 at the reference
    geometry; ~<=90 MiB actual worst-case).  Callers re-tile long
    reads to max_fused_read_len instead (the XLA fallback's compile is
    pathological at large L)."""
    T = sum(L - cv + 1 for cv in range(c_min, c_max + 1) if L - cv + 1 > 0)
    if T <= 0:
        return False
    T_pad = -(-T // seg) * seg
    n_words = words_per_key(l_len + r_len)
    per_lane = (L                                 # code tile (u8)
                + T_pad * (4 * n_words + cnt_bytes)   # key+count planes
                + 4 * L * 2                       # sub-key value tables
                + T_pad * 4 * 2)                  # combine/dedup temps
    return per_lane * block_lanes <= 40 * 1024 * 1024


def _env_kernel_params() -> tuple[int, int, int]:
    """(seg, block_lanes, cnt_bytes) the kernel will ACTUALLY use —
    fused_gapped_count_T honors these env knobs, so the VMEM guard
    must model the same values, not its defaults."""
    seg = int(os.environ.get("KMER_TPU_GAPPED_SEG", "2"))
    bl = int(os.environ.get("KMER_TPU_GAPPED_BL", "256"))
    cnt = (1 if os.environ.get("KMER_TPU_COUNTS_DTYPE", "i8") == "i8"
           and seg <= 127 else 4)
    return seg, bl, cnt


@functools.lru_cache(maxsize=None)
def max_fused_read_len(l_len: int, r_len: int, c_min: int, c_max: int,
                       cap: int = 4096, block_lanes: int = 256,
                       seg: int = 2, cnt_bytes: int = 1) -> int:
    """Largest device row length (<= cap) whose fused gapped kernel
    fits VMEM, or 0 if none does.  The single-host and streaming
    drivers re-tile long reads to this length
    (pipeline.count.gapped_device_len); the mesh pairs step instead
    VALIDATES its per-shard width and raises with guidance
    (parallel.distributed.make_distributed_gapped_pairs).  The
    batcher's c_max-1 overlap seams make window extraction exact at
    any tiling, the fused kernel is ~20x the XLA fallback, and —
    decisive — the XLA grouped-sort fallback's compile blows up
    pathologically at large L on the TPU toolchain (an L=512 compile
    ran >45 min without finishing, r4).  Pass the seg/block_lanes/
    cnt_bytes the kernel will ACTUALLY use (_env_kernel_params)."""
    best = 0
    for L in range(c_max, cap + 1):
        if fused_gapped_fits(L, l_len, r_len, c_min, c_max,
                             block_lanes=block_lanes, seg=seg,
                             cnt_bytes=cnt_bytes):
            best = L
        elif best:
            break          # monotone beyond the first fit
    return best


def fused_gapped_count_T(codes_t: jnp.ndarray, lengths: jnp.ndarray,
                         limits: jnp.ndarray | None, *, l_len: int,
                         r_len: int, c_min: int, c_max: int,
                         mask_ambiguous: bool = False, seg: int = 2,
                         block_lanes: int = 256, algo: str | None = None,
                         interpret: bool = False):
    """(L, B) uint8 transposed codes -> (repacked_words_flat, counts_flat)
    over ALL gapped (c, o) chunk lanes, reference semantics
    (main.rs:63-79).

    Output follows the grouped partial-aggregation contract: the
    c-major lane stream (exact per-c widths L-c+1, as
    ops/extract.gapped_lanes) is collapsed within seg-sized segments;
    equal keys may recur across segments and grid blocks — the host
    KmerTable.from_pairs aggregates.  Lanes with count 0 are dead
    (later duplicates, padding, invalid); padded/invalid lanes carry
    SENTINEL keys.

    Eligibility: l_len, r_len <= 31 (W <= 2 sub-key words each) and
    2*(l_len+r_len) not a multiple of 32 (the repacked layout needs a
    residual word for the validity channel).
    """
    L, B = codes_t.shape
    seg = int(os.environ.get("KMER_TPU_GAPPED_SEG", str(seg)))
    block_lanes = int(os.environ.get("KMER_TPU_GAPPED_BL", str(block_lanes)))
    assert l_len >= 1 and r_len >= 1 and max(l_len, r_len) <= 31
    assert c_min >= l_len + r_len, "L and R windows must not overlap"
    assert seg >= 2 and (seg & (seg - 1)) == 0, seg
    bits = 2 * (l_len + r_len)
    n_words = words_per_key(l_len + r_len)
    s_bits = bits - 32 * (n_words - 1)
    assert 0 < s_bits < 32, (l_len, r_len, "residual word required")
    T = sum(L - cv + 1 for cv in range(c_min, c_max + 1) if L - cv + 1 > 0)
    assert T > 0, (L, c_min)
    T_pad = -(-T // seg) * seg

    block_lanes = min(block_lanes, -(-B // 128) * 128)
    pad_b = (-B) % block_lanes
    if pad_b:
        codes_t = jnp.pad(codes_t, ((0, 0), (0, pad_b)))
        lengths = jnp.pad(lengths, (0, pad_b))
    if limits is None:
        limits = jnp.full((B + pad_b,), L, jnp.int32)
    elif pad_b:
        limits = jnp.pad(limits, (0, pad_b))
    Bp = B + pad_b
    len2 = lengths.reshape(1, Bp).astype(jnp.int32)
    lim2 = limits.reshape(1, Bp).astype(jnp.int32)

    if algo is None:
        algo = os.environ.get("KMER_TPU_GAPPED_ALGO", "dedup")
    extract_algo = os.environ.get("KMER_TPU_FUSED_EXTRACT", "auto")
    if extract_algo == "auto":
        # gapped sub-keys are <= 31 bases, so doubling always covers
        # them; mxu stays opt-in here (measured ~parity on v5e)
        extract_algo = "doubling"
    if extract_algo == "mxu":
        # VMEM budget guard (weights + accumulators grow O(n_len/12*L));
        # doubling covers every gapped-eligible width, so fall back
        from .fused_extract import _MXU_SUB
        rows = sum((-(-nl // _MXU_SUB) + (1 if mask_ambiguous else 0))
                   * (-(-(L - nl + 1) // 16) * 16)
                   for nl in ({l_len, r_len}))
        if rows * (L * 2 + block_lanes * 4) > 24 * 1024 * 1024:
            extract_algo = "doubling"
    cspec = pl.BlockSpec((L, block_lanes), lambda q: (0, q),
                         memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((1, block_lanes), lambda q: (0, q),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((T_pad, block_lanes), lambda q: (0, q),
                         memory_space=pltpu.VMEM)
    # i8 counts default — see fused_extract (device-neutral, 4x less
    # count write + D2H traffic); KMER_TPU_COUNTS_DTYPE=i32 restores
    cnt_dtype = (jnp.int8 if os.environ.get("KMER_TPU_COUNTS_DTYPE",
                                            "i8") == "i8" and seg <= 127
                 else jnp.int32)
    out_shapes = ([jax.ShapeDtypeStruct((T_pad, Bp), jnp.uint32)
                   for _ in range(n_words)]
                  + [jax.ShapeDtypeStruct((T_pad, Bp), cnt_dtype)])
    in_specs = [cspec, rspec, rspec]
    operands = [codes_t, len2, lim2]
    if extract_algo == "mxu":
        lens_needed = [l_len] if r_len == l_len else [l_len, r_len]
        for nl in lens_needed:
            wmat = _gapped_mxu_weights(nl, L - nl + 1, L, mask_ambiguous)
            wj = jnp.asarray(wmat, jnp.bfloat16)
            in_specs.append(pl.BlockSpec(wj.shape, lambda q: (0, 0),
                                         memory_space=pltpu.VMEM))
            operands.append(wj)
    outs = pl.pallas_call(
        functools.partial(_kernel, l_len=l_len, r_len=r_len, c_min=c_min,
                          c_max=c_max, L=L, T_pad=T_pad, seg=seg,
                          n_words=n_words, s_bits=s_bits,
                          mask_ambiguous=mask_ambiguous, algo=algo,
                          extract_algo=extract_algo),
        grid=(Bp // block_lanes,),
        in_specs=in_specs,
        out_specs=[ospec] * (n_words + 1),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    return [w.reshape(-1) for w in outs[:n_words]], outs[n_words].reshape(-1)
