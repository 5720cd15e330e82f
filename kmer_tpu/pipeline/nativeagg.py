"""Native multithreaded (key, count) pair aggregation binding.

`KmerTable.from_pairs` is the single choke point every host merge
funnels through (per-batch compaction, buffered flushes, streaming
partition counts, multihost partials).  Its numpy core — one argsort /
lexsort + reduceat — is single-threaded; on a many-core production host
the device pipeline (~30 B kmers/s) outruns it by orders of magnitude.
This binding routes large batches through a C++ bucket-parallel
sort-reduce (native/aggregate.cpp), auto-built with g++ on first use
like io.fasta's parser; the numpy path remains both the fallback and
the small-batch fast path.

The native output is bit-identical to numpy's (sorted unique keys;
int64 count sums are order-independent), pinned by
tests/test_native_agg.py across widths, duplicate ratios, and edge
keys.

Env:
  KMER_TPU_NATIVE_AGG   = 0 (disable) | 1 (force, any size) | auto
  KMER_TPU_AGG_THREADS  = thread count (default: min(cpu_count, 16))
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "native")
_SO_PATH = os.path.join(_DIR, "libkmer_agg.so")
_lib = None
_lib_failed = False

# below this the single-threaded numpy path wins (thread spin-up +
# ctypes marshalling overhead; measured crossover is well under 64k —
# see scripts/host_merge_bench.py)
MIN_N = 1 << 16


def _load():
    """Load (building if needed) the native aggregator; None if
    unavailable (no g++ / build failure) — callers fall back to numpy."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        from ..utils.nativebuild import autobuild_cdll
        lib = autobuild_cdll(os.path.join(_DIR, "aggregate.cpp"), _SO_PATH)
        lib.aggregate_pairs.restype = ctypes.c_int64
        lib.aggregate_pairs.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_int64)]
        lib.decode_lines.restype = ctypes.c_int
        lib.decode_lines.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.format_tsv.restype = ctypes.c_int64
        lib.format_tsv.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
        _lib = lib
    except Exception:
        _lib_failed = True
        _lib = None
    return _lib


def _threads() -> int:
    env = os.environ.get("KMER_TPU_AGG_THREADS")
    if env:
        try:
            return max(1, int(env))
        except ValueError:
            pass        # malformed knob: default, like the other envs
    return min(os.cpu_count() or 1, 16)


def aggregate_fused(fused_ls: list[np.ndarray],
                    counts: np.ndarray) -> tuple[list[np.ndarray],
                                                 np.ndarray] | None:
    """Aggregate from_pairs' fused-u64 representation natively.

    fused_ls: 1 or 2 uint64 columns, LEAST-significant first (exactly
    the `fused` list from_pairs builds); counts: (n,) int64.
    Returns (cols_ms, counts) — unique keys ascending, columns
    MOST-significant first — or None when the native path is off,
    unavailable, not worth it (n < MIN_N), or the key is wider than
    128 bits (never happens for k <= 63).
    """
    mode = os.environ.get("KMER_TPU_NATIVE_AGG", "auto")
    if mode == "0" or len(fused_ls) > 2:
        return None
    n = len(counts)
    if mode != "1" and n < MIN_N:
        return None
    lib = _load()
    if lib is None:
        return None
    nw = len(fused_ls)
    if nw == 1:
        keys = np.ascontiguousarray(fused_ls[0], np.uint64)
    else:
        keys = np.empty((n, 2), np.uint64)
        keys[:, 0] = fused_ls[1]       # MS word first for the C side
        keys[:, 1] = fused_ls[0]
    counts = np.ascontiguousarray(counts, np.int64)
    out_k = np.empty_like(keys).reshape(n, nw)
    out_c = np.empty(n, np.int64)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    m = lib.aggregate_pairs(
        keys.ctypes.data_as(u64p), counts.ctypes.data_as(i64p),
        n, nw, _threads(),
        out_k.ctypes.data_as(u64p), out_c.ctypes.data_as(i64p))
    if m < 0:
        # -1/-2 (bad args / OOM): let numpy try — it may still fit,
        # and a wrong-shape bug shows up as a test diff, not silence
        return None
    # copy the live prefix so the n-row scratch isn't pinned by a view
    out_k = out_k[:m].copy()
    out_c = out_c[:m].copy()
    if nw == 1:
        return [out_k.reshape(-1)], out_c
    return [out_k[:, 0], out_k[:, 1]], out_c


# below this the numpy decode's fixed setup wins; measured crossover is
# far lower — this just avoids ctypes overhead on tiny lookups
DECODE_MIN_N = 1 << 12


def decode_rows(words: np.ndarray, n_bases: int,
                newline: bool) -> np.ndarray | None:
    """Native batch decode of (n, W) uint32 std key words to an
    (n, n_bases [+1]) uint8 ASCII array ('A'/'C'/'G'/'T', optional
    trailing '\\n' per row) — the ops/encode decode hot path (parity
    dump, TSV dump).  One multithreaded pass instead of n_bases strided
    numpy passes.  Returns None when the native path is off/unavailable
    or the batch is small (callers fall back to numpy)."""
    mode = os.environ.get("KMER_TPU_NATIVE_AGG", "auto")
    if mode == "0":
        return None
    n = len(words)
    if mode != "1" and n < DECODE_MIN_N:
        return None
    lib = _load()
    if lib is None:
        return None
    from ..ops.encode import words_per_key
    words = np.ascontiguousarray(words, np.uint32)
    if words.ndim != 2 or words.shape[1] != words_per_key(n_bases):
        # wrong-width caller: decline so the numpy path raises its
        # words_per_key assertion instead of decoding garbage
        # (width includes the sentinel bit: for 2k%32==0 — k=16/32/48 —
        # the sentinel adds a word; the C wi/sh indexing handles it)
        return None
    stride = n_bases + (1 if newline else 0)
    out = np.empty((n, stride), np.uint8)
    rc = lib.decode_lines(
        words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        n, words.shape[1], n_bases, 1 if newline else 0, _threads(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        return None
    return out


def format_tsv_rows(words: np.ndarray, counts: np.ndarray,
                    n_bases: int) -> bytes | None:
    """Native "BASES\\tCOUNT\\n" rendering of table rows (the
    KmerTable.write_tsv hot path; numpy's per-row %d printf is ~1-2 M
    rows/s).  Returns the rendered bytes, or None (off/unavailable/
    small batch) for the numpy fallback."""
    mode = os.environ.get("KMER_TPU_NATIVE_AGG", "auto")
    if mode == "0":
        return None
    n = len(counts)
    if mode != "1" and n < DECODE_MIN_N:
        return None
    lib = _load()
    if lib is None:
        return None
    from ..ops.encode import words_per_key
    words = np.ascontiguousarray(words, np.uint32)
    if words.ndim != 2 or words.shape[1] != words_per_key(n_bases):
        return None                      # see decode_rows
    counts = np.ascontiguousarray(counts, np.int64)
    # worst case: bases + tab + sign + 19 digits + newline
    cap = n * (n_bases + 22)
    out = np.empty(cap, np.uint8)
    total = lib.format_tsv(
        words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, words.shape[1], n_bases, _threads(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if total < 0:
        return None
    return out[:total].tobytes()
