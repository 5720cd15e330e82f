"""Host FASTA ingest: native C++ parser binding + batching into
fixed-shape device arrays.

The native library (io/native/fasta_pack.cpp) replaces the reference's
Rust bio::io::fasta layer (main.rs:44-62).  It is auto-built with g++ on
first use if the .so is missing; a vectorized NumPy fallback keeps the
framework functional without a toolchain.

Output contract of `parse_fasta`: (codes, offsets)
  codes:   (total_bases,) uint8 2-bit codes, all records concatenated
  offsets: (n_records+1,) int64, record r = codes[offsets[r]:offsets[r+1]]
"""

from __future__ import annotations

import ctypes
import os
from dataclasses import dataclass
from typing import Iterator

import numpy as np

from ..ops.encode import InvalidBaseError

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libfasta_pack.so")
_lib = None
_lib_failed = False


def _load_native():
    """Load (building if needed) the native parser; None if unavailable."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        from ..utils.nativebuild import autobuild_cdll
        lib = autobuild_cdll(os.path.join(_NATIVE_DIR, "fasta_pack.cpp"),
                             _SO_PATH, extra_link=("-lz",))
        lib.fasta_scan.restype = ctypes.c_int
        lib.fasta_scan.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_char_p, ctypes.c_int64]
        lib.fasta_parse.restype = ctypes.c_int
        lib.fasta_parse.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_char_p, ctypes.c_int64]
        lib.fasta_scan_mt.restype = ctypes.c_int
        lib.fasta_scan_mt.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_char_p, ctypes.c_int64]
        lib.fasta_parse_mt.restype = ctypes.c_int
        lib.fasta_parse_mt.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_char_p, ctypes.c_int64]
        lib.fastq_scan.restype = ctypes.c_int
        lib.fastq_scan.argtypes = lib.fasta_scan.argtypes
        lib.fastq_parse.restype = ctypes.c_int
        # fastq parse entry points take min_qual after allow_ambiguous
        lib.fastq_parse.argtypes = (lib.fasta_parse.argtypes[:2]
                                    + [ctypes.c_int]
                                    + lib.fasta_parse.argtypes[2:])
        lib.fastq_scan_mt.restype = ctypes.c_int
        lib.fastq_scan_mt.argtypes = lib.fasta_scan_mt.argtypes
        lib.fastq_parse_mt.restype = ctypes.c_int
        lib.fastq_parse_mt.argtypes = (lib.fasta_parse_mt.argtypes[:2]
                                       + [ctypes.c_int]
                                       + lib.fasta_parse_mt.argtypes[2:])
        lib.fill_batch.restype = None
        lib.fill_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64]
        lib.fill_batch_packed.restype = None
        lib.fill_batch_packed.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64]
        lib.ingest_open.restype = ctypes.c_void_p
        lib.ingest_open.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.ingest_close.restype = None
        lib.ingest_close.argtypes = [ctypes.c_void_p]
        lib.ingest_tell.restype = ctypes.c_int64
        lib.ingest_tell.argtypes = [ctypes.c_void_p]
        chunk_sig = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int), ctypes.c_char_p, ctypes.c_int64]
        lib.bgzf_usize.restype = ctypes.c_int64
        lib.bgzf_usize.argtypes = [ctypes.c_char_p]
        lib.bgzf_cache_clear.restype = None
        lib.bgzf_cache_clear.argtypes = []
        lib.fasta_chunk.restype = ctypes.c_int
        lib.fasta_chunk.argtypes = chunk_sig
        lib.fastq_chunk.restype = ctypes.c_int
        lib.fastq_chunk.argtypes = (chunk_sig[:2] + [ctypes.c_int]
                                    + chunk_sig[2:])
        _lib = lib
    except Exception:
        _lib_failed = True
        _lib = None
    return _lib


_ERRCODES = {
    -1: "cannot open file",
    -2: "malformed FASTA",
    -3: "invalid base",
    -4: "internal buffer overflow",
}


def _parse_native_two_pass(path: str, allow_ambiguous: bool, scan, parse
                           ) -> tuple[np.ndarray, np.ndarray]:
    err = ctypes.create_string_buffer(256)
    nrec = ctypes.c_int64(0)
    nbase = ctypes.c_int64(0)
    amb = 1 if allow_ambiguous else 0
    rc = scan(path.encode(), amb, ctypes.byref(nrec),
              ctypes.byref(nbase), err, 256)
    if rc != 0:
        msg = err.value.decode() or _ERRCODES.get(rc, f"error {rc}")
        raise (InvalidBaseError if rc == -3 else ValueError)(f"{path}: {msg}")
    codes = np.empty(max(int(nbase.value), 1), dtype=np.uint8)
    offsets = np.empty(int(nrec.value) + 1, dtype=np.int64)
    rc = parse(
        path.encode(), amb,
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), codes.size,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), offsets.size,
        ctypes.byref(nrec), ctypes.byref(nbase), err, 256)
    if rc != 0:
        msg = err.value.decode() or _ERRCODES.get(rc, f"error {rc}")
        raise (InvalidBaseError if rc == -3 else ValueError)(f"{path}: {msg}")
    # BGZF inputs: both passes shared one cached decompressed buffer;
    # release it now so a corpus-sized allocation never outlives parse
    _lib.bgzf_cache_clear()
    return codes[: int(nbase.value)], offsets


def _check_min_qual(allow_ambiguous: bool, min_qual: int) -> None:
    """Quality masking writes the ambiguous code into the stream: a
    caller that advertised a strict 0..3 stream (allow_ambiguous=False)
    would silently corrupt downstream keys — reject the combination at
    every public parse entry point (KmerConfig enforces the same
    pairing for the pipeline)."""
    if min_qual > 0 and not allow_ambiguous:
        raise ValueError("min_qual masks bases to the ambiguous code; "
                         "pass allow_ambiguous=True")


def _parse_threads() -> int:
    """Threads for the multithreaded whole-file FASTA parse
    (KMER_TPU_PARSE_THREADS overrides; gzip/tiny files stay serial
    inside the native library regardless)."""
    env = os.environ.get("KMER_TPU_PARSE_THREADS")
    if env:
        return max(1, int(env))
    return min(os.cpu_count() or 1, 8)


def parse_fasta_native(path: str, allow_ambiguous: bool = False
                       ) -> tuple[np.ndarray, np.ndarray]:
    lib = _load_native()
    if lib is None:
        raise RuntimeError("native parser unavailable")
    t = _parse_threads()
    return _parse_native_two_pass(
        path, allow_ambiguous,
        lambda p, amb, *rest: lib.fasta_scan_mt(p, amb, t, *rest),
        lambda p, amb, *rest: lib.fasta_parse_mt(p, amb, t, *rest))


def parse_fastq_native(path: str, allow_ambiguous: bool = False,
                       min_qual: int = 0
                       ) -> tuple[np.ndarray, np.ndarray]:
    lib = _load_native()
    if lib is None:
        raise RuntimeError("native parser unavailable")
    t = _parse_threads()
    return _parse_native_two_pass(
        path, allow_ambiguous,
        lambda p, amb, *rest: lib.fastq_scan_mt(p, amb, t, *rest),
        lambda p, amb, *rest: lib.fastq_parse_mt(p, amb, min_qual, t,
                                                 *rest))


def parse_fasta_numpy(path: str, allow_ambiguous: bool = False
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Pure-Python/NumPy fallback parser (same contract as native)."""
    from ..utils.oracle import read_fasta_py
    from ..ops.encode import encode_seq

    seqs = read_fasta_py(path)
    lens = np.array([len(s) for s in seqs], dtype=np.int64)
    offsets = np.zeros(len(seqs) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    if not seqs:
        return np.empty(0, np.uint8), offsets
    codes = np.concatenate([encode_seq(s, allow_ambiguous) for s in seqs])
    return codes, offsets


def parse_fastq_numpy(path: str, allow_ambiguous: bool = False,
                      min_qual: int = 0
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Pure-Python FASTQ fallback (same contract as native)."""
    from ..utils.oracle import read_fastq_py
    from ..ops.encode import encode_seq

    seqs = read_fastq_py(path, min_qual=min_qual)
    lens = np.array([len(s) for s in seqs], dtype=np.int64)
    offsets = np.zeros(len(seqs) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    if not seqs:
        return np.empty(0, np.uint8), offsets
    codes = np.concatenate([encode_seq(s, allow_ambiguous) for s in seqs])
    return codes, offsets


def parse_fasta(path: str, prefer_native: bool = True,
                allow_ambiguous: bool = False) -> tuple[np.ndarray, np.ndarray]:
    """Parse a FASTA file into (codes, offsets); native parser preferred."""
    if prefer_native and _load_native() is not None:
        return parse_fasta_native(path, allow_ambiguous)
    return parse_fasta_numpy(path, allow_ambiguous)


def parse_fastq(path: str, prefer_native: bool = True,
                allow_ambiguous: bool = False,
                min_qual: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Parse a FASTQ file into (codes, offsets); native parser preferred.

    min_qual > 0 masks bases below that Phred+33 quality to the
    ambiguous code (requires allow_ambiguous — windows containing
    masked bases are dropped like N)."""
    _check_min_qual(allow_ambiguous, min_qual)
    if prefer_native and _load_native() is not None:
        return parse_fastq_native(path, allow_ambiguous, min_qual)
    return parse_fastq_numpy(path, allow_ambiguous, min_qual)


def _maybe_decompress(path: str):
    """Transparent gzip support: returns (real_path, cleanup_fn).

    .gz inputs are streamed to a temp file once so the native parser
    (which mmap-style streams from a path) works unchanged."""
    with open(path, "rb") as f:
        magic = f.read(2)
    if magic != b"\x1f\x8b":
        return path, (lambda: None)
    import gzip
    import shutil
    import tempfile
    tmp = tempfile.NamedTemporaryFile(suffix=".seq", delete=False)
    try:
        with gzip.open(path, "rb") as src:
            shutil.copyfileobj(src, tmp, length=1 << 20)
    finally:
        tmp.close()
    return tmp.name, (lambda: os.remove(tmp.name))


def detect_format(path: str) -> str:
    """"fasta" or "fastq" from the first non-whitespace byte.  An empty
    (or all-whitespace) file counts as an empty FASTA."""
    with open(path, "rb") as f:
        head = f.read(256)
    if head[:2] == b"\x1f\x8b":
        import gzip
        import zlib
        try:
            with gzip.open(path, "rb") as f:
                head = f.read(256)
        except (zlib.error, EOFError) as e:
            raise ValueError(f"{path}: corrupt gzip stream ({e})")
    for b in head:
        if b in b" \t\r\n":
            continue
        if b == ord(">"):
            return "fasta"
        if b == ord("@"):
            return "fastq"
        raise ValueError(f"{path}: cannot detect FASTA/FASTQ format")
    return "fasta"


def parse_seqs(path: str, prefer_native: bool = True,
               allow_ambiguous: bool = False,
               min_qual: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Auto-detecting sequence-file parser (FASTA or FASTQ, plain or
    gzip-compressed).  The native parser streams gzip directly through
    zlib (no temp-file round trip); only the NumPy fallback inflates to
    a temp file first.  min_qual applies to FASTQ only (FASTA has no
    qualities; it is ignored there, matching standard counters)."""
    fmt = detect_format(path)
    if fmt == "fastq":
        _check_min_qual(allow_ambiguous, min_qual)
    if prefer_native and _load_native() is not None:
        if fmt == "fastq":
            return parse_fastq_native(path, allow_ambiguous, min_qual)
        return parse_fasta_native(path, allow_ambiguous)
    real, cleanup = _maybe_decompress(path)
    try:
        if fmt == "fastq":
            return parse_fastq_numpy(real, allow_ambiguous, min_qual)
        return parse_fasta_numpy(real, allow_ambiguous)
    finally:
        cleanup()


# ---------------------------------------------------------------------------
# Chunked ingest: bounded-memory windows of whole records (native
# persistent handle; byte-exact resume cursors).
# ---------------------------------------------------------------------------

def scan_record_offsets(path: str, *, max_bases: int = 256 << 20,
                        allow_ambiguous: bool = False) -> np.ndarray:
    """Global (n_records + 1,) int64 record offsets WITHOUT keeping any
    codes: one chunked pass whose peak memory is one chunk of codes plus
    8 bytes/record.  Identical to parse_seqs(path)[1] — multi-host
    drivers use it to derive deterministic record partitions from
    lengths alone (parallel.multihost)."""
    lens = []
    for codes, offsets, _cur in iter_parse_chunks(
            path, max_bases=max_bases, allow_ambiguous=allow_ambiguous):
        if len(offsets) > 1:
            lens.append(np.diff(offsets))
    if not lens:
        return np.zeros(1, np.int64)
    out = np.empty(sum(len(x) for x in lens) + 1, np.int64)
    out[0] = 0
    np.cumsum(np.concatenate(lens), out=out[1:])
    return out


def iter_parse_chunks(path: str, *, max_bases: int = 256 << 20,
                      allow_ambiguous: bool = False,
                      prefer_native: bool = True,
                      start_cursor: int = 0,
                      min_qual: int = 0):
    """Yield (codes, offsets, next_cursor) windows of whole records.
    min_qual masks sub-threshold FASTQ bases to the ambiguous code
    (requires allow_ambiguous; no effect on FASTA).

    Peak host memory is ~max_bases + one-record slack, independent of
    corpus size; gzip inputs stream through zlib with no temp file and
    no backward seeks (the native handle keeps read-ahead across
    chunks).  next_cursor is an uncompressed byte offset at a record
    boundary: pass it as start_cursor to resume ingest there without
    re-parsing completed bytes (pipeline/streaming checkpointing).

    The NumPy fallback (no g++) streams records in Python; it reports
    next_cursor = -1 (resume-by-cursor needs the native parser).
    """
    fmt = detect_format(path)
    if fmt == "fastq":
        _check_min_qual(allow_ambiguous, min_qual)
    lib = _load_native()
    if prefer_native and lib is not None:
        # whole-file fast path: a PLAIN file that fits one window has no
        # chunking to do — use the MULTITHREADED whole-file parsers
        # (record-sliced; identical semantics, ~2-6x on multi-core).
        # Gzip stays chunked: its on-disk size is compressed, and the
        # resume-cursor contract needs uncompressed offsets.
        try:
            size = os.path.getsize(path)
            with open(path, "rb") as fh:
                plain = fh.read(2) != b"\x1f\x8b"
            if not plain:
                # BGZF (blocked gzip): the native MT parsers inflate its
                # blocks in parallel, so it qualifies for the whole-file
                # fast path when the UNCOMPRESSED size fits the window
                # (bgzf_usize walks headers only; -1 = plain gzip)
                usize = int(lib.bgzf_usize(path.encode()))
                plain, size = usize >= 0, usize
            whole = start_cursor == 0 and plain and size <= max_bases
        except OSError:
            whole = False
        if whole:
            if fmt == "fastq":
                codes, offsets = parse_fastq_native(path, allow_ambiguous,
                                                    min_qual)
            else:
                codes, offsets = parse_fasta_native(path, allow_ambiguous)
            if len(offsets) > 1:          # chunked path yields nothing
                yield codes, offsets, size  # for empty files; match it
            return
        yield from _iter_chunks_native(lib, path, fmt, max_bases,
                                       allow_ambiguous, start_cursor,
                                       min_qual)
    else:
        if start_cursor > 0:
            raise ValueError("resume cursors need the native parser")
        yield from _iter_chunks_py(path, fmt, max_bases, allow_ambiguous,
                                   min_qual)


def _iter_chunks_native(lib, path, fmt, max_bases, allow_ambiguous,
                        start_cursor, min_qual=0):
    if fmt == "fastq":
        def fn(h, amb, *rest):
            return lib.fastq_chunk(h, amb, min_qual, *rest)
    else:
        fn = lib.fasta_chunk
    amb = 1 if allow_ambiguous else 0
    cap = max_bases + (16 << 20)          # slack for one straddling record
    rec_cap = max(max_bases // 32, 1 << 16)
    cursor = start_cursor
    h = lib.ingest_open(path.encode(), cursor)
    if not h:
        raise ValueError(f"{path}: cannot open (offset {cursor})")
    try:
        err = ctypes.create_string_buffer(256)
        eof = ctypes.c_int(0)
        while not eof.value:
            codes = np.empty(cap, np.uint8)
            offsets = np.empty(rec_cap + 1, np.int64)
            nrec = ctypes.c_int64(0)
            nbase = ctypes.c_int64(0)
            rc = fn(h, amb,
                    codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    codes.size,
                    offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                    offsets.size, max_bases,
                    ctypes.byref(nrec), ctypes.byref(nbase),
                    ctypes.byref(eof), err, 256)
            if rc == -4:
                # a single record (or record count) outgrew the buffers:
                # reopen at the last good cursor with doubled capacity
                lib.ingest_close(h)
                cap *= 2
                rec_cap *= 2
                h = lib.ingest_open(path.encode(), cursor)
                if not h:
                    raise ValueError(f"{path}: cannot reopen at {cursor}")
                eof.value = 0
                continue
            if rc != 0:
                msg = err.value.decode() or _ERRCODES.get(rc, f"error {rc}")
                raise (InvalidBaseError if rc == -3 else ValueError)(
                    f"{path}: {msg}")
            cursor = lib.ingest_tell(h)
            if nrec.value == 0:
                break
            yield (codes[:int(nbase.value)], offsets[:int(nrec.value) + 1],
                   cursor)
    finally:
        lib.ingest_close(h)


def _iter_chunks_py(path, fmt, max_bases, allow_ambiguous, min_qual=0):
    """Pure-Python streaming fallback (gzip-aware, no temp file)."""
    from ..ops.encode import encode_seq
    import gzip
    with open(path, "rb") as probe:
        gz = probe.read(2) == b"\x1f\x8b"
    opener = gzip.open if gz else open

    def flush(seqs):
        lens = np.array([len(s) for s in seqs], dtype=np.int64)
        offsets = np.zeros(len(seqs) + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        codes = (np.concatenate([encode_seq(s, allow_ambiguous)
                                 for s in seqs])
                 if seqs else np.empty(0, np.uint8))
        return codes, offsets, -1

    seqs: list[str] = []
    total = 0
    with opener(path, "rt") as f:
        if fmt == "fastq":
            it = _iter_fastq_records_py(f, min_qual)
        else:
            it = _iter_fasta_records_py(f)
        for seq in it:
            seqs.append(seq)
            total += len(seq)
            if total >= max_bases:
                yield flush(seqs)
                seqs, total = [], 0
    if seqs:
        yield flush(seqs)


def _iter_fasta_records_py(f):
    seq: list[str] = []
    started = False
    for line in f:
        # '>' marks a header only at column 0 (Biopython/native
        # semantics); indented '>' is sequence data and errs downstream
        if line.startswith(">"):
            if started:
                yield "".join(seq)
            seq, started = [], True
            continue
        s = "".join(line.split())
        if s:
            if not started:
                raise ValueError("sequence data before first FASTA header")
            seq.append(s)
    if started:
        yield "".join(seq)


def _iter_fastq_records_py(f, min_qual=0):
    from ..utils.oracle import read_fastq_stream
    yield from read_fastq_stream(f, min_qual=min_qual)


# ---------------------------------------------------------------------------
# Batching: ragged records -> fixed-shape (B, L) device batches.
# ---------------------------------------------------------------------------

@dataclass
class Batch:
    codes: np.ndarray        # (B, L) uint8 zero-padded, or — packed
                             # transfer — (B, ceil(L/16)) uint32 with 16
                             # bases/word MS-pair-first (4x smaller H2D;
                             # device side unpacks, ops/encode.unpack_codes_u32)
    lengths: np.ndarray      # (B,) int32 — valid prefix length per row
    start_limits: np.ndarray  # (B,) int32 — row owns window starts o < limit
    packed_width: int = 0    # L when codes is packed, else 0


def pack_batch_codes(codes_u8: np.ndarray) -> np.ndarray:
    """Vectorized host fallback of the native packer: (B, L) uint8 ->
    (B, ceil(L/16)) uint32, first base in the most-significant pair."""
    B, L = codes_u8.shape
    Lw = (L + 15) // 16
    padded = np.zeros((B, Lw * 16), np.uint8)
    padded[:, :L] = codes_u8 & 3
    shifts = (2 * (15 - np.arange(16))).astype(np.uint32)
    lanes = padded.reshape(B, Lw, 16).astype(np.uint32)
    return (lanes << shifts[None, None, :]).sum(axis=2, dtype=np.uint32)


def segment_records(offsets: np.ndarray, max_len: int, overlap: int) -> np.ndarray:
    """Split records longer than max_len into windows with `overlap`
    shared bases (host-side analog of a (k-1)-base halo exchange).

    Ownership makes extraction exact across seams: a non-final segment
    owns only window starts o < step (= max_len - overlap); the final
    segment owns everything it can fit.  Every window of span <=
    overlap+1 is therefore extracted exactly once.

    Returns (n_segments, 3) int64: [start, end, start_limit).
    """
    assert 0 <= overlap < max_len
    lens = np.diff(offsets)
    if len(lens) and (lens <= max_len).all():
        # common case (no record splitting): fully vectorized
        return np.stack([offsets[:-1], offsets[1:],
                         np.full(len(lens), max_len, np.int64)], axis=1)
    spans = []
    step = max_len - overlap
    for r in range(len(offsets) - 1):
        s, e = int(offsets[r]), int(offsets[r + 1])
        if e - s <= max_len:
            spans.append((s, e, max_len))
            continue
        p = s
        while p < e:
            q = min(p + max_len, e)
            spans.append((p, q, max_len if q == e else step))
            if q == e:
                break
            p += step
    return np.asarray(spans, dtype=np.int64).reshape(-1, 3)


def batch_from_spans(codes: np.ndarray, spans_chunk: np.ndarray, *,
                     batch_reads: int, max_len: int,
                     packed: bool = False) -> Batch:
    """Build ONE fixed-shape Batch from <= batch_reads [start, end,
    start_limit) spans into `codes` (rows past the spans are zero-length
    padding).  Shared by iter_batches and the incremental multi-host
    batcher (parallel.multihost)."""
    chunk = spans_chunk
    m = len(chunk)
    B = batch_reads
    assert m <= B, (m, B)
    lens = np.empty((B,), dtype=np.int32)
    lims = np.empty((B,), dtype=np.int32)
    lib = _load_native()
    if packed and lib is not None:
        Lw = (max_len + 15) // 16
        outp = np.empty((B, Lw), dtype=np.uint32)
        sp = np.ascontiguousarray(chunk, dtype=np.int64)
        cc = codes if codes.size else np.zeros(1, np.uint8)
        lib.fill_batch_packed(
            cc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            sp.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), m,
            outp.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            lims.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            B, Lw, max_len)
        return Batch(outp, lens, lims, packed_width=max_len)
    out = np.empty((B, max_len), dtype=np.uint8)
    if lib is not None:
        # native row-memcpy filler (a numpy gather costs ~10x the
        # device step per batch at B=8192)
        sp = np.ascontiguousarray(chunk, dtype=np.int64)
        cc = codes if codes.size else np.zeros(1, np.uint8)
        lib.fill_batch(
            cc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            sp.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), m,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            lims.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            B, max_len)
    else:
        pos = np.arange(max_len)
        top = max(len(codes) - 1, 0)
        out[:] = 0
        lens[:] = 0
        lims[:] = 0
        if m:
            lens[:m] = (chunk[:, 1] - chunk[:, 0]).astype(np.int32)
            lims[:m] = chunk[:, 2].astype(np.int32)
            cc = codes if codes.size else np.zeros(1, np.uint8)
            idx = np.minimum(chunk[:, 0:1] + pos[None, :], top)
            valid = pos[None, :] < lens[:m, None]
            out[:m] = np.where(valid, cc[idx], 0)
    if packed:
        return Batch(pack_batch_codes(out), lens, lims,
                     packed_width=max_len)
    return Batch(out, lens, lims)


def iter_batches(codes: np.ndarray, offsets: np.ndarray, *,
                 batch_reads: int, max_len: int, overlap: int,
                 start_batch: int = 0, packed: bool = False) -> Iterator[Batch]:
    """Yield fixed-shape batches.  The final batch is padded to full B
    with zero-length rows so every device step sees one static shape
    (one XLA compilation).  `start_batch` skips the first batches
    without building them (checkpoint resume).  `packed` emits 2-bit
    uint32-packed rows (4x smaller H2D; requires pure-ACGT codes)."""
    spans = segment_records(offsets, max_len, overlap)
    n = len(spans)
    for i in range(start_batch * batch_reads, max(n, 1), batch_reads):
        yield batch_from_spans(codes, spans[i:i + batch_reads],
                               batch_reads=batch_reads, max_len=max_len,
                               packed=packed)
        if n == 0:
            break
