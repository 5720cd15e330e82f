import os
import tempfile

import numpy as np
import pytest

from kmer_tpu.io import fasta
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
