"""BGZF (blocked gzip) ingest: block-parallel native inflate must be
byte-identical to plain input across every path — the MT whole-file
parsers (FASTA + FASTQ), the chunked-ingest handle (zlib consumes BGZF
as concatenated gzip members), and end-to-end counting."""

import gzip
import os

import numpy as np
import pytest

from kmer_tpu import KmerConfig, count_fasta
from kmer_tpu.io import fasta
from kmer_tpu.io.bgzf import bgzf_compress, write_bgzf
from kmer_tpu.io.generator import genome_reads_fasta, random_reads_fastq


def test_bgzf_roundtrips_as_gzip():
    data = b"ACGT" * 100_000 + b"tail"
    assert gzip.decompress(bgzf_compress(data)) == data
    assert gzip.decompress(bgzf_compress(data, block=1000)) == data
    assert gzip.decompress(bgzf_compress(b"")) == b""


def _needs_native():
    if fasta._load_native() is None:
        pytest.skip("native parser unavailable")


def test_bgzf_usize(tmp_path):
    _needs_native()
    import ctypes
    lib = fasta._load_native()
    data = genome_reads_fasta(300, 100, genome_len=4000, seed=3).encode()
    p = tmp_path / "a.fasta.bgz"
    write_bgzf(str(p), data, block=4096)
    assert lib.bgzf_usize(str(p).encode()) == len(data)
    # plain gzip is NOT bgzf
    pg = tmp_path / "a.fasta.gz"
    pg.write_bytes(gzip.compress(data))
    assert lib.bgzf_usize(str(pg).encode()) == -1
    # nor is an uncompressed file
    pp = tmp_path / "a.fasta"
    pp.write_bytes(data)
    assert lib.bgzf_usize(str(pp).encode()) == -1


@pytest.mark.parametrize("fmt", ["fasta", "fastq"])
def test_bgzf_mt_parse_equals_plain(tmp_path, fmt, monkeypatch):
    """> 4 MB corpus so the MT fast path engages; BGZF parse must be
    bit-identical to the plain file's parse."""
    _needs_native()
    monkeypatch.setenv("KMER_TPU_PARSE_THREADS", "4")
    if fmt == "fasta":
        text = genome_reads_fasta(40_000, 110, genome_len=50_000, seed=4)
    else:
        text = random_reads_fastq(35_000, 120, seed=4)
    assert len(text) > (4 << 20)
    plain = tmp_path / f"c.{fmt}"
    plain.write_text(text)
    bgz = tmp_path / f"c.{fmt}.bgz"
    write_bgzf(str(bgz), text)
    cp, op = fasta.parse_seqs(str(plain))
    cb, ob = fasta.parse_seqs(str(bgz))
    np.testing.assert_array_equal(op, ob)
    np.testing.assert_array_equal(cp, cb)


def test_bgzf_chunked_ingest_and_resume(tmp_path):
    """The serial chunked handle reads BGZF as ordinary gzip members;
    resume cursors stay byte-exact (uncompressed offsets)."""
    _needs_native()
    text = genome_reads_fasta(400, 90, genome_len=3000, seed=6)
    bgz = tmp_path / "r.fasta.bgz"
    write_bgzf(str(bgz), text, block=2048)
    chunks = list(fasta.iter_parse_chunks(str(bgz), max_bases=5000))
    assert len(chunks) > 1
    joined = np.concatenate([c for c, _, _ in chunks])
    plain = tmp_path / "r.fasta"
    plain.write_text(text)
    cp, _ = fasta.parse_seqs(str(plain))
    np.testing.assert_array_equal(joined, cp)
    # resume from the second chunk's cursor
    cur = chunks[0][2]
    rest = list(fasta.iter_parse_chunks(str(bgz), max_bases=5000,
                                        start_cursor=cur))
    np.testing.assert_array_equal(
        np.concatenate([c for c, _, _ in rest]),
        np.concatenate([c for c, _, _ in chunks[1:]]))


def test_bgzf_count_end_to_end(tmp_path):
    text = genome_reads_fasta(200, 100, genome_len=4000, seed=8)
    plain = tmp_path / "e.fasta"
    plain.write_text(text)
    bgz = tmp_path / "e.fasta.bgz"
    write_bgzf(str(bgz), text, block=8192)
    cfg = KmerConfig(k=21, canonical=True, batch_reads=64,
                     max_read_len=128)
    assert count_fasta(str(bgz), cfg) == count_fasta(str(plain), cfg)


def test_bgzf_fastq_min_qual(tmp_path, monkeypatch):
    """min_qual masking rides the BGZF MT path identically."""
    _needs_native()
    monkeypatch.setenv("KMER_TPU_PARSE_THREADS", "4")
    text = random_reads_fastq(35_000, 120, seed=11, qual_range=(0, 41))
    plain = tmp_path / "q.fastq"
    plain.write_text(text)
    bgz = tmp_path / "q.fastq.bgz"
    write_bgzf(str(bgz), text)
    cp, op = fasta.parse_seqs(str(plain), allow_ambiguous=True,
                              min_qual=15)
    cb, ob = fasta.parse_seqs(str(bgz), allow_ambiguous=True,
                              min_qual=15)
    np.testing.assert_array_equal(op, ob)
    np.testing.assert_array_equal(cp, cb)
    assert (cb == 4).any()


def test_bgzf_corrupt_block_clean_error(tmp_path):
    """A corrupted BGZF payload must surface as a clean error (the MT
    path refuses, the serial zlib fallback reports), never silent
    truncation."""
    _needs_native()
    text = genome_reads_fasta(40_000, 110, genome_len=50_000, seed=12)
    raw = bgzf_compress(text.encode())
    # flip a byte inside a MID-FILE block's payload: format detection
    # (first block) succeeds, the parse itself must fail cleanly
    bad = bytearray(raw)
    bad[len(bad) // 2] ^= 0xFF
    p = tmp_path / "bad.fasta.bgz"
    p.write_bytes(bytes(bad))
    with pytest.raises((ValueError, OSError)):
        fasta.parse_seqs(str(p))
    # corrupt FIRST block: format detection itself reports cleanly
    bad2 = bytearray(raw)
    bad2[100] ^= 0xFF
    p2 = tmp_path / "bad2.fasta.bgz"
    p2.write_bytes(bytes(bad2))
    with pytest.raises(ValueError):
        fasta.detect_format(str(p2))


def test_bgzf_undersized_bsize_rejected(tmp_path):
    """A block whose BC bsize is smaller than its own header must be
    rejected by the indexer (negative csize would hand zlib a ~4 GB
    avail_in over the mmap) — the file then reads as plain gzip, whose
    serial path reports the corruption cleanly."""
    _needs_native()
    import ctypes
    import struct
    import zlib
    lib = fasta._load_native()
    # header claims xlen=40 but bsize covers less than header+crc+isize
    c = zlib.compressobj(6, zlib.DEFLATED, -15)
    cdata = c.compress(b"ACGT") + c.flush()
    xlen = 40
    bsize = 12 + xlen          # < 12 + xlen + 8 + 1
    header = struct.pack("<4BIBBH", 0x1F, 0x8B, 8, 4, 0, 0, 0xFF, xlen)
    sub = struct.pack("<BBHH", ord("B"), ord("C"), 2, bsize - 1)
    blob = header + sub + b"\x00" * (xlen - len(sub)) + cdata
    blob += struct.pack("<II", zlib.crc32(b"ACGT"), 4)
    p = tmp_path / "evil.bgz"
    p.write_bytes(blob)
    assert lib.bgzf_usize(str(p).encode()) == -1


def test_bgzf_two_pass_streaming_resume(tmp_path):
    """Two-pass streaming over a BGZF corpus: BgzfStream resume
    cursors (uncompressed offsets -> block + in-block skip) must
    reproduce the in-memory table bit-exactly across an interrupted
    run."""
    _needs_native()
    from kmer_tpu.pipeline.streaming import StreamingCounter
    text = genome_reads_fasta(120, 100, genome_len=2500, seed=44)
    bgz = tmp_path / "tp.fasta.bgz"
    write_bgzf(str(bgz), text, block=2048)
    cfg = KmerConfig(k=21, canonical=True, batch_reads=8,
                     max_read_len=128, partitions=4,
                     ingest_chunk_bases=1 << 12)
    want = count_fasta(str(bgz), cfg)
    sc = StreamingCounter(str(bgz), cfg, str(tmp_path / "sp"))
    sc.run_pass1(max_batches=3)          # interrupt mid-pass-1
    sc = StreamingCounter(str(bgz), cfg, str(tmp_path / "sp"))
    sc.run()
    assert sc.final_table() == want
