"""FASTQ ingest: native parser vs python fallback vs oracle; counting
end-to-end with auto-detection."""

import os
import numpy as np
import pytest

from kmer_tpu import KmerConfig, count_fasta
from kmer_tpu.io import fasta
from kmer_tpu.ops.encode import InvalidBaseError
from kmer_tpu.utils import oracle

FASTQ = """@read1 some description
ACGTACGTACGT
+
IIIIIIIIIIII
@read2
GGGGTTTT
+read2
@@@@!!!!
@read3 wrapped sequence
ACGTAC
GTACGT
+
IIIIII
IIIIII
"""


@pytest.fixture()
def fq(tmp_path):
    p = tmp_path / "reads.fastq"
    p.write_text(FASTQ)
    return str(p)


def test_fastq_parsers_agree(fq):
    c1, o1 = fasta.parse_fastq_native(fq)
    c2, o2 = fasta.parse_fastq_numpy(fq)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(o1, o2)
    assert list(o1) == [0, 12, 20, 32]


def test_fastq_quality_at_sign_not_a_record(fq):
    """read2's quality line starts with '@' — must not start a record."""
    _, o = fasta.parse_fastq_native(fq)
    assert len(o) - 1 == 3


def test_detect_format(fq, tmp_path):
    assert fasta.detect_format(fq) == "fastq"
    fa = tmp_path / "a.fasta"
    fa.write_text(">x\nACGT\n")
    assert fasta.detect_format(str(fa)) == "fasta"
    bad = tmp_path / "junk.txt"
    bad.write_text("hello")
    with pytest.raises(ValueError, match="cannot detect"):
        fasta.detect_format(str(bad))


def test_count_fastq_end_to_end(fq):
    table = count_fasta(fq, KmerConfig(k=5, batch_reads=8, max_read_len=32))
    want = oracle.oracle_count(oracle.read_fastq_py(fq), 5)
    assert table.to_dict() == dict(want)


def test_fastq_invalid_base_strict(tmp_path):
    p = tmp_path / "n.fastq"
    p.write_text("@r\nACGNT\n+\nIIIII\n")
    with pytest.raises(InvalidBaseError):
        fasta.parse_fastq_native(str(p))
    c, o = fasta.parse_fastq_native(str(p), allow_ambiguous=True)
    assert len(c) == 5


def test_fastq_truncated(tmp_path):
    p = tmp_path / "t.fastq"
    p.write_text("@r\nACGT\n+\nII")
    with pytest.raises(ValueError):
        fasta.parse_fastq_native(str(p))
    with pytest.raises(ValueError):
        oracle.read_fastq_py(str(p))


def test_fastq_crlf(tmp_path):
    p = tmp_path / "crlf.fastq"
    p.write_bytes(b"@r1\r\nACGT\r\n+\r\nIIII\r\n@r2\r\nGGGG\r\n+\r\n!!!!\r\n")
    c, o = fasta.parse_fastq_native(str(p))
    assert list(o) == [0, 4, 8]


# ---- multithreaded whole-file FASTQ parse ----------------------------------

def _big_fastq(tmp_path, name, *, wrapped=False, with_n=False, seed=7):
    """>= 4 MB FASTQ; strict 4-line unless wrapped=True."""
    rng = np.random.default_rng(seed)
    buf = []
    seqs = []
    n = 12000
    for i in range(n):
        L = int(rng.integers(120, 420))
        s = "".join("ACGT"[c] for c in rng.integers(0, 4, L))
        if with_n and i % 7 == 0:
            s = s[:10] + "N" + s[11:]
        seqs.append(s)
        qual = "I" * L
        if wrapped and i % 3 == 0:
            half = L // 2
            buf.append(f"@r{i}\n{s[:half]}\n{s[half:]}\n+\n{qual}\n")
        else:
            buf.append(f"@r{i}\n{s}\n+\n{qual}\n")
    p = tmp_path / name
    p.write_text("".join(buf))
    assert p.stat().st_size >= (4 << 20), "must exercise the MT path"
    return str(p), seqs


def test_fastq_mt_matches_serial(tmp_path, monkeypatch):
    p, seqs = _big_fastq(tmp_path, "mt.fastq")
    monkeypatch.setenv("KMER_TPU_PARSE_THREADS", "4")
    mc, mo = fasta.parse_fastq_native(p)
    monkeypatch.setenv("KMER_TPU_PARSE_THREADS", "1")
    sc, so = fasta.parse_fastq_native(p)
    assert np.array_equal(mc, sc) and np.array_equal(mo, so)
    assert np.diff(mo).tolist() == [len(s) for s in seqs]


def test_fastq_mt_wrapped_falls_back(tmp_path, monkeypatch):
    """Wrapped sequence lines are NOT strict 4-line framing: the MT
    path must fall back to the serial walker, bit-identically."""
    p, seqs = _big_fastq(tmp_path, "wrap.fastq", wrapped=True)
    monkeypatch.setenv("KMER_TPU_PARSE_THREADS", "4")
    mc, mo = fasta.parse_fastq_native(p)
    monkeypatch.setenv("KMER_TPU_PARSE_THREADS", "1")
    sc, so = fasta.parse_fastq_native(p)
    assert np.array_equal(mc, sc) and np.array_equal(mo, so)
    assert np.diff(mo).tolist() == [len(s) for s in seqs]


def test_fastq_mt_ambiguous_and_errors(tmp_path, monkeypatch):
    p, seqs = _big_fastq(tmp_path, "mtn.fastq", with_n=True)
    monkeypatch.setenv("KMER_TPU_PARSE_THREADS", "4")
    mc, mo = fasta.parse_fastq_native(p, allow_ambiguous=True)
    assert np.diff(mo).tolist() == [len(s) for s in seqs]
    assert (mc == 4).any()
    # strict mode: first bad byte in file order, same message as serial
    with pytest.raises(InvalidBaseError) as e_mt:
        fasta.parse_fastq_native(p)
    monkeypatch.setenv("KMER_TPU_PARSE_THREADS", "1")
    with pytest.raises(InvalidBaseError) as e_ser:
        fasta.parse_fastq_native(p)
    assert str(e_mt.value) == str(e_ser.value)


def test_fastq_mt_chunked_ingest_whole_file_path(tmp_path, monkeypatch):
    """iter_parse_chunks routes single-window plain files through the MT
    parser; the yielded table must equal the chunked walker's."""
    p, seqs = _big_fastq(tmp_path, "ic.fastq", seed=11)
    monkeypatch.setenv("KMER_TPU_PARSE_THREADS", "4")
    chunks = list(fasta.iter_parse_chunks(p))
    assert len(chunks) == 1
    codes, offsets, cursor = chunks[0]
    assert cursor == os.path.getsize(p)
    small = list(fasta.iter_parse_chunks(p, max_bases=1 << 20))
    assert len(small) > 1
    cat = np.concatenate([c for c, _, _ in small])
    assert np.array_equal(codes[: offsets[-1]], cat)


def test_fastq_mt_property_fuzz(tmp_path, monkeypatch):
    """Property fuzz: random record shapes (lengths 1..600, CRLF rows,
    occasional '@'/'+' leading quality chars, with/without trailing
    newline) — MT parse must equal serial for random thread counts."""
    rng = np.random.default_rng(123)
    for trial in range(4):
        buf = []
        seqs = []
        n = int(rng.integers(9000, 14000))
        for i in range(n):
            L = int(rng.integers(1, 600))
            s = "".join("ACGT"[c] for c in rng.integers(0, 4, L))
            seqs.append(s)
            eol = "\r\n" if rng.random() < 0.3 else "\n"
            q0 = "@" if rng.random() < 0.2 else ("+" if rng.random() < 0.2
                                                 else "I")
            qual = q0 + "J" * (L - 1) if L > 1 else q0
            buf.append(f"@r{i}{eol}{s}{eol}+{eol}{qual}{eol}")
        text = "".join(buf)
        if trial % 2:
            text = text[:-1]          # no trailing newline
        p = tmp_path / f"fz{trial}.fastq"
        p.write_text(text)
        monkeypatch.setenv("KMER_TPU_PARSE_THREADS", "1")
        sc, so = fasta.parse_fastq_native(str(p))
        assert np.diff(so).tolist() == [len(s) for s in seqs]
        for t in rng.choice([2, 3, 5, 8, 16], size=2, replace=False):
            monkeypatch.setenv("KMER_TPU_PARSE_THREADS", str(t))
            mc, mo = fasta.parse_fastq_native(str(p))
            assert np.array_equal(mc, sc) and np.array_equal(mo, so), \
                (trial, t)


# ---------------------------------------------------------------------------
# FASTQ quality filtering (--min-qual): bases below the Phred+33 cutoff
# are masked to the ambiguous code at ingest; windows containing one
# are dropped exactly like N (skip_invalid semantics).
# ---------------------------------------------------------------------------

def _mk_qual_fastq(tmp_path, name="q.fastq", n=64, L=40, seed=5):
    from kmer_tpu.io.generator import random_reads_fastq
    p = tmp_path / name
    p.write_text(random_reads_fastq(n, L, seed=seed, qual_range=(0, 41)))
    return str(p)


def _oracle_minqual_table(path, k, min_qual, canonical=False):
    from collections import Counter
    seqs = oracle.read_fastq_py(path, min_qual=min_qual)
    return Counter(dict(oracle.oracle_count(seqs, k, canonical=canonical,
                                            skip_invalid=True)))


@pytest.mark.parametrize("min_qual", [0, 10, 25])
def test_min_qual_parsers_agree(tmp_path, min_qual):
    """Native (serial walker) and NumPy fallback mask identically."""
    p = _mk_qual_fastq(tmp_path)
    if fasta._load_native() is None:
        pytest.skip("native parser unavailable")
    cn, on = fasta.parse_fastq_native(p, allow_ambiguous=True,
                                      min_qual=min_qual)
    cp, op_ = fasta.parse_fastq_numpy(p, allow_ambiguous=True,
                                      min_qual=min_qual)
    assert np.array_equal(on, op_)
    # fallback maps masked bases via 'N' -> 4; native writes 4 in place
    assert np.array_equal(cn, cp)
    if min_qual > 0:
        assert (cn == 4).any()          # the fixture spans Phred 0..40


def test_min_qual_mt_matches_serial(tmp_path, monkeypatch):
    """The multithreaded strict-framing path masks identically to the
    serial walker (per-slice fastq_walk carries min_qual)."""
    if fasta._load_native() is None:
        pytest.skip("native parser unavailable")
    from kmer_tpu.io.generator import random_reads_fastq
    p = tmp_path / "big.fastq"
    p.write_text(random_reads_fastq(40_000, 150, seed=9,
                                    qual_range=(0, 41)))
    monkeypatch.setenv("KMER_TPU_PARSE_THREADS", "4")
    cm, om = fasta.parse_fastq_native(str(p), allow_ambiguous=True,
                                      min_qual=15)
    monkeypatch.setenv("KMER_TPU_PARSE_THREADS", "1")
    cs, os_ = fasta.parse_fastq_native(str(p), allow_ambiguous=True,
                                       min_qual=15)
    assert np.array_equal(om, os_)
    assert np.array_equal(cm, cs)
    assert (cm == 4).any()


@pytest.mark.parametrize("canonical", [False, True])
def test_min_qual_count_end_to_end(tmp_path, canonical):
    p = _mk_qual_fastq(tmp_path, n=48, L=36, seed=7)
    cfg = KmerConfig(k=9, canonical=canonical, skip_invalid=True,
                     min_qual=20, batch_reads=16, max_read_len=64,
                     mode="sort", sort_group_keys=64)
    got = count_fasta(p, cfg)
    want = _oracle_minqual_table(p, 9, 20, canonical)
    assert got.to_dict() == dict(want)
    # sanity: the filter actually removed something vs min_qual=0
    unfiltered = count_fasta(p, cfg.replace(min_qual=0))
    assert unfiltered.total > got.total


def test_min_qual_requires_skip_invalid():
    with pytest.raises(ValueError):
        KmerConfig(min_qual=10)
    with pytest.raises(ValueError):
        KmerConfig(min_qual=-1, skip_invalid=True)


def test_min_qual_cli_implies_skip_invalid(tmp_path, capsys):
    from kmer_tpu.cli import main
    p = _mk_qual_fastq(tmp_path, n=16, L=30, seed=3)
    rc = main(["count", p, "-k", "9", "--min-qual", "20",
               "--batch-reads", "8", "--max-read-len", "64"])
    assert rc == 0
    got = {ln.split("\t")[0]: int(ln.split("\t")[1])
           for ln in capsys.readouterr().out.splitlines()}
    assert got == dict(_oracle_minqual_table(p, 9, 20))


def test_min_qual_ignored_for_fasta(tmp_path):
    """FASTA has no qualities: min_qual must be a no-op, not an error."""
    from kmer_tpu.io.generator import random_reads_fasta
    p = tmp_path / "a.fasta"
    p.write_text(random_reads_fasta(8, 30, seed=1))
    cfg = KmerConfig(k=9, skip_invalid=True, min_qual=30, batch_reads=8,
                     max_read_len=64, mode="sort", sort_group_keys=64)
    want = count_fasta(str(p), cfg.replace(min_qual=0, skip_invalid=True))
    assert count_fasta(str(p), cfg) == want
