"""FASTQ ingest: native parser vs python fallback vs oracle; counting
end-to-end with auto-detection."""

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
