"""Pure-Python/NumPy differential oracles (no JAX).

The reference's only test methodology is differential: test.py is an
independent reimplementation diffed against the Rust binary (test.py:14-40
vs main.rs:43-92).  We adopt that as a first-class subsystem: every
device path has a tiny, obviously-correct host oracle here, and the test
suite asserts exact agreement (SURVEY.md §4).
"""

from __future__ import annotations

from collections import Counter
from typing import Iterable

from ..ops.encode import revcomp_str


def oracle_gapped_lines(seqs: Iterable[str], l_len: int = 27, r_len: int = 27,
                        c_min: int = 80, c_max: int = 140) -> list[str]:
    """Reference semantics (test.py:20-38 / main.rs:63-81): every chunk
    size c in [c_min, c_max], every offset o with o + c <= len, emit
    seq[o:o+l_len] + seq[o+c-r_len:o+c].  Unsorted; caller sorts."""
    out: list[str] = []
    for seq in seqs:
        n = len(seq)
        for c in range(c_min, c_max + 1):
            m = c - l_len - r_len
            for o in range(0, n):
                r_end = o + l_len + m + r_len
                if r_end > n:
                    break
                out.append(seq[o:o + l_len] + seq[r_end - r_len:r_end])
    return out


def oracle_gapped_sorted_dump(seqs: Iterable[str], **kw) -> bytes:
    """Sorted, newline-terminated dump — byte-exact vs the reference's
    stdout (main.rs:87-90; md5 contract in BASELINE.md)."""
    lines = oracle_gapped_lines(seqs, **kw)
    lines.sort()
    return ("\n".join(lines) + "\n").encode() if lines else b""


def oracle_kmers(seq: str, k: int, canonical: bool = False,
                 skip_invalid: bool = False) -> list[str]:
    """All k-mers of one read (reads shorter than k emit nothing).

    skip_invalid drops any window containing a non-ACGT character
    (N/IUPAC codes) — the oracle for KmerConfig.skip_invalid."""
    out = []
    up = seq.upper()
    for i in range(len(seq) - k + 1):
        s = up[i:i + k]
        if skip_invalid and any(b not in "ACGT" for b in s):
            continue
        if canonical:
            s = min(s, revcomp_str(s))
        out.append(s)
    return out


def oracle_spaced(seq: str, mask: str, canonical: bool = False,
                  skip_invalid: bool = False) -> list[str]:
    """Spaced-seed keys of one read: the bases at the mask's '1'
    offsets per window of span len(mask).  Canonical takes the strand
    min (palindromic masks only — the caller enforces)."""
    span = len(mask)
    pos = [i for i, ch in enumerate(mask) if ch == "1"]
    out = []
    up = seq.upper()
    for i in range(len(seq) - span + 1):
        s = "".join(up[i + j] for j in pos)
        if skip_invalid and any(b not in "ACGT" for b in s):
            continue
        if canonical:
            s = min(s, revcomp_str(s))
        out.append(s)
    return out


def oracle_spaced_count(seqs: Iterable[str], mask: str,
                        canonical: bool = False,
                        skip_invalid: bool = False) -> Counter:
    c: Counter = Counter()
    for seq in seqs:
        c.update(oracle_spaced(seq, mask, canonical, skip_invalid))
    return c


def oracle_count(seqs: Iterable[str], k: int, canonical: bool = False,
                 skip_invalid: bool = False) -> Counter:
    """(k-mer -> multiplicity) over a read set."""
    c: Counter = Counter()
    for seq in seqs:
        c.update(oracle_kmers(seq, k, canonical, skip_invalid))
    return c


def mask_low_quality(seq: str, qual: str, min_qual: int) -> str:
    """Replace bases whose Phred+33 quality is below min_qual with 'N'
    (the framework then drops windows containing them, like any
    ambiguous base).  Mirrors the native walker's in-place code-4
    masking (io/native/fasta_pack.cpp fastq_walk)."""
    if min_qual <= 0:
        return seq
    import numpy as np
    arr = np.frombuffer(seq.encode(), np.uint8).copy()
    qarr = np.frombuffer(qual.encode(), np.uint8)
    arr[qarr < 33 + min_qual] = ord("N")
    return arr.tobytes().decode()


def read_fastq_py(path: str, min_qual: int = 0) -> list[str]:
    """Minimal FASTQ reader (oracle-side): 4-line records, sequence may
    wrap; quality consumed by length ('@' is a legal quality char).
    min_qual > 0 masks low-quality bases to 'N' (mask_low_quality)."""
    seqs: list[str] = []
    with open(path, "r") as f:
        lines = f.read().splitlines()
    i = 0
    while i < len(lines):
        if not lines[i].strip():
            i += 1
            continue
        if not lines[i].startswith("@"):
            raise ValueError("FASTQ record must start with '@'")
        i += 1
        seq = []
        while i < len(lines) and not lines[i].startswith("+"):
            seq.append(lines[i].strip())
            i += 1
        i += 1                      # the '+' line
        s = "".join(seq)
        q: list[str] = []
        ql = 0
        while i < len(lines) and ql < len(s):
            q.append(lines[i].strip())
            ql += len(q[-1])
            i += 1
        if ql != len(s):
            raise ValueError("truncated FASTQ record")
        seqs.append(mask_low_quality(s, "".join(q), min_qual))
    return seqs


def read_fasta_py(path: str) -> list[str]:
    """Minimal host FASTA reader (oracle-side; the framework's real
    ingest is the native parser in io/fasta.py).  Mirrors Biopython
    SeqIO semantics used by test.py:7-11: '>' starts a record, sequence
    lines are concatenated."""
    seqs: list[str] = []
    cur: list[str] | None = None
    with open(path, "r") as f:
        for line in f:
            # '>' is a header marker only at COLUMN 0 (Biopython/native
            # semantics); '  >x' is sequence data and errs downstream
            if line.startswith(">"):
                if cur is not None:
                    seqs.append("".join(cur))
                cur = []
                continue
            s = "".join(line.split())    # native skips all whitespace
            if not s:
                continue
            if cur is None:
                raise ValueError("sequence data before first FASTA header")
            cur.append(s)
    if cur is not None:
        seqs.append("".join(cur))
    return seqs


def read_fastq_stream(f, min_qual: int = 0):
    """Yield sequences from an open FASTQ text stream — same semantics
    as read_fastq_py (wrapping-safe, '@'-in-quality safe) without
    materializing the file (chunked-ingest fallback path)."""
    while True:
        line = f.readline()
        if not line:
            return
        if not line.strip():
            continue
        # '@' must be at column 0 (native parser semantics; an indented
        # '@' raises, matching the native walker)
        if not line.startswith("@"):
            raise ValueError("FASTQ record must start with '@'")
        seq: list[str] = []
        while True:
            ln = f.readline()
            if not ln:
                raise ValueError("truncated FASTQ record")
            if ln.startswith("+"):
                break
            seq.append(ln.strip())
        s = "".join(seq)
        q: list[str] = []
        ql = 0
        while ql < len(s):
            ln = f.readline()
            if not ln:
                break
            q.append(ln.strip())
            ql += len(q[-1])
        if ql != len(s):
            raise ValueError("truncated FASTQ record")
        yield mask_low_quality(s, "".join(q), min_qual)
