"""Seeded random FASTA corpus generators.

Covers the reference's random_fasta_generator.py (pool-of-10 80-mers,
200 records x 5 lines; see random_fasta_generator.py:5-15) but fixes its
unseeded nondeterminism (:7, :14) — every generator here takes a seed so
fixtures are reproducible run-to-run, and adds a general reads generator
for benchmark corpora (BASELINE.json config 2: 100k x 150bp).
"""

from __future__ import annotations

import io as _io

import numpy as np

from ..ops.encode import BASE_ORDER

_BASES = np.frombuffer(BASE_ORDER.encode(), dtype=np.uint8)


def reference_style_fasta(n_records: int = 200, lines_per_record: int = 5,
                          line_len: int = 80, pool_size: int = 10,
                          seed: int = 0) -> str:
    """Corpus with the same shape as the reference generator's output
    (random_fasta_generator.py:10-15): records built from a small pool of
    shared lines, so duplicate chunks (multiplicity > 1) are guaranteed."""
    rng = np.random.default_rng(seed)
    pool = ["".join(BASE_ORDER[c] for c in rng.integers(0, 4, line_len))
            for _ in range(pool_size)]
    buf = _io.StringIO()
    for i in range(1, n_records + 1):
        buf.write(f">dummy_sequence_{i:03d} {i}th record\n")
        for _ in range(lines_per_record):
            buf.write(pool[int(rng.integers(0, pool_size))])
            buf.write("\n")
    return buf.getvalue()


def random_reads_fasta(n_reads: int, read_len: int, seed: int = 0,
                       wrap: int | None = None) -> str:
    """n_reads uniform-random reads of read_len bp (benchmark corpora)."""
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, (n_reads, read_len), dtype=np.uint8)
    ascii_rows = _BASES[codes]
    buf = _io.StringIO()
    for i in range(n_reads):
        buf.write(f">read_{i:06d}\n")
        row = ascii_rows[i].tobytes().decode()
        if wrap:
            for j in range(0, read_len, wrap):
                buf.write(row[j:j + wrap])
                buf.write("\n")
        else:
            buf.write(row)
            buf.write("\n")
    return buf.getvalue()


def random_codes(n_reads: int, read_len: int, seed: int = 0) -> np.ndarray:
    """(n_reads, read_len) uint8 2-bit codes directly (no FASTA text) —
    device-bench corpora without parse overhead."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, 4, (n_reads, read_len), dtype=np.uint8)


def random_reads_fastq(n_reads: int, read_len: int, seed: int = 0,
                       qual_range: tuple[int, int] | None = None) -> str:
    """n_reads uniform-random FASTQ reads.  Quality is constant 'I'
    (Phred 40) unless qual_range=(lo, hi) draws per-base Phred scores
    uniformly from [lo, hi) — for exercising --min-qual filtering."""
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, (n_reads, read_len), dtype=np.uint8)
    ascii_rows = _BASES[codes]
    if qual_range is not None:
        lo, hi = qual_range
        quals = (rng.integers(lo, hi, (n_reads, read_len)) + 33) \
            .astype(np.uint8)
    buf = _io.StringIO()
    for i in range(n_reads):
        buf.write(f"@read_{i:06d}\n")
        buf.write(ascii_rows[i].tobytes().decode())
        buf.write("\n+\n")
        buf.write(quals[i].tobytes().decode() if qual_range is not None
                  else "I" * read_len)
        buf.write("\n")
    return buf.getvalue()


def genome_reads_fasta(n_reads: int, read_len: int, genome_len: int = 100_000,
                       seed: int = 0, error_rate: float = 0.0,
                       revcomp: bool = True) -> str:
    """Reads sampled from ONE random genome — the realistic workload
    shape for k-mer counting: at coverage n_reads*read_len/genome_len,
    most k-mers recur ~coverage times, so device compaction and host
    aggregation see genuine duplicate structure (uniform-random reads
    have essentially none).  Optional per-base substitution errors and
    reverse-complement strands (canonical-counting realism).
    """
    if read_len > genome_len:
        raise ValueError(f"read_len={read_len} > genome_len={genome_len}")
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, genome_len, dtype=np.uint8)
    # inclusive last start genome_len - read_len (the final window is
    # sampled too)
    starts = rng.integers(0, genome_len - read_len + 1, n_reads)
    idx = starts[:, None] + np.arange(read_len)[None, :]
    codes = genome[idx]
    if error_rate > 0:
        err = rng.random(codes.shape) < error_rate
        codes = np.where(err, (codes + rng.integers(1, 4, codes.shape)) % 4,
                         codes).astype(np.uint8)
    if revcomp:
        flip = rng.random(n_reads) < 0.5
        rc = (3 - codes)[:, ::-1]
        codes = np.where(flip[:, None], rc, codes).astype(np.uint8)
    ascii_rows = _BASES[codes]
    buf = _io.StringIO()
    for i in range(n_reads):
        buf.write(f">gread_{i:06d}\n")
        buf.write(ascii_rows[i].tobytes().decode())
        buf.write("\n")
    return buf.getvalue()
