"""Native pair aggregator (pipeline/nativeagg.py) == numpy from_pairs.

The native bucket-parallel sort-reduce must be BIT-identical to the
numpy argsort/lexsort core for every key width, duplicate ratio, and
edge-key pattern — it silently takes over every large host merge
(per-batch compaction, buffered flushes, streaming partitions,
multihost partials), so a mismatch here corrupts everything above it.
"""

import numpy as np
import pytest

from kmer_tpu.ops.encode import words_per_key
from kmer_tpu.pipeline import nativeagg
from kmer_tpu.pipeline.table import KmerTable

pytestmark = pytest.mark.skipif(nativeagg._load() is None,
                                reason="native aggregator unavailable")


def _rand_pairs(rng, k, n, pool_size):
    """(keys, counts) with duplicates drawn from a pool of pool_size."""
    W = words_per_key(k)
    pool = rng.integers(0, 2 ** 32, (max(pool_size, 1), W), dtype=np.uint32)
    used = 2 * k - 32 * (W - 1)
    if used < 32:
        pool[:, 0] &= (1 << used) - 1
    keys = pool[rng.integers(0, len(pool), n)]
    counts = rng.integers(1, 100, n).astype(np.int64)
    return keys, counts


def _both(monkeypatch, k, keys, counts):
    monkeypatch.setenv("KMER_TPU_NATIVE_AGG", "0")
    ref = KmerTable.from_pairs(k, keys, counts)
    monkeypatch.setenv("KMER_TPU_NATIVE_AGG", "1")
    nat = KmerTable.from_pairs(k, keys, counts)
    return ref, nat


@pytest.mark.parametrize("k", [4, 8, 15, 16, 21, 31, 32, 33, 45, 48, 63])
@pytest.mark.parametrize("pool_frac", [0.01, 0.5, 1.0])
def test_matches_numpy(monkeypatch, k, pool_frac):
    rng = np.random.default_rng(k * 10 + int(pool_frac * 10))
    n = 50_000
    keys, counts = _rand_pairs(rng, k, n, int(n * pool_frac))
    ref, nat = _both(monkeypatch, k, keys, counts)
    assert ref == nat
    # counts conserved and keys strictly ascending lexicographic
    assert nat.total == int(counts.sum())
    if nat.num_distinct > 1:
        # strict ascending lexicographic: compare MS-fused u64 columns
        W = nat.keys.shape[1]
        cols = [nat.keys[:, j].astype(np.uint64) for j in range(W)]
        lt = np.zeros(nat.num_distinct - 1, bool)
        eq = np.ones(nat.num_distinct - 1, bool)
        for c in cols:
            lt |= eq & (c[:-1] < c[1:])
            eq &= c[:-1] == c[1:]
        assert bool(np.all(lt))


@pytest.mark.parametrize("k", [21, 45])
def test_edge_keys(monkeypatch, k):
    """All-zero, all-ones (max key), single-bit keys — the bucket-shift
    derivation's corner cases (width <= 8, shift == 64 boundaries)."""
    W = words_per_key(k)
    used = 2 * k - 32 * (W - 1)
    top = np.uint32((1 << used) - 1) if used < 32 else np.uint32(2**32 - 1)
    mx = np.full((1, W), 2**32 - 1, np.uint32)
    mx[0, 0] = top
    zero = np.zeros((1, W), np.uint32)
    one = zero.copy()
    one[0, W - 1] = 1
    keys = np.concatenate([mx, zero, one, mx, zero] * 40, axis=0)
    counts = np.arange(1, len(keys) + 1, dtype=np.int64)
    ref, nat = _both(monkeypatch, k, keys, counts)
    assert ref == nat
    assert nat.num_distinct == 3


def test_all_equal_and_singleton(monkeypatch):
    keys = np.full((1000, 2), 7, np.uint32)
    counts = np.ones(1000, np.int64)
    ref, nat = _both(monkeypatch, 21, keys, counts)
    assert ref == nat and nat.num_distinct == 1 and nat.total == 1000
    ref, nat = _both(monkeypatch, 21, keys[:1], counts[:1])
    assert ref == nat and nat.num_distinct == 1


def test_low_entropy_buckets(monkeypatch):
    """Keys spanning < 8 significant bits (degenerate bucket range) and
    keys whose entropy sits entirely in the LOW word (hi constant) —
    the partition must not lose order or records."""
    rng = np.random.default_rng(3)
    keys = np.zeros((30_000, 2), np.uint32)
    keys[:, 1] = rng.integers(0, 13, len(keys))          # width 4 bits
    counts = rng.integers(1, 5, len(keys)).astype(np.int64)
    ref, nat = _both(monkeypatch, 21, keys, counts)
    assert ref == nat
    keys[:, 0] = 0x155                                   # constant hi
    keys[:, 1] = rng.integers(0, 2**32, len(keys), dtype=np.uint32)
    ref, nat = _both(monkeypatch, 21, keys, counts)
    assert ref == nat


def test_empty_and_threshold(monkeypatch):
    ref, nat = _both(monkeypatch, 21, np.zeros((0, 2), np.uint32),
                     np.zeros(0, np.int64))
    assert ref == nat and nat.num_distinct == 0
    # auto mode: below MIN_N the native path declines (returns None)
    monkeypatch.setenv("KMER_TPU_NATIVE_AGG", "auto")
    small = nativeagg.aggregate_fused(
        [np.arange(10, dtype=np.uint64)], np.ones(10, np.int64))
    assert small is None


def test_count_sums_int64(monkeypatch):
    """Count sums must accumulate in int64 (counts near 2^31 overflow
    int32 but not int64)."""
    keys = np.zeros((64, 1), np.uint32)
    counts = np.full(64, 2**30, np.int64)
    ref, nat = _both(monkeypatch, 8, keys, counts)
    assert ref == nat and nat.counts[0] == 64 * 2**30


def test_thread_counts_identical(monkeypatch):
    """Result is independent of thread count (bucket order is global
    key order; integer sums are schedule-independent)."""
    rng = np.random.default_rng(11)
    keys, counts = _rand_pairs(rng, 21, 80_000, 5_000)
    monkeypatch.setenv("KMER_TPU_NATIVE_AGG", "1")
    monkeypatch.setenv("KMER_TPU_AGG_THREADS", "1")
    a = KmerTable.from_pairs(21, keys, counts)
    monkeypatch.setenv("KMER_TPU_AGG_THREADS", "7")
    b = KmerTable.from_pairs(21, keys, counts)
    assert a == b


def test_pipeline_end_to_end_forced_native(monkeypatch):
    """Full count_codes pipeline with the native aggregator forced ==
    numpy-only run (integration: per-batch compaction + flush merges
    all route through the same from_pairs)."""
    from kmer_tpu.config import KmerConfig
    from kmer_tpu.pipeline.count import count_codes

    rng = np.random.default_rng(5)
    n_reads, read_len = 64, 120
    codes = rng.integers(0, 4, n_reads * read_len, dtype=np.uint8)
    offsets = np.arange(0, (n_reads + 1) * read_len, read_len,
                        dtype=np.int64)
    cfg = KmerConfig(k=21, canonical=True, batch_reads=16,
                     max_read_len=128)
    monkeypatch.setenv("KMER_TPU_NATIVE_AGG", "0")
    ref = count_codes(codes.copy(), offsets.copy(), cfg)
    monkeypatch.setenv("KMER_TPU_NATIVE_AGG", "1")
    nat = count_codes(codes.copy(), offsets.copy(), cfg)
    assert ref == nat
    assert ref.total == n_reads * (read_len - 21 + 1)


@pytest.mark.parametrize("n_bases", [1, 8, 16, 21, 27, 32, 54, 63])
@pytest.mark.parametrize("newline", [False, True])
def test_decode_rows_matches_numpy(monkeypatch, n_bases, newline):
    """Native one-pass decode == the numpy strided decode, byte-exact,
    for every key width and both row formats (TSV cell / parity line)."""
    from kmer_tpu.ops.encode import (decode_key_words_to_bytes,
                                     decode_key_words_to_lines)
    rng = np.random.default_rng(n_bases)
    W = words_per_key(n_bases)
    keys = rng.integers(0, 2 ** 32, (5_000, W), dtype=np.uint32)
    used = 2 * n_bases - 32 * (W - 1)
    if used < 32:
        keys[:, 0] &= (1 << used) - 1
    fn = decode_key_words_to_lines if newline else decode_key_words_to_bytes
    monkeypatch.setenv("KMER_TPU_NATIVE_AGG", "0")
    ref = fn(keys, n_bases)
    monkeypatch.setenv("KMER_TPU_NATIVE_AGG", "1")
    nat = fn(keys, n_bases)
    if newline:
        assert ref == nat
    else:
        assert np.array_equal(ref, nat)


def test_decode_rows_known_values(monkeypatch):
    """Pin the decode against hand-computed strings (A=0 C=1 G=2 T=3,
    MS-first 2-bit layout)."""
    from kmer_tpu.ops.encode import encode_seq, key_words_from_codes
    monkeypatch.setenv("KMER_TPU_NATIVE_AGG", "1")
    for s in ("ACGT", "TTTTTTTT", "AACCGGTTACGTACGTACGTA"):
        key = key_words_from_codes(encode_seq(s)).reshape(1, -1)
        got = nativeagg.decode_rows(key, len(s), newline=True)
        assert got is not None
        assert got.tobytes() == s.encode() + b"\n"


def test_format_tsv_matches_numpy(monkeypatch):
    """Native TSV rendering == the numpy %d path, byte-exact, across
    widths and count magnitudes (1-digit .. 2^62)."""
    import io
    rng = np.random.default_rng(17)
    # 16/32/48: sentinel adds a word (2k%32==0) — the width check must
    # accept words_per_key, not (2k+31)//32 (ADVICE r4)
    for k in (8, 16, 21, 32, 48, 54, 63):
        keys, _ = _rand_pairs(rng, k, 6_000, 6_000)
        mags = rng.integers(0, 62, len(keys))
        counts = (np.int64(1) << mags) + rng.integers(0, 9, len(keys))
        # negative counts can't come out of the pipeline, but the
        # renderer must still match %d exactly (incl. int64 min)
        counts[:4] = [-1, -5, np.iinfo(np.int64).min, -10**18]
        t = KmerTable(k, keys, counts.astype(np.int64))
        monkeypatch.setenv("KMER_TPU_NATIVE_AGG", "0")
        a = io.BytesIO(); t.write_tsv(a)
        monkeypatch.setenv("KMER_TPU_NATIVE_AGG", "1")
        b = io.BytesIO(); t.write_tsv(b)
        assert a.getvalue() == b.getvalue()
        # text-stream route too
        c = io.StringIO(); t.write_tsv(c)
        assert c.getvalue().encode() == a.getvalue()
