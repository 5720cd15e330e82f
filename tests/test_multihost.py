"""Multi-host helpers (single-process degenerate checks; the real
multi-process path shares every code line except process_count)."""

import numpy as np

from kmer_tpu.parallel import multihost
from kmer_tpu.parallel import mesh as mesh_lib


def test_host_record_range_partition():
    for n in (0, 1, 7, 64, 1001):
        for pc in (1, 2, 3, 8):
            ranges = [multihost.host_record_range(n, pid, pc)
                      for pid in range(pc)]
            # contiguous, complete, disjoint
            assert ranges[0][0] == 0 and ranges[-1][1] == n
            for (a0, a1), (b0, b1) in zip(ranges, ranges[1:]):
                assert a1 == b0
            sizes = [e - s for s, e in ranges]
            assert max(sizes) - min(sizes) <= 1


def test_initialize_single_process_noop():
    multihost.initialize(num_processes=1)   # must not raise


def test_global_batch_single_process():
    m = mesh_lib.make_mesh(8, 1)
    B, L = 16, 32
    rng = np.random.default_rng(0)
    rows = {
        "codes": rng.integers(0, 4, (B, L), dtype=np.uint8),
        "lengths": np.full((B,), L, np.int32),
        "limits": np.full((B,), L, np.int32),
    }
    codes, lengths, limits = multihost.global_batch(m, rows)
    assert codes.shape == (B, L) and lengths.shape == (B,)
    np.testing.assert_array_equal(np.asarray(codes), rows["codes"])
    np.testing.assert_array_equal(np.asarray(lengths), rows["lengths"])


def test_iter_host_batches_chunked_equals_slice():
    """The rolling chunked batcher must produce the same record slice
    and batch composition as the in-memory iter_batches path, across
    host slices and tiny chunk sizes (records straddling chunks)."""
    import tempfile, os
    from kmer_tpu import KmerConfig
    from kmer_tpu.io.fasta import (iter_batches, parse_seqs,
                                   scan_record_offsets)
    from kmer_tpu.io.generator import random_reads_fasta

    with tempfile.TemporaryDirectory() as d:
        fa = os.path.join(d, "c.fasta")
        with open(fa, "w") as f:
            # variable-length reads incl. ones longer than max_read_len
            f.write(random_reads_fasta(23, 70, seed=5))
        cfg = KmerConfig(k=11, batch_reads=4, max_read_len=48,
                         ingest_chunk_bases=257)
        codes, offsets = parse_seqs(fa)
        off2 = scan_record_offsets(fa, max_bases=257)
        np.testing.assert_array_equal(offsets, off2)
        n = len(offsets) - 1
        for (s, e) in [(0, n), (0, (n + 1) // 2), ((n + 1) // 2, n),
                       (3, 5), (n, n)]:
            want = list(iter_batches(codes[offsets[s]:offsets[e]],
                                     offsets[s:e + 1] - offsets[s],
                                     batch_reads=4, max_len=48,
                                     overlap=cfg.overlap)) if e > s else []
            got = list(multihost._iter_host_batches_chunked(fa, cfg, s, e, 4))
            if e == s:
                assert got == []
                continue
            assert len(got) == len(want)
            for gb, wb in zip(got, want):
                np.testing.assert_array_equal(gb.codes, wb.codes)
                np.testing.assert_array_equal(gb.lengths, wb.lengths)
                np.testing.assert_array_equal(gb.start_limits,
                                              wb.start_limits)


def test_multihost_empty_input_key_width(tmp_path):
    """Empty corpus through the multihost driver: the table must carry
    the CONFIG's key width (cfg.n_bases — gapped l+r, spaced popcount),
    not k (VERDICT r3 #8: a k-wide empty table would corrupt any
    subsequent merge via a from_pairs reshape)."""
    from kmer_tpu import KmerConfig
    from kmer_tpu.ops.encode import words_per_key
    from kmer_tpu.parallel.multihost import count_fasta_multihost
    fa = tmp_path / "empty.fasta"
    fa.write_text("")
    for cfg in (
        KmerConfig(gapped=True, c_min=60, c_max=64, batch_reads=8,
                   max_read_len=64),
        KmerConfig(seed_mask="110101011", batch_reads=8, max_read_len=64),
        KmerConfig(k=21, batch_reads=8, max_read_len=64),
    ):
        t = count_fasta_multihost(str(fa), cfg)
        assert t.num_distinct == 0
        assert t.k == cfg.n_bases
        assert t.keys.shape == (0, words_per_key(cfg.n_bases))


def test_multihost_dense_psum_single_process(tmp_path):
    """Dense mode through the multihost driver (psum over the whole
    mesh): == count_fasta's dense table, and gather=False returns the
    same already-global table."""
    from kmer_tpu import KmerConfig, count_fasta
    from kmer_tpu.io.generator import random_reads_fasta
    from kmer_tpu.parallel.multihost import count_fasta_multihost
    fa = tmp_path / "dense.fasta"
    fa.write_text(random_reads_fasta(19, 70, seed=5))
    for cfg in (
        KmerConfig(k=8, mode="dense", batch_reads=8, max_read_len=96),
        KmerConfig(k=6, mode="dense", canonical=True, batch_reads=8,
                   max_read_len=96),
        KmerConfig(k=9, mode="dense", batch_reads=8, max_read_len=96),
    ):
        ref = count_fasta(str(fa), cfg)
        got = count_fasta_multihost(str(fa), cfg)
        assert got == ref
        assert count_fasta_multihost(str(fa), cfg, gather=False) == ref
