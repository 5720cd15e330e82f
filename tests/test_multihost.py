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
