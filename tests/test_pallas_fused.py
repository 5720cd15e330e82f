"""Correctness of the fused grouped sort+run-length Pallas kernel
(ops/pallas/fused_count) against the XLA grouped_count path, interpret
mode on CPU.  Sizes kept small — interpreter cost scales with the
unrolled bitonic network."""

import numpy as np
import pytest

import jax.numpy as jnp

from kmer_tpu.ops import count as C
from kmer_tpu.ops.encode import words_per_key
from kmer_tpu.pipeline.table import KmerTable


def _aggregate(k, std, is_start, counts):
    ks = np.stack([np.asarray(w) for w in std], 1)
    cc = np.asarray(counts)
    sel = np.asarray(is_start) & (cc > 0)
    return KmerTable.from_pairs(k, ks[sel], cc[sel])


@pytest.mark.parametrize("k", [15, 21, 54])
def test_fused_kernel_matches_xla(k):
    """W = 1, 2, 4 word keys; duplicates, ties and invalid lanes."""
    rng = np.random.default_rng(k)
    n = 700
    W = words_per_key(k)
    s = 2 * k - 32 * (W - 1)
    valid = rng.random(n) < 0.85
    words = []
    for i in range(W):
        used = s if i == 0 else 32
        # tiny value range forces duplicate keys and sort-prefix ties
        w = rng.integers(0, min(1 << used, 6), n).astype(np.uint32)
        words.append(np.where(valid, w, 0xFFFFFFFF).astype(np.uint32))
    jw = [jnp.asarray(w) for w in words]
    jv = jnp.asarray(valid)

    truth = KmerTable.from_pairs(k, np.stack(words, 1)[valid],
                                 np.ones(int(valid.sum()), np.int64))
    for backend in ("xla", "pallas", "hybrid"):
        t = _aggregate(k, *C.grouped_count(jw, jv, k, 128, backend=backend))
        assert t == truth, backend
