"""Pallas bitonic sort vs numpy ground truth (interpret mode on CPU;
the same kernel compiles for TPU — bench.py exercises that path)."""

import numpy as np
import pytest

import jax.numpy as jnp

from kmer_tpu.ops.pallas.sort import sort_words_pallas, SENTINEL


def _np_sorted(words):
    """Ground truth: lexicographic sort of the word tuples."""
    keys = np.stack([np.asarray(w).reshape(-1) for w in words], axis=1)
    be = np.ascontiguousarray(keys.astype(">u4"))
    v = be.view(np.dtype((np.void, be.shape[1] * 4))).reshape(-1)
    order = np.argsort(v, kind="stable")
    return [keys[order, i] for i in range(keys.shape[1])]


def _check(words, **kw):
    got = sort_words_pallas([jnp.asarray(w) for w in words],
                            interpret=True, **kw)
    want = _np_sorted(words)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), w)


@pytest.mark.parametrize("W", [1, 2, 4])
@pytest.mark.parametrize("N", [1024, 1500, 4096])
def test_sort_random(W, N):
    rng = np.random.default_rng(N * 10 + W)
    words = [rng.integers(0, 2**32, N, dtype=np.uint32) for _ in range(W)]
    _check(words)


def test_sort_with_sentinels():
    rng = np.random.default_rng(0)
    N = 2048
    hi = rng.integers(0, 2**11, N, dtype=np.uint32)
    lo = rng.integers(0, 2**32, N, dtype=np.uint32)
    inval = rng.random(N) < 0.3
    hi[inval] = np.uint32(SENTINEL)
    lo[inval] = np.uint32(SENTINEL)
    _check([hi, lo])


def test_sort_many_duplicates():
    rng = np.random.default_rng(1)
    N = 4096
    hi = rng.integers(0, 4, N, dtype=np.uint32)
    lo = rng.integers(0, 8, N, dtype=np.uint32)
    _check([hi, lo])


def test_sort_multi_chunk():
    """N spanning several chunks exercises the cross-chunk stages."""
    rng = np.random.default_rng(2)
    N = 6000
    words = [rng.integers(0, 2**32, N, dtype=np.uint32) for _ in range(2)]
    _check(words, chunk=2048)


def test_sort_multi_chunk_pow2():
    rng = np.random.default_rng(3)
    N = 8192
    words = [rng.integers(0, 2**32, N, dtype=np.uint32) for _ in range(2)]
    _check(words, chunk=1024)


def test_small_falls_back_to_lax_sort():
    rng = np.random.default_rng(4)
    words = [rng.integers(0, 2**32, 100, dtype=np.uint32) for _ in range(2)]
    _check(words)


def test_presorted_and_reversed():
    N = 2048
    asc = np.arange(N, dtype=np.uint32)
    _check([asc])
    _check([asc[::-1].copy()])
