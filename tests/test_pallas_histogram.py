"""Pallas MXU one-hot histogram vs numpy bincount (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from kmer_tpu.ops.pallas.histogram import dense_histogram_mxu


@pytest.mark.parametrize("k,N", [(8, 5000), (8, 1024), (6, 3000), (4, 2048)])
def test_histogram_matches_bincount(k, N):
    rng = np.random.default_rng(k * 100 + N)
    idx = rng.integers(0, 4 ** k, N, dtype=np.int32)
    valid = rng.random(N) < 0.8
    got = dense_histogram_mxu(jnp.asarray(idx), jnp.asarray(valid), k,
                              interpret=True)
    want = np.bincount(idx[valid], minlength=4 ** k)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_histogram_all_invalid():
    idx = np.zeros(2048, np.int32)
    got = dense_histogram_mxu(jnp.asarray(idx),
                              jnp.zeros(2048, bool), 8, interpret=True)
    assert int(np.asarray(got).sum()) == 0


def test_histogram_2d_input_shapes():
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 4 ** 8, (16, 130), dtype=np.int32)
    valid = rng.random((16, 130)) < 0.5
    got = dense_histogram_mxu(jnp.asarray(idx), jnp.asarray(valid), 8,
                              interpret=True)
    want = np.bincount(idx[valid].ravel(), minlength=4 ** 8)
    np.testing.assert_array_equal(np.asarray(got), want)
