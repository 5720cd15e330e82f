"""Pallas MXU histogram: dense 4^k counting as one-hot matmuls.

XLA lowers `hist.at[idx].add(1)` to a serialized scatter on TPU.  The
MXU-native formulation: split the 2k-bit index into hi/lo halves and
compute the outer-product histogram

    hist2d[h, l] = sum_t onehot(hi_t)[h] * onehot(lo_t)[l]

— a (T, H)^T @ (T, L) matmul per tile, accumulated in a VMEM scratch
across the grid, so HBM sees only the index stream (4 bytes/key) and one
histogram write.  bf16 one-hots with f32 accumulation are exact for tile
sums < 2^24 (enforced by the caller-side batch bound).

Replaces the counting step of the reference's sort-then-scan pipeline
(k-mer-count/src/main.rs:87-90) for small k with a sort-free path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DENSE_MXU_K_MAX = 8          # 4^8 = 65536 bins = (256, 256)
_TILE_ROWS = 32              # (32, 128) index tile -> T = 4096 keys/step
                             # (r3 clean-block sweep at 4^8 bins:
                             # 8/16/32/64 rows = 12.6/11.8/10.7/10.5 ms
                             # per 4.7 M keys — bigger matmuls amortize
                             # the one-hot build; 64 is marginal and
                             # doubles the VMEM intermediates)


def _hist_kernel(idx_ref, valid_ref, out_ref, acc_ref, *,
                 bh: int, bl: int):
    H, L = 1 << bh, 1 << bl

    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    idx = idx_ref[:].astype(jnp.int32)          # (Tr, 128)
    valid = valid_ref[:]                        # (Tr, 128) int32 0/1
    tr, lanes = idx.shape
    hi = (idx >> bl)[:, :, None]
    lo = (idx & (L - 1))[:, :, None]
    ioh = lax.broadcasted_iota(jnp.int32, (tr, lanes, H), 2)
    iol = lax.broadcasted_iota(jnp.int32, (tr, lanes, L), 2)
    oh_hi = ((hi == ioh) & (valid[:, :, None] != 0)).astype(jnp.bfloat16)
    oh_lo = (lo == iol).astype(jnp.bfloat16)
    t = tr * lanes
    acc_ref[:] += lax.dot_general(
        oh_hi.reshape(t, H), oh_lo.reshape(t, L),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(jnp.int32)


def dense_histogram_mxu(word: jnp.ndarray, valid: jnp.ndarray, k: int,
                        *, interpret: bool = False) -> jnp.ndarray:
    """4^k histogram of `word` (any shape, flattened) where valid.

    Returns (4^k,) int32.  Requires k <= DENSE_MXU_K_MAX and fewer than
    2^24 keys per call (f32 accumulator exactness).
    """
    assert k <= DENSE_MXU_K_MAX, k
    return index_histogram_mxu(word, valid, 2 * k, interpret=interpret)


def index_histogram_mxu(word: jnp.ndarray, valid: jnp.ndarray,
                        n_bits: int, *,
                        interpret: bool = False) -> jnp.ndarray:
    """Histogram of `word` (any shape, flattened, values < 2^n_bits)
    where valid — the same hi/lo outer-product one-hot matmul as the
    dense k-mer table, for ANY index width <= 16 bits (the HLL sketch
    uses (bucket, rho) classes; ops/sketch.py).

    Returns (2^n_bits,) int32; < 2^24 keys per call."""
    assert 1 <= n_bits <= 16, n_bits
    bits = n_bits
    bh = (bits + 1) // 2
    bl = bits - bh
    H, L = 1 << bh, 1 << bl

    idx = word.reshape(-1).astype(jnp.int32)
    v = valid.reshape(-1).astype(jnp.int32)
    N = idx.shape[0]
    if N == 0:
        # a zero-iteration pallas grid never writes out_ref — the result
        # would be uninitialized memory (ADVICE r1)
        return jnp.zeros((1 << bits,), jnp.int32)
    assert N < (1 << 24), "tile accumulation exactness bound"
    tile = _TILE_ROWS * 128
    n = math.ceil(N / tile) * tile
    if n != N:
        idx = jnp.concatenate([idx, jnp.zeros((n - N,), jnp.int32)])
        v = jnp.concatenate([v, jnp.zeros((n - N,), jnp.int32)])
    idx2 = idx.reshape(-1, 128)
    v2 = v.reshape(-1, 128)
    grid = (n // tile,)
    spec = pl.BlockSpec((_TILE_ROWS, 128), lambda q: (q, 0),
                        memory_space=pltpu.VMEM)
    hist2d = pl.pallas_call(
        functools.partial(_hist_kernel, bh=bh, bl=bl),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=pl.BlockSpec((H, L), lambda q: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, L), jnp.int32),
        scratch_shapes=[pltpu.VMEM((H, L), jnp.float32)],
        interpret=interpret,
    )(idx2, v2)
    return hist2d.reshape(-1)
