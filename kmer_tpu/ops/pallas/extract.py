"""Pallas extraction kernel: codes -> canonical repacked k-mer keys in
one VMEM pass (TPU fast path for 17 <= k <= 31, W = 2 words).

Replaces the reference's per-window string slicing (main.rs:63-81) AND
the XLA slice-sum extractor (ops/extract.py) on the hot path: XLA's
fusion re-reads the code matrix once per base offset (~2k passes over
HBM-cached input), while this kernel loads each row block into VMEM
once and accumulates all 2k shifted contributions in registers —
forward and reverse-complement keys, canonical min, validity masks and
the sort-layout repack (ops/count.repack_words) fused into one pass.

Output layout: (top, bot) uint32 — top = key bits [2k-1 .. 2k-32],
bot = the low 2k-32 bits with SENTINEL marking invalid lanes (the
repacked convention grouped_count sorts with num_keys=1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SENTINEL = 0xFFFFFFFF
BLOCK_B = 256           # rows per grid step


def _extract_kernel(codes_ref, len_ref, lim_ref, top_ref, bot_ref, *,
                    k: int, P: int, canonical: bool):
    c = codes_ref[:].astype(jnp.uint32)            # (Bt, L)
    low = 2 * k - 32                               # bits in the bot word
    shape = (c.shape[0], P)
    ftop = jnp.zeros(shape, jnp.uint32)
    fbot = jnp.zeros(shape, jnp.uint32)
    if canonical:
        rtop = jnp.zeros(shape, jnp.uint32)
        rbot = jnp.zeros(shape, jnp.uint32)
    for j in range(k):
        sl = c[:, j:j + P]
        fpos = 2 * (k - 1 - j)
        if fpos >= low:
            ftop = ftop | (sl << jnp.uint32(fpos - low))
        else:
            fbot = fbot | (sl << jnp.uint32(fpos))
        if canonical:
            rsl = jnp.uint32(3) - sl
            rpos = 2 * j
            if rpos >= low:
                rtop = rtop | (rsl << jnp.uint32(rpos - low))
            else:
                rbot = rbot | (rsl << jnp.uint32(rpos))
    if canonical:
        take_rc = (rtop < ftop) | ((rtop == ftop) & (rbot < fbot))
        ftop = jnp.where(take_rc, rtop, ftop)
        fbot = jnp.where(take_rc, rbot, fbot)
    pos = lax.broadcasted_iota(jnp.int32, shape, 1)
    valid = (pos <= len_ref[:] - k) & (pos < lim_ref[:])
    top_ref[:] = jnp.where(valid, ftop, jnp.uint32(SENTINEL))
    bot_ref[:] = jnp.where(valid, fbot, jnp.uint32(SENTINEL))


def extract_repacked(codes, lengths, limits, k: int, canonical: bool,
                     *, interpret: bool = False):
    """(B, L) uint8 codes -> (top, bot) (B, P) uint32 repacked keys.

    Requires 17 <= k <= 31 (two-word keys) and pure-ACGT codes (the
    skip-invalid ambiguity path stays on the XLA extractor).
    """
    assert 17 <= k <= 31, k
    B, L = codes.shape
    P = L - k + 1
    bb = min(BLOCK_B, B)
    pad = (-B) % bb
    if pad:
        codes = jnp.concatenate(
            [codes, jnp.zeros((pad, L), codes.dtype)])
        lengths = jnp.concatenate([lengths, jnp.zeros((pad,), lengths.dtype)])
        limits = jnp.concatenate([limits, jnp.zeros((pad,), limits.dtype)])
    Bp = B + pad
    len2 = lengths.reshape(Bp, 1).astype(jnp.int32)
    lim2 = limits.reshape(Bp, 1).astype(jnp.int32)
    cspec = pl.BlockSpec((bb, L), lambda q: (q, 0), memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((bb, 1), lambda q: (q, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((bb, P), lambda q: (q, 0), memory_space=pltpu.VMEM)
    top, bot = pl.pallas_call(
        functools.partial(_extract_kernel, k=k, P=P, canonical=canonical),
        grid=(Bp // bb,),
        in_specs=[cspec, rspec, rspec],
        out_specs=[ospec, ospec],
        out_shape=[jax.ShapeDtypeStruct((Bp, P), jnp.uint32),
                   jax.ShapeDtypeStruct((Bp, P), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(codes, len2, lim2)
    return top[:B], bot[:B]
