"""On-device compaction: pack per-group distinct prefixes contiguously
(VERDICT r1 #2 — D2H must scale with DISTINCT k-mers, not total).

After the grouped count + a within-group partition sort, each group's
live (key, count) records occupy its first d[g] record slots.  Records
are 4 uint32 fields (word0, word1, count, pad) packed 32-to-a-row so
every row is exactly 128 lanes (the TPU tiling unit — Mosaic rejects a
4-lane minor dimension).  The kernel writes every group's FULL row
block at row offset base[g] = exclusive-cumsum(ceil(d/32)): the TPU
grid executes sequentially in order, so group g+1's write overwrites
group g's dead tail rows — a scatter-free compaction with one linear
DMA per group.  Up to 31 dead records per group ride along inside the
last live row; they carry count == 0 and are dropped by the host
filter (pipeline.table.KmerTable.from_compact).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REC_PER_ROW = 32          # 32 records x 4 u32 fields = 128 lanes


def _rows_of(w0, w1, cnt):
    G, m = w0.shape
    rec = jnp.stack([w0, w1, cnt, jnp.zeros_like(w0)], axis=-1)
    return rec.reshape(G, m // REC_PER_ROW, 128)


def pack_groups_xla(w0, w1, cnt, d):
    """Reference/off-TPU implementation (searchsorted + gather — the
    gather serializes on TPU; the DMA kernel below is the TPU path)."""
    G, m = w0.shape
    rows = _rows_of(w0, w1, cnt)
    rg = m // REC_PER_ROW
    d32 = -(-d // REC_PER_ROW)
    base = (jnp.cumsum(d32) - d32).astype(jnp.int32)
    total = d32.sum().astype(jnp.int32)
    j = jnp.arange(G * rg + rg, dtype=jnp.int32)
    g = jnp.clip(jnp.searchsorted(base + d32, j, side="right"), 0, G - 1)
    r = j - base[g]
    live = j < total
    out = jnp.where(live[:, None], rows[g, jnp.clip(r, 0, rg - 1)], 0)
    return out, total


def pack_groups(w0, w1, cnt, d, *, interpret: bool = False):
    """w0/w1/cnt (G, m) uint32 record fields (live records first per
    group), d (G,) int32 live-record counts.

    Returns (out, total_rows): out (G*m/32 + m/32, 128) uint32 whose
    first `total_rows` rows hold all live records (plus < 32 dead
    count==0 records per group); total_rows = sum(ceil(d/32)).
    """
    G, m = w0.shape
    assert m % REC_PER_ROW == 0, m
    rg = m // REC_PER_ROW
    rows = _rows_of(w0, w1, cnt)
    d32 = -(-d // REC_PER_ROW)
    base = (jnp.cumsum(d32) - d32).astype(jnp.int32)
    total = d32.sum().astype(jnp.int32)

    def kernel(base_ref, rows_ref, out_ref, sem):
        g = pl.program_id(0)
        dma = pltpu.make_async_copy(
            rows_ref.at[0],
            out_ref.at[pl.ds(base_ref[g], rg), :],
            sem)
        dma.start()
        dma.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[pl.BlockSpec((1, rg, 128), lambda g, base: (g, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G * rg + rg, 128), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(base, rows)
    return out, total
