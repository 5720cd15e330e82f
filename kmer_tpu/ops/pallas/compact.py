"""On-device compaction: pack per-group distinct prefixes contiguously
(VERDICT r1 #2 — D2H must scale with DISTINCT k-mers, not total).

After the grouped count + a within-group partition sort, each group's
live (key, count) records occupy its first d[g] record slots.  A record
is the repacked key words followed by the count, zero-padded to a
power-of-two field width (4 fields for W <= 3 keys — e.g. contiguous
k <= 31 — 8 fields up to W = 7, e.g. the gapped 54-base chunks), packed
so every row is exactly 128 lanes (the TPU tiling unit — Mosaic rejects
a narrow minor dimension).  The kernel writes every group's FULL row
block at row offset base[g] = exclusive-cumsum(ceil(d/rec_per_row)):
the TPU grid executes sequentially in order, so group g+1's write
overwrites group g's dead tail rows — a scatter-free compaction with
one linear DMA per group.  Up to rec_per_row-1 dead records per group
ride along inside the last live row; they carry count == 0 and are
dropped by the host filter (pipeline.table.KmerTable.from_compact).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def record_width(n_fields: int) -> int:
    """Fields per packed record: power of two >= n_fields, min 4 (the
    count rides as the LAST live field; the rest is zero padding)."""
    assert 1 <= n_fields <= 128, n_fields
    return max(4, 1 << (n_fields - 1).bit_length())


def _rows_of(fields):
    """fields: list of (G, m) uint32 (key words... count LAST) ->
    ((G, m/rpr, 128) row blocks, records per row)."""
    G, m = fields[0].shape
    rec_w = record_width(len(fields))
    rpr = 128 // rec_w
    assert m % rpr == 0, (m, rpr)
    cols = list(fields) + [jnp.zeros_like(fields[0])] * (rec_w - len(fields))
    rec = jnp.stack(cols, axis=-1)
    return rec.reshape(G, m // rpr, 128), rpr


def pack_groups_xla(fields, d):
    """Reference/off-TPU implementation (searchsorted + gather — the
    gather serializes on TPU; the DMA kernel below is the TPU path)."""
    G, m = fields[0].shape
    rows, rpr = _rows_of(fields)
    rg = m // rpr
    dr = -(-d // rpr)
    base = (jnp.cumsum(dr) - dr).astype(jnp.int32)
    total = dr.sum().astype(jnp.int32)
    j = jnp.arange(G * rg + rg, dtype=jnp.int32)
    g = jnp.clip(jnp.searchsorted(base + dr, j, side="right"), 0, G - 1)
    r = j - base[g]
    live = j < total
    out = jnp.where(live[:, None], rows[g, jnp.clip(r, 0, rg - 1)], 0)
    return out, total


def pack_groups(fields, d, *, interpret: bool = False):
    """fields: list of (G, m) uint32 record fields (key words then the
    count, live records first per group), d (G,) int32 live counts.

    Returns (out, total_rows): out (G*m/rpr + m/rpr, 128) uint32 whose
    first `total_rows` rows hold all live records (plus < rpr dead
    count==0 records per group); total_rows = sum(ceil(d/rpr)) where
    rpr = 128 // record_width(len(fields)).
    """
    G, m = fields[0].shape
    rows, rpr = _rows_of(fields)
    rg = m // rpr
    dr = -(-d // rpr)
    base = (jnp.cumsum(dr) - dr).astype(jnp.int32)
    total = dr.sum().astype(jnp.int32)

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
