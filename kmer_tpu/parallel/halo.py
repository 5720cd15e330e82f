"""Halo exchange for reads sharded along the sequence axis.

The sequence-parallel component (SURVEY.md §5.7): when a read batch's
length dimension is sharded over mesh axis "seq", windows that straddle
a shard seam need the first (span-1) bases of the right neighbor.  One
ring ppermute fetches them; each shard then owns exactly the windows
that START inside its span, so every window is extracted exactly once
(the device-side twin of io.fasta.segment_records seam ownership).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def halo_extend(codes_local: jnp.ndarray, axis_name: str, halo: int) -> jnp.ndarray:
    """Append the next `halo` columns (from following seq shards) to
    this shard.

    codes_local: (B, L_loc) uint8 inside shard_map.  When halo > L_loc
    the exchange runs multiple ring hops, pulling whole shards from
    neighbors 1, 2, ... until the halo is covered — so arbitrarily
    large window spans work on arbitrarily narrow shards.  Trailing
    shards receive wraparound garbage — harmless because window
    validity is computed from global read lengths (global positions
    past len-span are masked regardless of content).
    """
    n = lax.axis_size(axis_name)
    L_loc = codes_local.shape[1]
    if halo == 0 or n == 1:
        pad = jnp.zeros((codes_local.shape[0], halo), codes_local.dtype)
        return jnp.concatenate([codes_local, pad], axis=1) if halo else codes_local
    parts = [codes_local]
    remaining = halo
    hop = 1
    while remaining > 0:
        # pull the shard `hop` positions to the right (ring): every
        # shard sends its own block `hop` steps to the LEFT.
        perm = [(i, (i - hop) % n) for i in range(n)]
        recv = lax.ppermute(codes_local, axis_name, perm)
        take = min(remaining, L_loc)
        parts.append(recv[:, :take])
        remaining -= take
        hop += 1
    return jnp.concatenate(parts, axis=1)


def seq_shard_lane_mask(B: int, L_loc: int, lengths: jnp.ndarray,
                        axis_name: str, span: int) -> jnp.ndarray:
    """Validity of the L_loc window-start lanes of this seq shard.

    Lane p corresponds to global window start s*L_loc + p (s = shard
    index); valid iff it fits the read: gpos + span <= lengths[b].
    """
    s = lax.axis_index(axis_name)
    gpos = lax.broadcasted_iota(jnp.int32, (B, L_loc), 1) + s * L_loc
    return gpos <= (lengths.astype(jnp.int32)[:, None] - span)
