"""D2H link-speed probe for the auto counting-mode policy.

Dense mode's value is its O(4^k)-bytes once-per-corpus D2H (the count
table stays device-resident between batches) — bought with a one-hot
MXU histogram step that is ~75x slower per key than the fused sort
step (docs/DESIGN.md round-3 decomposition).  That trade flips with
the host link: on a ~0.15 GB/s tunneled attachment dense wins for
k <= 8, while on a production PCIe/DMA host (10-100 GB/s) the sort
path's per-batch readback is cheap and its per-key device advantage
dominates.  config.effective_mode consults this probe to route "auto"
(VERDICT r3 #7) — lazily, so constructing a KmerConfig never touches
the backend (multihost must initialize jax.distributed first).
"""

from __future__ import annotations

import os

_cache: dict = {}

# breakeven: the non-compact sort path reads back ~12 B/lane (key +
# run-start + count) while dense spends ~2.25 ns extra device time per
# lane (10.7 ms / 4.7 M keys, DESIGN r3).  Equal cost at
# 12 B / 2.25 ns ~= 5.3 GB/s; links slower than that favor the dense
# device-resident table.
DENSE_BREAKEVEN_GBPS = 5.0


def d2h_gbps(probe_mb: int = 4) -> float:
    """Device->host bandwidth in GB/s, measured once per process.

    Env override KMER_TPU_D2H_GBPS skips the probe entirely (useful in
    tests and on rigs whose bandwidth is known).  On the CPU backend
    "D2H" is a host memcpy — returns inf (never the bottleneck).
    """
    env = os.environ.get("KMER_TPU_D2H_GBPS")
    if env:
        return float(env)
    if "gbps" not in _cache:
        import time

        import numpy as np

        import jax
        if jax.default_backend() == "cpu":
            _cache["gbps"] = float("inf")
        else:
            import jax.numpy as jnp

            # a FRESH device buffer per rep: re-reading the same buffer
            # is served from a host-side cache on remote attachments
            # (measured r5: same-buffer rep read "4650 GB/s" on a
            # ~15 MB/s tunnel — 5 orders of magnitude wrong, flipping
            # every link-aware policy the wrong way), so each timed
            # readback must see content the host has never fetched
            n = probe_mb << 20
            make = jax.jit(lambda s: jnp.zeros((n // 4,), jnp.int32) + s)
            np.asarray(make(0))      # warm: executable + link setup
            best = float("inf")
            for rep in (1, 2):
                x = make(rep)
                t0 = time.perf_counter()
                np.asarray(x)
                best = min(best, time.perf_counter() - t0)
            _cache["gbps"] = (n / best) / 1e9
    return _cache["gbps"]


def dense_auto_ok() -> bool:
    """auto-mode policy: dense (device-resident 4^k table) only when
    the D2H link is slower than the breakeven.  Threshold overridable
    via KMER_TPU_DENSE_LINK_GBPS."""
    thr = float(os.environ.get("KMER_TPU_DENSE_LINK_GBPS",
                               DENSE_BREAKEVEN_GBPS))
    return d2h_gbps() < thr


# dense k=9..12: a device XLA scatter-add costs a flat ~10 ns/lane on
# v5e at 4^12 bins — independent of index sortedness, uniqueness hints,
# or pre-aggregation (scripts/dense_scatter_ab.py, r4) — while the
# hybrid's per-batch readback costs 5 B/lane (u32 key + i8 count).
# Equal cost at 5 B / 10.2 ns ~= 0.49 GB/s.
SCATTER_BREAKEVEN_GBPS = 0.49


def dense_scatter_ok() -> bool:
    """dense k=9..12 policy: accumulate the 4^k table ON DEVICE via
    scatter-add (zero per-batch D2H) only when the link is slower than
    the measured scatter/readback crossover; otherwise the hybrid
    (device sort-count + host np.add.at) wins.  KMER_TPU_DENSE_SCATTER
    forces (1) or disables (0)."""
    env = os.environ.get("KMER_TPU_DENSE_SCATTER")
    if env in ("0", "1"):
        return env == "1"
    thr = float(os.environ.get("KMER_TPU_SCATTER_LINK_GBPS",
                               SCATTER_BREAKEVEN_GBPS))
    return d2h_gbps() < thr
