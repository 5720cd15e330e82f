#!/usr/bin/env python3
"""Multi-chip scaling bench (BASELINE.json config 5): throughput of the
production distributed count step (fused-local pair routing) across
mesh sizes 1, 2, 4, ..., N, and the scaling efficiency
eff(N) = rate(N) / (N * rate(1)).

On a real pod slice this is the headline scaling number (target
>= 0.9 at N >= 2 hosts).  On this dev rig only ONE real chip exists,
so the default run here uses the virtual CPU mesh
(JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8)
— which validates the harness and the sharding/collective structure,
NOT silicon scaling (CPU "devices" share cores; expect eff << 1).

Methodology: chained non-foldable feedback + readback forcing, best
window of NBLOCKS (docs/DESIGN.md).

Usage: python scripts/scaling_bench.py [--k 21] [--b-per-dev 4096]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from kmer_tpu.utils.jaxcache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kmer_tpu.parallel import distributed, mesh as mesh_lib  # noqa: E402


def bench_mesh(n_dev: int, k: int, b_per_dev: int, L: int,
               iters: int, nblocks: int) -> float:
    m = mesh_lib.make_mesh(n_dev, 1)
    B = b_per_dev * n_dev
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, (B, L), dtype=np.uint8))
    lengths = jnp.full((B,), L, jnp.int32)
    limits = jnp.full((B,), L, jnp.int32)
    fn = distributed.make_distributed_count_pairs(m, k=k, canonical=True)

    def step(codes):
        words, counts, overflow = fn(codes, lengths, limits)
        inj = (counts.reshape(-1)[:B].astype(jnp.uint32)
               % 4).astype(jnp.uint8)
        return codes.at[:, 0].set(inj)

    s = step(codes)
    _ = np.asarray(s[:4, 0])
    for _ in range(max(iters // 2, 10)):
        s = step(s)
    _ = np.asarray(s[:4, 0])
    best = float("inf")
    for _ in range(nblocks):
        t0 = time.perf_counter()
        for _ in range(iters):
            s = step(s)
        _ = np.asarray(s[:4, 0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return B * (L - k + 1) / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=21)
    ap.add_argument("--b-per-dev", type=int, default=4096)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--nblocks", type=int, default=4)
    args = ap.parse_args()

    n_avail = len(jax.devices())
    print(f"devices: {n_avail} x {jax.devices()[0].device_kind} "
          f"(backend={jax.default_backend()})", flush=True)
    if jax.default_backend() != "tpu":
        print("NOTE: non-TPU backend — this validates the harness, "
              "not silicon scaling", flush=True)
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
    rates = {}
    for n in sizes:
        r = bench_mesh(n, args.k, args.b_per_dev, args.read_len,
                       args.iters, args.nblocks)
        rates[n] = r
        eff = r / (n * rates[1])
        unit, div = ("B", 1e9) if rates[1] >= 1e8 else ("M", 1e6)
        print(f"n={n:3d}  {r/div:10.2f} {unit} kmers/s  "
              f"per-dev {r/n/div:8.2f} {unit}  eff={eff:.3f}", flush=True)


if __name__ == "__main__":
    main()
