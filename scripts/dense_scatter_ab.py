#!/usr/bin/env python3
"""Device-native dense k=9..12 A/B (VERDICT r3 #5 follow-up): can a
device-resident 4^k histogram beat the hybrid's per-batch readback?

The hybrid (pipeline/count.py dense_hybrid) runs the grouped device
step and accumulates the dense table on the HOST (np.add.at), paying
~5 B/lane D2H per batch (u32 key + i8 count).  A device-side
scatter-add would drop per-batch D2H to zero (one 4^k readback per
corpus) — but TPU scatter has a reputation for being ~100x off.  This
measures it honestly, alternated in-process with per-variant re-warm:

  dev-only      the fused grouped step alone (the hybrid's device cost;
                its TOTAL cost adds 5 B/lane / link_GBps).
  fused+scat    fused step + scatter-add of (key, count) runs into a
                donated 4^k i32 hist — unsorted/dup hints off.
  sort+scat1    flat exact sort step + scatter-add of ONES at every
                valid lane (indices_are_sorted=True; min(word, 4^k)
                keeps sentinels OOB and order monotone).
  raw+scat1     extraction only + unsorted scatter-add of ones (the
                naive 'dense histogram' design the r1 VERDICT asked
                about).

Usage: python scripts/dense_scatter_ab.py [k=12]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from kmer_tpu.utils.jaxcache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kmer_tpu.pipeline.count import count_step_sort  # noqa: E402

B, L = 32768, 150
LENGTHS = None
LIMITS = None
K = int(sys.argv[1]) if len(sys.argv) > 1 else 12
REPS = int(os.environ.get("AB_REPS", "4"))
ITERS = int(os.environ.get("AB_ITERS", "400"))
WARMUP = int(os.environ.get("AB_WARMUP", "150"))
REWARM = int(os.environ.get("AB_REWARM", "150"))
NBINS = 4 ** K


def make_variants():
    from kmer_tpu.ops.canonical import canonical_kmer_lanes
    lengths, limits = LENGTHS, LIMITS

    @jax.jit
    def dev_only(codes, hist):
        std, is_start, counts = count_step_sort(
            codes, lengths, limits, k=K, canonical=True, group_keys=256)
        # fold a cheap dependency into hist so every variant carries
        # the same donated-chain structure
        return hist.at[0].add(counts.reshape(-1)[0].astype(jnp.int32))

    @jax.jit
    def fused_scat(codes, hist):
        std, is_start, counts = count_step_sort(
            codes, lengths, limits, k=K, canonical=True, group_keys=256)
        w = std[-1].reshape(-1)
        c = counts.reshape(-1).astype(jnp.int32)
        idx = jnp.minimum(w, NBINS).astype(jnp.int32)
        return hist.at[idx].add(jnp.where(c > 0, c, 0), mode="drop")

    @jax.jit
    def sort_scat1(codes, hist):
        std, is_start, counts = count_step_sort(
            codes, lengths, limits, k=K, canonical=True, group_keys=0)
        w = std[-1].reshape(-1)
        idx = jnp.minimum(w, NBINS).astype(jnp.int32)
        ones = jnp.where(idx < NBINS, jnp.int32(1), 0)
        return hist.at[idx].add(ones, mode="drop",
                                indices_are_sorted=True)

    @jax.jit
    def raw_scat1(codes, hist):
        words, valid = canonical_kmer_lanes(codes, lengths, K)
        w = words[-1].reshape(-1)
        idx = jnp.where(valid.reshape(-1), w, NBINS).astype(jnp.int32)
        ones = jnp.where(idx < NBINS, jnp.int32(1), 0)
        return hist.at[idx].add(ones, mode="drop")

    return [("dev-only  ", dev_only), ("fused+scat", fused_scat),
            ("sort+scat1", sort_scat1), ("raw+scat1 ", raw_scat1)]


def time_block(step, codes, hist, iters):
    if iters <= 0:
        return 0.0, hist
    t0 = time.perf_counter()
    for _ in range(iters):
        hist = step(codes, hist)
    _ = np.asarray(hist[:4])
    return (time.perf_counter() - t0) / iters, hist


def main():
    print(f"device={jax.devices()[0]} B={B} L={L} k={K} bins={NBINS}",
          flush=True)
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, (B, L), dtype=np.uint8))
    global LENGTHS, LIMITS
    LENGTHS = jnp.full((B,), L, jnp.int32)
    LIMITS = jnp.full((B,), L, jnp.int32)
    N = B * (L - K + 1)

    variants = make_variants()

    # correctness: one step of each scatter variant == host np.add.at
    # of the device step's runs
    std, is_start, counts = jax.jit(
        lambda c: count_step_sort(c, LENGTHS, LIMITS, k=K, canonical=True,
                                  group_keys=256))(codes)
    oracle = np.zeros(NBINS, np.int64)
    c = np.asarray(counts).reshape(-1)
    w = np.asarray(std[-1]).reshape(-1)
    sel = c > 0
    np.add.at(oracle, w[sel], c[sel])
    for name, step in variants[1:]:
        hist = jnp.zeros(NBINS, jnp.int32)
        got = np.asarray(step(codes, hist)).astype(np.int64)
        ok = bool(np.array_equal(got, oracle))
        print(f"{name}: correctness {'OK' if ok else 'MISMATCH'}",
              flush=True)
        assert ok, name

    steps = []
    hists = {}
    for name, step in variants:
        hists[name] = jnp.zeros(NBINS, jnp.int32)
        t0 = time.perf_counter()
        hists[name] = step(codes, hists[name])
        _ = np.asarray(hists[name][:4])
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        _, hists[name] = time_block(step, codes, hists[name], WARMUP)
        steps.append((name, step))

    best = {}
    for r in range(REPS):
        for name, step in steps:
            _, hists[name] = time_block(step, codes, hists[name], REWARM)
            dt, hists[name] = time_block(step, codes, hists[name], ITERS)
            best[name] = min(best.get(name, 1e9), dt)
            print(f"rep{r} {name} {dt*1e3:8.3f} ms", flush=True)

    print("--- MIN over reps ---", flush=True)
    base = best["dev-only  "]
    for name, _ in steps:
        dt = best[name]
        extra_ns = (dt - base) / N * 1e9
        print(f"{name} {dt*1e3:8.3f} ms  {N/dt/1e9:6.2f} B lanes/s  "
              f"scatter-extra {extra_ns:+6.2f} ns/lane", flush=True)
    # the hybrid's per-batch D2H is ~5 B/lane (u32 key + i8 count);
    # device scatter wins whenever extra_ns < 5 / link_GBps
    for name in ("fused+scat", "sort+scat1"):
        extra = (best[name] - base) / N
        if extra > 0:
            cross = 5.0 / (extra * 1e9)
            print(f"{name}: beats hybrid readback below "
                  f"{cross:.2f} GB/s D2H", flush=True)
        else:
            print(f"{name}: beats hybrid readback at ANY link speed",
                  flush=True)


if __name__ == "__main__":
    main()
