#!/usr/bin/env python3
"""Noise-proof fused-step variant sweep: all variants alternate within
ONE process, REPS rounds, report per-variant MIN (the session's
thermal/positional noise is 2x on identical configs — sequential
same-config runs are meaningless; see docs/DESIGN.md round 3).

Variants: (extract, seg, block_lanes, counts_dtype).
Usage: python scripts/fused_sweep.py [k]   (default 21)
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

from kmer_tpu.ops.pallas.fused_extract import fused_extract_count_T  # noqa: E402

B, L = 32768, 150
K = int(sys.argv[1]) if len(sys.argv) > 1 else 21
REPS = int(os.environ.get("AB_REPS", "3"))
# BIG timed blocks: a block costs s*N + C with C ~ 15-40 ms fixed
# (pipeline fill + readback RTT); N=1600 bounds the inflation at ~8%
# (docs/DESIGN.md r3 "Measurement corrections")
ITERS = int(os.environ.get("AB_ITERS", "1600"))
WARMUP = int(os.environ.get("AB_WARMUP", "150"))
# per-variant re-warm before EVERY timed block: an executable
# loses its promoted state while other variants run, and the
# first ~150 executions of a block then read slow — this was a
# systematic first-position bias in r4 sweeps (the first variant
# of the rep loop lost ~0.03-0.05 ms of min consistently)
REWARM = int(os.environ.get("AB_REWARM", "150"))

VARIANTS = [
    # (name, extract, seg, bl, cnt_dtype) — r4 matrix: the all-integer
    # s8 MXU extraction vs the f32 one, i8 vs i32 count planes, tile
    # sizes (VERDICT r3 #1a/b/c)
    ("mxu      s2 bl256 i8",  "mxu",      2, 256, "i8"),
    ("mxu      s2 bl512 i8",  "mxu",      2, 512, "i8"),
    ("mxu      s2 bl1024 i8", "mxu",      2, 1024, "i8"),
    ("mxus     s2 bl512 i8",  "mxus",     2, 512, "i8"),
    ("mxus     s2 bl1024 i8", "mxus",     2, 1024, "i8"),
]


def time_block(step, s, iters):
    if iters <= 0:                  # AB_REWARM=0 disables re-warm
        return 0.0, s
    t0 = time.perf_counter()
    for _ in range(iters):
        s = step(s)
    _ = np.asarray(s[0, :4])
    return (time.perf_counter() - t0) / iters, s


def main():
    print(f"device={jax.devices()[0]} B={B} L={L} k={K} reps={REPS}",
          flush=True)
    rng = np.random.default_rng(0)
    codes0 = jnp.asarray(rng.integers(0, 4, (L, B), dtype=np.uint8))
    lengths = jnp.full((B,), L, jnp.int32)
    limits = jnp.full((B,), L, jnp.int32)
    N = B * (L - K + 1)

    steps = []
    s = codes0
    for name, ex, seg, bl, cd in VARIANTS:
        if ex == "doubling" and (K > 31 or 2 * K == 32):
            continue

        @jax.jit
        def step(codes, _e=ex, _s=seg, _b=bl):
            ws, counts = fused_extract_count_T(
                codes, lengths, limits, K, canonical=True,
                seg=_s, block_lanes=_b, algo="dedup", extract=_e)
            inj = (counts[:B].astype(jnp.uint32) % 4).astype(jnp.uint8)
            return codes.at[0, :].set(inj)

        os.environ["KMER_TPU_COUNTS_DTYPE"] = cd    # baked at trace
        t0 = time.perf_counter()
        s = step(s)
        _ = np.asarray(s[0, :4])
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        del os.environ["KMER_TPU_COUNTS_DTYPE"]
        _, s = time_block(step, s, WARMUP)
        steps.append((name, step))

    best = {}
    for r in range(REPS):
        for name, step in steps:
            _, s = time_block(step, s, REWARM)      # re-promote, untimed
            dt, s = time_block(step, s, ITERS)
            best[name] = min(best.get(name, 1e9), dt)
            print(f"rep{r} {name:24s} {dt*1e3:8.3f} ms  "
                  f"{N/dt/1e9:6.2f} B kmers/s", flush=True)
    print("--- MIN over reps ---", flush=True)
    for name, _ in steps:
        dt = best[name]
        print(f"{name:24s} {dt*1e3:8.3f} ms  {N/dt/1e9:6.2f} B kmers/s",
              flush=True)


if __name__ == "__main__":
    main()
