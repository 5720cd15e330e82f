#!/usr/bin/env python3
"""VPU-floor microbenchmark (VERDICT r3 #1 deliverable): decompose the
fused count step into its irreducible parts and measure each, alternated
within ONE process (min over reps — see memory/tpu-bench-methodology).

Stages, k=21 canonical unless noted:
  copy+raw    NO extraction, NO collapse: read the code tile, write W
              pseudo-key planes (raw code slices) + the count plane,
              validity test + sentinel select only.  This is the
              infrastructure + traffic floor of the kernel SHAPE — no
              k-mer step can beat it without changing the output
              contract.
  copy+dedup  floor + the all-pairs seg=2 collapse.
  mxu+raw     floor + the real banded-matmul extraction + canonical.
  mxu+dedup   the production step.

The gap between copy+raw and the HBM speed-of-light (codes in +
keys/counts out at measured HBM BW) is the part of the step no
extraction rewrite can recover; DESIGN.md records the numbers.

Usage: python scripts/vpu_floor.py [k] [bl]
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

from kmer_tpu.ops.encode import words_per_key  # noqa: E402
from kmer_tpu.ops.pallas.fused_extract import fused_extract_count_T  # noqa: E402
from kmer_tpu.utils.profiling import Roofline  # noqa: E402

B, L = 32768, 150
K = int(sys.argv[1]) if len(sys.argv) > 1 else 21
BL = int(sys.argv[2]) if len(sys.argv) > 2 else 512
REPS = int(os.environ.get("AB_REPS", "5"))
ITERS = int(os.environ.get("AB_ITERS", "1600"))
WARMUP = int(os.environ.get("AB_WARMUP", "150"))
# per-variant re-warm before EVERY timed block: an executable
# loses its promoted state while other variants run, and the
# first ~150 executions of a block then read slow — this was a
# systematic first-position bias in r4 sweeps (the first variant
# of the rep loop lost ~0.03-0.05 ms of min consistently)
REWARM = int(os.environ.get("AB_REWARM", "150"))

VARIANTS = [
    ("copy+raw   (floor)", "copy", "raw"),
    ("copy+dedup        ", "copy", "dedup"),
    ("mxu +raw          ", "mxu", "raw"),
    ("mxu +dedup (prod) ", "mxu", "dedup"),
    ("mxus+dedup        ", "mxus", "dedup"),
    ("mxu +packed (u16) ", "mxu", "packed"),
]
if os.environ.get("AB_REVERSE"):
    VARIANTS = VARIANTS[::-1]
if os.environ.get("AB_PAIR"):
    # 2-variant paired mode: floor vs prod alternate rapidly, so both
    # sample the same interference phases
    VARIANTS = [("copy+raw   (floor)", "copy", "raw"),
                ("mxu +dedup (prod) ", "mxu", "dedup")]


def time_block(step, s, iters):
    if iters <= 0:                  # AB_REWARM=0 disables re-warm
        return 0.0, s
    t0 = time.perf_counter()
    for _ in range(iters):
        s = step(s)
    _ = np.asarray(s[0, :4])
    return (time.perf_counter() - t0) / iters, s


def main():
    print(f"device={jax.devices()[0]} B={B} L={L} k={K} bl={BL}",
          flush=True)
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.integers(0, 4, (L, B), dtype=np.uint8))
    lengths = jnp.full((B,), L, jnp.int32)
    limits = jnp.full((B,), L, jnp.int32)
    N = B * (L - K + 1)
    W = words_per_key(K)

    steps = []
    for name, ex, algo in VARIANTS:
        @jax.jit
        def step(codes, _e=ex, _a=algo):
            ws, counts = fused_extract_count_T(
                codes, lengths, limits, K, canonical=True,
                seg=2, block_lanes=BL, algo=_a, extract=_e)
            inj = (counts[:B].astype(jnp.uint32) % 4).astype(jnp.uint8)
            return codes.at[0, :].set(inj)

        t0 = time.perf_counter()
        s = step(s)
        _ = np.asarray(s[0, :4])
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        _, s = time_block(step, s, WARMUP)
        steps.append((name, step))

    best = {}
    for r in range(REPS):
        for name, step in steps:
            _, s = time_block(step, s, REWARM)      # re-promote, untimed
            dt, s = time_block(step, s, ITERS)
            best[name] = min(best.get(name, 1e9), dt)
            print(f"rep{r} {name} {dt*1e3:8.3f} ms", flush=True)
    # speed-of-light for the EXACT output bytes (i8 counts)
    rl = Roofline.for_fused_step(B, L, K, W, cnt_bytes=1)
    light = rl.seconds_at_roofline()
    print("--- MIN over reps ---", flush=True)
    for name, _ in steps:
        dt = best[name]
        print(f"{name} {dt*1e3:8.3f} ms  {N/dt/1e9:6.2f} B kmers/s  "
              f"light x{dt/light:4.2f}", flush=True)
    print(f"HBM speed-of-light (codes in + keys/i8 counts out): "
          f"{light*1e6:.0f} us", flush=True)


if __name__ == "__main__":
    main()
