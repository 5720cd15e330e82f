#!/usr/bin/env python3
"""Gapped fused-kernel tile sweep (alternated, per-variant re-warm —
memory/tpu-bench-methodology).  Usage: python scripts/gapped_bl_ab.py"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from kmer_tpu.utils.jaxcache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kmer_tpu.ops.pallas.fused_gapped import fused_gapped_count_T  # noqa: E402

B, L = 2048, 150
REPS = int(os.environ.get("AB_REPS", "6"))
ITERS = int(os.environ.get("AB_ITERS", "1600"))
WARMUP = int(os.environ.get("AB_WARMUP", "150"))
REWARM = int(os.environ.get("AB_REWARM", "150"))

VARIANTS = [256]
# bl512 does NOT fit: the gapped kernel's T_pad (all 61 chunk sizes)
# x 512-lane output planes exceed v5e VMEM (measured: 133.6M of
# 128M, XLA compile OOM) — 256 is the gapped tile cap.


def time_block(step, s, iters):
    if iters <= 0:                  # AB_REWARM=0 disables re-warm
        return 0.0, s
    t0 = time.perf_counter()
    for _ in range(iters):
        s = step(s)
    _ = np.asarray(s[0, :4])
    return (time.perf_counter() - t0) / iters, s


def main():
    print(f"device={jax.devices()[0]} B={B} L={L}", flush=True)
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.integers(0, 4, (L, B), dtype=np.uint8))
    lengths = jnp.full((B,), L, jnp.int32)
    limits = jnp.full((B,), L, jnp.int32)
    N = B * sum(L - c + 1 for c in range(80, 141))

    steps = []
    for bl in VARIANTS:
        @jax.jit
        def step(codes, _b=bl):
            ws, counts = fused_gapped_count_T(
                codes, lengths, limits, l_len=27, r_len=27,
                c_min=80, c_max=140, block_lanes=_b)
            inj = (counts[:B].astype(jnp.uint32) % 4).astype(jnp.uint8)
            return codes.at[0, :].set(inj)

        t0 = time.perf_counter()
        s = step(s)
        _ = np.asarray(s[0, :4])
        print(f"bl{bl}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        _, s = time_block(step, s, WARMUP)
        steps.append((f"bl{bl}", step))

    best = {}
    for r in range(REPS):
        for name, step in steps:
            _, s = time_block(step, s, REWARM)
            dt, s = time_block(step, s, ITERS)
            best[name] = min(best.get(name, 1e9), dt)
            print(f"rep{r} {name:8s} {dt*1e3:8.3f} ms  "
                  f"{N/dt/1e9:6.2f} B chunks/s", flush=True)
    print("--- MIN over reps ---", flush=True)
    for name, _ in steps:
        dt = best[name]
        print(f"{name:8s} {dt*1e3:8.3f} ms  {N/dt/1e9:6.2f} B chunks/s",
              flush=True)


if __name__ == "__main__":
    main()
