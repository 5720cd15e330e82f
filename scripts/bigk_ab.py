#!/usr/bin/env python3
"""A/B at multi-word k (33..63): fused kernel with MXU extraction vs
the current default XLA extract + grouped-dedup path.  Alternated
within one process (REPS rounds) to defeat the session's thermal /
positional noise; report per-variant MIN (docs/DESIGN.md methodology:
chained non-foldable feedback + host readback).

Usage: python scripts/bigk_ab.py [k ...]   (default: 33 45 63)
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

from kmer_tpu.ops.pallas.fused_extract import (  # noqa: E402
    fused_extract_count_T, mxu_fits)
from kmer_tpu.pipeline.count import count_step_sort  # noqa: E402

B, L = 32768, 150
KS = [int(a) for a in sys.argv[1:]] or [33, 45, 63]
REPS = int(os.environ.get("AB_REPS", "3"))
ITERS = int(os.environ.get("AB_ITERS", "1600"))
WARMUP = int(os.environ.get("AB_WARMUP", "150"))


def time_block(step, s, iters):
    t0 = time.perf_counter()
    for _ in range(iters):
        s = step(s)
    _ = np.asarray(s[0, :4])
    return (time.perf_counter() - t0) / iters, s


def main():
    print(f"device={jax.devices()[0]} B={B} L={L} reps={REPS}", flush=True)
    rng = np.random.default_rng(0)
    codes0 = jnp.asarray(rng.integers(0, 4, (L, B), dtype=np.uint8))
    lengths = jnp.full((B,), L, jnp.int32)
    limits = jnp.full((B,), L, jnp.int32)

    for k in KS:
        N = B * (L - k + 1)
        if not mxu_fits(k, L, True, False):
            print(f"k={k}: mxu does not fit, skipping", flush=True)
            continue

        @jax.jit
        def step_mxu(codes, _k=k):
            ws, counts = fused_extract_count_T(
                codes, lengths, limits, _k, canonical=True,
                seg=4, block_lanes=256, algo="dedup", extract="mxu")
            inj = (counts[:B].astype(jnp.uint32) % 4).astype(jnp.uint8)
            return codes.at[0, :].set(inj)

        @jax.jit
        def step_default(codes, _k=k):
            # codes arrive (L, B); the row-layout path wants (B, L)
            s, is_start, counts = count_step_sort(
                codes.T, lengths, limits, k=_k, canonical=True,
                group_keys=256)
            inj = (counts[:B].astype(jnp.uint32) % 4).astype(jnp.uint8)
            return codes.at[0, :].set(inj)

        variants = [("mxu-fused", step_mxu), ("xla-default", step_default)]
        best = {}
        s = codes0
        for name, step in variants:      # compile + promote
            t0 = time.perf_counter()
            s = step(s)
            _ = np.asarray(s[0, :4])
            print(f"k={k} {name}: compile+first "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
            dt, s = time_block(step, s, WARMUP)
        for r in range(REPS):
            for name, step in variants:
                dt, s = time_block(step, s, ITERS)
                best[name] = min(best.get(name, 1e9), dt)
                print(f"k={k} rep{r} {name:12s} {dt*1e3:8.3f} ms/iter  "
                      f"{N/dt/1e9:6.2f} B kmers/s", flush=True)
        a, b = (best[n] for n, _ in variants)
        print(f"k={k} BEST mxu-fused {a*1e3:.3f} ms vs xla {b*1e3:.3f} ms "
              f"-> {'MXU WINS' if a < b else 'xla wins'} "
              f"({b/a:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
