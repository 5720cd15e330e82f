#!/usr/bin/env python3
"""Dispatch-overhead-aware profiling: blocked vs pipelined timings."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from kmer_tpu.utils.jaxcache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kmer_tpu.ops import count as count_ops  # noqa: E402
from kmer_tpu.ops.canonical import canonical_kmer_lanes  # noqa: E402
from kmer_tpu.pipeline.count import count_step_sort  # noqa: E402

K, B, L = 21, 8192, 150


def timeit(name, fn, *args, iters=30):
    jax.block_until_ready(fn(*args))          # compile
    # blocked
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    blocked = min(ts)
    # pipelined
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    piped = (time.perf_counter() - t0) / iters
    print(f"{name:14s} blocked {blocked*1e3:8.3f} ms   pipelined {piped*1e3:8.3f} ms", flush=True)


def main():
    print(f"device={jax.devices()[0]} keys={B*(L-K+1)}", flush=True)
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, (B, L), dtype=np.uint8))
    lengths = jnp.full((B,), L, jnp.int32)
    limits = jnp.full((B,), L, jnp.int32)

    noop = jax.jit(lambda c: c.sum())
    timeit("noop-sum", noop, codes)

    extract = jax.jit(
        lambda c, le, li: canonical_kmer_lanes(c, le, K, limits=li)[0])
    timeit("extract", extract, codes, lengths, limits)
    words2d = extract(codes, lengths, limits)
    flat = [jnp.asarray(np.asarray(w).reshape(-1)) for w in words2d]

    timeit("sort flat", jax.jit(
        lambda ws: count_ops.sort_words(ws, backend="xla")), flat)
    s = jax.jit(lambda ws: count_ops.sort_words(ws, backend="xla"))(flat)
    timeit("run_lengths", jax.jit(count_ops.run_lengths), s)
    timeit("full", jax.jit(
        lambda c, le, li: count_step_sort(c, le, li, k=K, canonical=True)),
        codes, lengths, limits)


if __name__ == "__main__":
    main()
