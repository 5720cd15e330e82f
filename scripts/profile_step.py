#!/usr/bin/env python3
"""Breakdown profiling of the single-chip count step (SURVEY.md §5.1).

Times each stage of count_step_sort separately on the attached device:
  extract        canonical k-mer lane extraction only
  sort           lexicographic 2-word sort only
  run_lengths    run boundaries + counts only (on pre-sorted data)
  full           the fused production step

Usage: python scripts/profile_step.py [k] [B] [L]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from kmer_tpu.utils.jaxcache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from functools import partial  # noqa: E402

from kmer_tpu.ops import count as count_ops  # noqa: E402
from kmer_tpu.ops.canonical import canonical_kmer_lanes  # noqa: E402
from kmer_tpu.pipeline.count import count_step_sort  # noqa: E402

K = int(sys.argv[1]) if len(sys.argv) > 1 else 21
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
L = int(sys.argv[3]) if len(sys.argv) > 3 else 150
ITERS = 20


def timeit(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    for _ in range(3):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:14s} {dt * 1e3:8.3f} ms/step   (compile {compile_s:.1f}s)")
    return out, dt


def main():
    print(f"device={jax.devices()[0]} k={K} B={B} L={L} "
          f"keys={B * (L - K + 1)}")
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, (B, L), dtype=np.uint8))
    lengths = jnp.full((B,), L, jnp.int32)
    limits = jnp.full((B,), L, jnp.int32)

    extract = jax.jit(partial(
        lambda c, le, li: canonical_kmer_lanes(c, le, K, limits=li)[0]))
    words, _ = timeit("extract", extract, codes, lengths, limits)

    sort = jax.jit(lambda ws: count_ops.sort_words(ws))
    s, _ = timeit("sort", sort, words)

    rl = jax.jit(lambda ws: count_ops.run_lengths(ws))
    timeit("run_lengths", rl, s)

    step = lambda c, le, li: count_step_sort(c, le, li, k=K, canonical=True)
    timeit("full", step, codes, lengths, limits)


if __name__ == "__main__":
    main()
