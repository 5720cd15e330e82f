#!/usr/bin/env python3
"""Second-pass TPU profiling: updated pipeline + alternates.

Times (per-iter blocked):
  extract          canonical k=21 lanes
  sort flat        lax.sort on pre-flattened words
  sort 2d->flat    lax.sort incl. the (B,P) flatten relayout
  run_lengths      scan-based version
  full             count_step_sort (current production step)
  dense scatter    k=8 hist via XLA scatter-add
  dense mxu        k=8 hist via Pallas one-hot matmul
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
from kmer_tpu.ops.extract import kmer_lanes  # noqa: E402
from kmer_tpu.pipeline.count import count_step_sort  # noqa: E402

K, B, L = 21, 8192, 150


def timeit(name, fn, *args, iters=10):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    c = time.perf_counter() - t0
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:18s} min {min(ts)*1e3:8.3f} ms  med {sorted(ts)[len(ts)//2]*1e3:8.3f} ms  (compile {c:.1f}s)", flush=True)


def main():
    print(f"device={jax.devices()[0]} k={K} B={B} L={L} keys={B*(L-K+1)}",
          flush=True)
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, (B, L), dtype=np.uint8))
    lengths = jnp.full((B,), L, jnp.int32)
    limits = jnp.full((B,), L, jnp.int32)

    extract = jax.jit(
        lambda c, le, li: canonical_kmer_lanes(c, le, K, limits=li)[0])
    timeit("extract", extract, codes, lengths, limits)
    words2d = extract(codes, lengths, limits)
    flat = [jnp.asarray(np.asarray(w).reshape(-1)) for w in words2d]

    timeit("sort flat", jax.jit(
        lambda ws: count_ops.sort_words(ws, backend="xla")), flat)
    timeit("sort 2d->flat", jax.jit(
        lambda ws: count_ops.sort_words(ws, backend="xla")), words2d)

    s = jax.jit(lambda ws: count_ops.sort_words(ws, backend="xla"))(flat)
    timeit("run_lengths", jax.jit(count_ops.run_lengths), s)

    timeit("full", jax.jit(partial(
        lambda c, le, li: count_step_sort(c, le, li, k=K, canonical=True))),
        codes, lengths, limits)

    # dense k=8 comparisons
    k8 = 8
    w8, v8 = jax.jit(lambda c, le, li: kmer_lanes(c, le, k8, limits=li))(
        codes, lengths, limits)
    idx = w8[-1]
    timeit("dense scatter", jax.jit(
        lambda w, v: count_ops.dense_histogram(w, v, k8, backend="xla")),
        idx, v8)
    timeit("dense mxu", jax.jit(
        lambda w, v: count_ops.dense_histogram(w, v, k8, backend="pallas")),
        idx, v8)
    a = np.asarray(jax.jit(lambda w, v: count_ops.dense_histogram(
        w, v, k8, backend="xla"))(idx, v8))
    b = np.asarray(jax.jit(lambda w, v: count_ops.dense_histogram(
        w, v, k8, backend="pallas"))(idx, v8))
    print("dense mxu correct:", bool((a == b).all()), flush=True)


if __name__ == "__main__":
    main()
