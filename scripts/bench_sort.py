#!/usr/bin/env python3
"""Microbenchmark: lax.sort vs the Pallas VMEM-resident bitonic sort.

Usage: python scripts/bench_sort.py [N] [W] [chunk_exp ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from kmer_tpu.utils.jaxcache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from kmer_tpu.ops.pallas.sort import sort_words_pallas  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8192 * 130
W = int(sys.argv[2]) if len(sys.argv) > 2 else 2
CHUNK_EXPS = [int(a) for a in sys.argv[3:]] or [17, 18, 19]
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
    print(f"{name:24s} {dt * 1e3:9.3f} ms   (compile {compile_s:.1f}s)",
          flush=True)
    return out


def main():
    print(f"device={jax.devices()[0]} N={N} W={W}")
    rng = np.random.default_rng(0)
    words = [jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
             for _ in range(W)]
    if W == 2:   # realistic k=21 keys: hi word has 11 significant bits
        words[0] = words[0] >> jnp.uint32(21)

    ref = timeit("lax.sort", jax.jit(
        lambda ws: list(lax.sort(tuple(ws), num_keys=W))), words)

    for ce in CHUNK_EXPS:
        got = timeit(f"pallas chunk=2^{ce}", jax.jit(
            lambda ws, c=1 << ce: sort_words_pallas(ws, chunk=c)), words)
        for g, r in zip(got, ref):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(r))
    print("correctness: pallas == lax.sort on all chunk sizes")


if __name__ == "__main__":
    main()
