#!/usr/bin/env python3
"""Definitive A/B/A sort experiment in ONE process.

A = lax.sort 2 key operands (current production)
B = two-pass stable single-key sort: sort by lo (hi as payload), then
    stable sort by hi (lo as payload) — LSD radix over words.
Each measured 3 times, interleaved, to expose drift.
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

N = 1 << 20


def timeit(name, fn, *args, iters=30):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:30s} pipelined {(time.perf_counter()-t0)/iters*1e3:8.3f} ms",
          flush=True)
    return out


def main():
    print(f"device={jax.devices()[0]} N={N}", flush=True)
    rng = np.random.default_rng(0)
    hi = jnp.asarray(rng.integers(0, 2**11, N, dtype=np.uint32))
    lo = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
    ref = np.sort(np.asarray(hi).astype(np.uint64) << 32 | np.asarray(lo))

    A = jax.jit(lambda a, b: list(lax.sort((a, b), num_keys=2)))

    def two_pass(a, b):
        b2, a2 = lax.sort((b, a), num_keys=1, is_stable=True)
        a3, b3 = lax.sort((a2, b2), num_keys=1, is_stable=True)
        return [a3, b3]

    B = jax.jit(two_pass)

    for r in range(3):
        oa = timeit(f"A 2-key           (round {r})", A, hi, lo)
        ob = timeit(f"B two-pass stable (round {r})", B, hi, lo)
    for name, out in (("A", oa), ("B", ob)):
        k = np.asarray(out[0]).astype(np.uint64) << 32 | np.asarray(out[1])
        print(f"{name} correct: {bool((k == ref).all())}", flush=True)


if __name__ == "__main__":
    main()
