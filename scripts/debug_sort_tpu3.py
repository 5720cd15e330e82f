#!/usr/bin/env python3
"""TPU probe: narrower key operands for lax.sort.

  u32+u32 (current k=21 layout)  vs  u16+u32  vs  u8+u32  vs single u32
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
    try:
        jax.block_until_ready(fn(*args))
    except Exception as e:
        print(f"{name:22s} FAILED: {str(e)[:160]}", flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:22s} pipelined {(time.perf_counter()-t0)/iters*1e3:8.3f} ms",
          flush=True)
    return out


def main():
    print(f"device={jax.devices()[0]} N={N}", flush=True)
    rng = np.random.default_rng(0)
    hi = rng.integers(0, 2**11, N, dtype=np.uint32)
    lo = rng.integers(0, 2**32, N, dtype=np.uint32)
    ref = np.sort(hi.astype(np.uint64) << 32 | lo)

    def srt(*ws):
        return jax.jit(lambda *a: list(lax.sort(a, num_keys=len(a))))(*ws)

    out = timeit("u32+u32", srt, jnp.asarray(hi), jnp.asarray(lo))
    if out:
        k = np.asarray(out[0]).astype(np.uint64) << 32 | np.asarray(out[1])
        print("  correct:", bool((k == ref).all()), flush=True)

    out = timeit("u16+u32", srt, jnp.asarray(hi.astype(np.uint16)),
                 jnp.asarray(lo))
    if out:
        k = np.asarray(out[0]).astype(np.uint64) << 32 | np.asarray(out[1])
        print("  correct:", bool((k == ref).all()), flush=True)

    timeit("u8+u32", srt, jnp.asarray((hi >> 3).astype(np.uint8)),
           jnp.asarray(lo))
    timeit("single u32", srt, jnp.asarray(lo))
    timeit("single u32 +payload", srt, jnp.asarray(lo))  # warm again

    # payload variant: 1 key + 1 payload (num_keys=1)
    f = jax.jit(lambda a, b: list(lax.sort((a, b), num_keys=1)))
    timeit("u32 key + u32 payload", f, jnp.asarray(lo), jnp.asarray(hi))


if __name__ == "__main__":
    main()
