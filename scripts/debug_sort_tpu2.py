#!/usr/bin/env python3
"""TPU probe: pallas sort with raised scoped-vmem limit, larger chunks,
pipelined timing; compare against lax.sort pipelined."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from kmer_tpu.utils.jaxcache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from kmer_tpu.ops.pallas import sort as ps  # noqa: E402

N = 1 << 20
OPTS = {"xla_tpu_scoped_vmem_limit_kib": "65536"}


def timeit(name, fn, *args, iters=30):
    try:
        jax.block_until_ready(fn(*args))
    except Exception as e:
        print(f"{name:26s} FAILED: {str(e)[:200]}", flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    piped = (time.perf_counter() - t0) / iters
    print(f"{name:26s} pipelined {piped*1e3:8.3f} ms", flush=True)
    return out


def main():
    print(f"device={jax.devices()[0]} N={N}", flush=True)
    rng = np.random.default_rng(0)
    hi = jnp.asarray(rng.integers(0, 2**11, N, dtype=np.uint32))
    lo = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
    ref = np.sort(np.asarray(hi).astype(np.uint64) << 32 | np.asarray(lo))

    def check(out, name):
        if out is None:
            return
        k = np.asarray(out[0]).astype(np.uint64) << 32 | np.asarray(out[1])
        print(f"  {name} correct: {bool((k == ref).all())}", flush=True)

    out = timeit("lax.sort 2key", jax.jit(
        lambda a, b: list(lax.sort((a, b), num_keys=2))), hi, lo)
    check(out, "lax")

    for ce in (16, 17, 18, 20):
        name = f"pallas 2^{ce} vmem64M"
        f = jax.jit(lambda a, b, c=1 << ce:
                    ps.sort_words_pallas([a, b], chunk=c),
                    compiler_options=OPTS)
        out = timeit(name, f, hi, lo)
        check(out, name)


if __name__ == "__main__":
    main()
