#!/usr/bin/env python3
"""TPU debug: lax.sort true cost (per-iter blocking) + pallas sort
compile probes (aliasing on/off, chunk sizes)."""

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


def timeit_blocked(name, fn, *args, iters=10):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    c = time.perf_counter() - t0
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:28s} min {min(ts)*1e3:8.3f} ms  med {sorted(ts)[len(ts)//2]*1e3:8.3f} ms (compile {c:.1f}s)", flush=True)


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    hi = jnp.asarray(rng.integers(0, 2**11, N, dtype=np.uint32))
    lo = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))

    f2 = jax.jit(lambda a, b: lax.sort((a, b), num_keys=2))
    timeit_blocked("lax.sort 2key (blocked)", f2, hi, lo)
    out = f2(hi, lo)
    k = np.asarray(out[0]).astype(np.uint64) << 32 | np.asarray(out[1])
    ref = np.sort(np.asarray(hi).astype(np.uint64) << 32 | np.asarray(lo))
    print("lax.sort correct:", bool((k == ref).all()), flush=True)

    f1 = jax.jit(lambda a: lax.sort((a,), num_keys=1))
    timeit_blocked("lax.sort 1key (blocked)", f1, lo)

    # pallas probes
    from kmer_tpu.ops.pallas import sort as ps
    for chunk_exp in (16, 17):
        try:
            f = jax.jit(lambda a, b, c=1 << chunk_exp:
                        ps.sort_words_pallas([a, b], chunk=c))
            timeit_blocked(f"pallas chunk=2^{chunk_exp}", f, hi, lo)
            out = f(hi, lo)
            k = np.asarray(out[0]).astype(np.uint64) << 32 | np.asarray(out[1])
            print(f"pallas 2^{chunk_exp} correct:", bool((k == ref).all()),
                  flush=True)
        except Exception as e:
            print(f"pallas chunk=2^{chunk_exp} FAILED: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
