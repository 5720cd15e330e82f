#!/usr/bin/env python3
"""Trustworthy TPU stage measurements (the ONLY valid methodology on
this attachment — see docs/DESIGN.md "Measurement integrity"):

  * chain a NON-FOLDABLE data dependency through every iteration
    (feeding count bits back into the input defeats both result reuse
    and XLA dead-code elimination);
  * force completion with a host readback of the chain's final value
    (`jax.block_until_ready` does not reliably wait here);
  * self-validate: warmup wall time must match steady per-step x count.

Measures: the full count step, the sort alone, and run_lengths alone.

Usage: python scripts/measure.py [B] [L] [k]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from kmer_tpu.utils.jaxcache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kmer_tpu.ops import count as count_ops  # noqa: E402
from kmer_tpu.pipeline.count import count_step_sort  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
L = int(sys.argv[2]) if len(sys.argv) > 2 else 150
K = int(sys.argv[3]) if len(sys.argv) > 3 else 21


def run_chained(name, step, state0, force, per_iter_items, iters=200,
                warmup=30):
    t0 = time.perf_counter()
    s = step(state0)
    _ = force(s)
    print(f"{name}: compile+first {time.perf_counter() - t0:.0f}s",
          flush=True)
    for _ in range(warmup):
        s = step(s)
    _ = force(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = step(s)
    _ = force(s)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:16s} {dt*1e3:8.3f} ms/iter  "
          f"{per_iter_items/dt/1e6:8.1f} M items/s", flush=True)
    return dt


def main():
    print(f"device={jax.devices()[0]} B={B} L={L} k={K}", flush=True)
    rng = np.random.default_rng(0)
    codes0 = jnp.asarray(rng.integers(0, 4, (B, L), dtype=np.uint8))
    lengths = jnp.full((B,), L, jnp.int32)
    limits = jnp.full((B,), L, jnp.int32)
    N = B * (L - K + 1)

    @jax.jit
    def full_step(codes):
        s, is_start, counts = count_step_sort(codes, lengths, limits,
                                              k=K, canonical=True,
                                              group_keys=256)
        return codes.at[0, :].set((counts[:L] % 4).astype(jnp.uint8))

    run_chained("full step", full_step, codes0,
                lambda c: np.asarray(c[0, :4]), N)

    # sort alone: rolled feedback keeps it unsorted every iteration
    hi0 = jnp.asarray(rng.integers(0, 2 ** 11, N, dtype=np.uint32))
    lo0 = jnp.asarray(rng.integers(0, 2 ** 32, N, dtype=np.uint32))

    @jax.jit
    def sort_step(hl):
        # backend honors KMER_TPU_SORT (auto|xla|pallas) for A/B runs
        hi, lo = hl
        out = count_ops.sort_words([jnp.roll(lo, 1), hi])
        return out[0], out[1]

    run_chained("sort 2-word", sort_step, (hi0, lo0),
                lambda s: np.asarray(s[0][:4]), N)

    @jax.jit
    def rl_step(hl):
        hi, lo = hl
        is_start, counts = count_ops.run_lengths([hi, lo])
        # non-foldable feedback
        return hi.at[0].set((counts[1] % 2048).astype(jnp.uint32)), lo

    s = sort_step((hi0, lo0))
    run_chained("run_lengths", rl_step, s,
                lambda x: np.asarray(x[0][:4]), N)


if __name__ == "__main__":
    main()
