#!/usr/bin/env python3
"""Benchmark: canonical k=21 counting throughput per chip (north-star
metric, BASELINE.json).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "kmers/s", "vs_baseline": R}

vs_baseline compares against the only measurable reference number
(BASELINE.md): the semantics-exact oracle of the reference pipeline runs
at ~0.40 M chunks/s on this host's CPU (the committed Rust binary is a
macOS Mach-O and cannot run here; the reference publishes no numbers).

Extra diagnostics go to stderr; stdout carries exactly the JSON line.
"""

import json
import sys
import time

import numpy as np

BASELINE_KMERS_PER_SEC = 0.40e6   # BASELINE.md: oracle extract+sort rate

K = 21
CANONICAL = True
B = 16384         # reads per batch (swept: 4k=241M/s, 8k=294, 16k=312, 32k=308)
L = 150           # read length (BASELINE.json config 2 shape)
WARMUP = 3
ITERS = 20


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from kmer_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from kmer_tpu.pipeline.count import count_step_sort

    dev = jax.devices()[0]
    log(f"device: {dev} backend={jax.default_backend()}")

    rng = np.random.default_rng(0)
    n_batches = 4
    batches = []
    for i in range(n_batches):
        codes = jnp.asarray(rng.integers(0, 4, (B, L), dtype=np.uint8))
        lengths = jnp.full((B,), L, jnp.int32)
        limits = jnp.full((B,), L, jnp.int32)
        batches.append((codes, lengths, limits))
    jax.block_until_ready(batches)

    kmers_per_batch = B * (L - K + 1)

    def step(i):
        c, le, li = batches[i % n_batches]
        return count_step_sort(c, le, li, k=K, canonical=CANONICAL)

    t0 = time.perf_counter()
    jax.block_until_ready(step(0))
    log(f"first step (incl. compile): {time.perf_counter() - t0:.2f}s")

    for i in range(WARMUP):
        jax.block_until_ready(step(i))

    t0 = time.perf_counter()
    for i in range(ITERS):
        out = step(i)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    kmers_per_sec = kmers_per_batch * ITERS / dt
    log(f"{ITERS} steps x {kmers_per_batch} kmers in {dt:.3f}s "
        f"({dt / ITERS * 1e3:.1f} ms/step)")

    from kmer_tpu.ops.encode import words_per_key
    from kmer_tpu.utils.profiling import Roofline
    rl = Roofline.for_sort_step(B, L, K, words_per_key(K))
    log(f"HBM roofline fraction: {rl.fraction(dt / ITERS):.3f} "
        f"(speed-of-light step {rl.seconds_at_roofline() * 1e6:.0f} us)")

    print(json.dumps({
        "metric": f"canonical k={K} count throughput (1 chip, sort mode)",
        "value": round(kmers_per_sec),
        "unit": "kmers/s",
        "vs_baseline": round(kmers_per_sec / BASELINE_KMERS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
