#!/usr/bin/env python3
"""VERDICT r4 #1: adjudicate the BENCH_r04 secondary-metric regressions.

BENCH_r04 read k=31 16.3 B (r3: 23.7), k=45 10.4 B (r3: 20.0), gapped
13.9 B chunks/s (r3: 33.8) — while quiet-phase DESIGN numbers claim ~2x
better.  Either the r4 default flips regressed (i8 count plane; bl
256->512; mxus shared-band extraction for k>=33) or the r4 bench
sampled a slow interference phase.  This harness alternates the r3 and
r4 defaults — plus single-knob partials — within ONE process at the
EXACT bench kernel shapes, with per-variant re-warm before every timed
block (memory/tpu-bench-methodology), so all variants sample the same
phases and the knobs are separable.

Usage: python scripts/r5_regression_ab.py [k31|k45|gapped|all]
Prints one JSON line per metric with per-variant window lists.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from kmer_tpu.utils.jaxcache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kmer_tpu.ops.pallas.fused_extract import fused_extract_count_T  # noqa: E402
from kmer_tpu.ops.pallas.fused_gapped import fused_gapped_count_T  # noqa: E402

B, L = 32768, 150          # bench headline shape (contiguous)
BG = 2048                  # bench gapped shape
REPS = int(os.environ.get("AB_REPS", "6"))
ITERS = int(os.environ.get("AB_ITERS", "1600"))
WARMUP = int(os.environ.get("AB_WARMUP", "150"))
REWARM = int(os.environ.get("AB_REWARM", "150"))


def log(m):
    print(m, file=sys.stderr, flush=True)


def time_block(step, s, iters):
    if iters <= 0:
        return 0.0, s
    t0 = time.perf_counter()
    for _ in range(iters):
        s = step(s)
    _ = np.asarray(s[0, :4])
    return (time.perf_counter() - t0) / iters, s


def run_metric(name, variants, s, lanes_per_step):
    """variants: list of (label, build) where build() -> step fn with
    the variant's env already applied at TRACE time."""
    steps = []
    for label, build in variants:
        step = build()
        t0 = time.perf_counter()
        s = step(s)
        _ = np.asarray(s[0, :4])
        log(f"{name}/{label}: compile+first {time.perf_counter()-t0:.1f}s")
        _, s = time_block(step, s, WARMUP)
        steps.append((label, step))
    windows = {label: [] for label, _ in steps}
    for r in range(REPS):
        for label, step in steps:
            _, s = time_block(step, s, REWARM)
            dt, s = time_block(step, s, ITERS)
            windows[label].append(dt)
            log(f"{name} rep{r} {label:24s} {dt*1e3:7.3f} ms")
    out = {"metric": name, "iters": ITERS, "reps": REPS, "variants": {}}
    for label, _ in steps:
        w = sorted(windows[label])
        out["variants"][label] = {
            "windows_ms": [round(x * 1e3, 4) for x in windows[label]],
            "best_ms": round(w[0] * 1e3, 4),
            "median_ms": round(w[len(w) // 2] * 1e3, 4),
            "best_rate_B": round(lanes_per_step / w[0] / 1e9, 2),
        }
    print(json.dumps(out), flush=True)
    return out


def env_traced(envs):
    """Build a jitted step fn with `envs` applied during TRACING (the
    kernels read these knobs at trace time), restored afterwards."""
    def deco(make_step):
        def build():
            saved = {k: os.environ.get(k) for k in envs}
            os.environ.update(envs)
            try:
                return make_step()
            finally:
                for k, v in saved.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v
        return build
    return deco


def contiguous_metric(K, variants_spec):
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.integers(0, 4, (L, B), dtype=np.uint8))
    lengths = jnp.full((B,), L, jnp.int32)
    limits = jnp.full((B,), L, jnp.int32)

    def make(cnt, bl, extract):
        @env_traced({"KMER_TPU_COUNTS_DTYPE": cnt})
        def build():
            @jax.jit
            def step(codes):
                ws, counts = fused_extract_count_T(
                    codes, lengths, limits, K, canonical=True,
                    seg=2, block_lanes=bl, algo="dedup", extract=extract)
                inj = (counts[:B].astype(jnp.uint32) % 4).astype(jnp.uint8)
                return codes.at[0, :].set(inj)
            return step
        return build

    variants = [(label, make(*spec)) for label, spec in variants_spec]
    return run_metric(f"k{K}", variants, s, B * (L - K + 1))


def gapped_metric():
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.integers(0, 4, (L, BG), dtype=np.uint8))
    lengths = jnp.full((BG,), L, jnp.int32)
    limits = jnp.full((BG,), L, jnp.int32)
    chunks = BG * sum(L - c + 1 for c in range(80, 141))

    def make(cnt):
        @env_traced({"KMER_TPU_COUNTS_DTYPE": cnt})
        def build():
            @jax.jit
            def step(codes):
                rflat, counts = fused_gapped_count_T(
                    codes, lengths, limits, l_len=27, r_len=27,
                    c_min=80, c_max=140)
                inj = (counts[:BG].astype(jnp.uint32) % 4).astype(jnp.uint8)
                return codes.at[0, :].set(inj)
            return step
        return build

    variants = [("r3:i32", make("i32")), ("r4:i8", make("i8"))]
    return run_metric("gapped", variants, s, chunks)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    log(f"device={jax.devices()[0]} B={B} L={L} reps={REPS} iters={ITERS}")
    if which in ("k31", "all"):
        contiguous_metric(31, [
            ("r3:i32+bl256", ("i32", 256, "mxu")),
            ("i8+bl256", ("i8", 256, "mxu")),
            ("i32+bl512", ("i32", 512, "mxu")),
            ("r4:i8+bl512", ("i8", 512, "mxu")),
        ])
    if which in ("k45", "all"):
        contiguous_metric(45, [
            ("r3:i32+bl256+mxu", ("i32", 256, "mxu")),
            ("i8+bl512+mxu", ("i8", 512, "mxu")),
            ("i32+bl256+mxus", ("i32", 256, "mxus")),
            ("r4:i8+bl512+mxus", ("i8", 512, "mxus")),
        ])
    if which in ("gapped", "all"):
        gapped_metric()


if __name__ == "__main__":
    main()
