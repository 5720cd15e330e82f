#!/usr/bin/env python3
"""A/B the fused count step's extraction algorithm on the real TPU:
doubling (current default) vs mxu (banded-matmul subwords on the
systolic array).  Methodology per docs/DESIGN.md "Measurement
integrity": chained non-foldable feedback + host readback; same-session
A/B only (thermal band).

Usage: python scripts/mxu_ab.py [k ...]   (default: 21 31)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from kmer_tpu.utils.jaxcache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kmer_tpu.ops.pallas.fused_extract import fused_extract_count_T  # noqa: E402

B, L = 32768, 150
KS = [int(a) for a in sys.argv[1:]] or [21, 31]


def run_chained(name, step, state0, per_iter_items, iters=300, warmup=150):
    t0 = time.perf_counter()
    s = step(state0)
    _ = np.asarray(s[0, :4])
    print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s",
          flush=True)
    for _ in range(warmup):
        s = step(s)
    _ = np.asarray(s[0, :4])
    t0 = time.perf_counter()
    for _ in range(iters):
        s = step(s)
    _ = np.asarray(s[0, :4])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt*1e3:8.3f} ms/iter  "
          f"{per_iter_items/dt/1e9:6.2f} B kmers/s", flush=True)
    return dt


def main():
    print(f"device={jax.devices()[0]} B={B} L={L}", flush=True)
    rng = np.random.default_rng(0)
    codes0 = jnp.asarray(rng.integers(0, 4, (L, B), dtype=np.uint8))
    lengths = jnp.full((B,), L, jnp.int32)
    limits = jnp.full((B,), L, jnp.int32)

    import os
    extracts = os.environ.get("AB_EXTRACTS", "doubling,mxu").split(",")
    bls = [int(x) for x in os.environ.get("AB_BL", "256").split(",")]
    segs = [int(x) for x in os.environ.get("AB_SEG", "4").split(",")]
    for k in KS:
        N = B * (L - k + 1)
        for extract in extracts:
            if extract == "doubling" and (k > 31 or 2 * k == 32):
                continue
            for bl in bls:
                for seg in segs:
                    @jax.jit
                    def step(codes, _e=extract, _k=k, _bl=bl, _s=seg):
                        ws, counts = fused_extract_count_T(
                            codes, lengths, limits, _k, canonical=True,
                            seg=_s, block_lanes=_bl, algo="dedup",
                            extract=_e)
                        inj = (counts[:B].astype(jnp.uint32)
                               % 4).astype(jnp.uint8)
                        return codes.at[0, :].set(inj)

                    run_chained(f"k={k} {extract} bl={bl} s={seg}",
                                step, codes0, N)

    if os.environ.get("AB_GAPPED", "0") == "1":
        from kmer_tpu.ops.pallas.fused_gapped import fused_gapped_count_T
        Bg = 2048
        rngg = np.random.default_rng(1)
        codesg = jnp.asarray(rngg.integers(0, 4, (L, Bg), dtype=np.uint8))
        lg = jnp.full((Bg,), L, jnp.int32)
        limg = jnp.full((Bg,), L, jnp.int32)
        chunks = Bg * sum(L - c + 1 for c in range(80, 141))
        for extract in extracts:
            os.environ["KMER_TPU_FUSED_EXTRACT"] = extract

            @jax.jit
            def stepg(codes, _e=extract):
                ws, counts = fused_gapped_count_T(
                    codes, lg, limg, l_len=27, r_len=27,
                    c_min=80, c_max=140, seg=4, block_lanes=256,
                    algo="dedup")
                inj = (counts[:Bg].astype(jnp.uint32) % 4).astype(jnp.uint8)
                return codes.at[0, :Bg].set(inj)

            run_chained(f"gapped {extract}", stepg, codesg, chunks)


if __name__ == "__main__":
    main()
