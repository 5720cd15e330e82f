#!/usr/bin/env python3
"""Round-2 experiments: close the roofline gap of the count step.

Hypotheses (VERDICT.md #1, memory/tpu-bench-methodology):
  H1  XLA's grouped variadic sort is near the bitonic VPU speed of
      light, so the comparator cost is the lever: a 42-bit key repacked
      as (top32, bot10) and sorted with num_keys=1 (bot as payload)
      does 1 compare per stage instead of a 2-word lexicographic
      compare.  Ties in top32 may interleave — the counting contract
      only needs partial aggregation (host from_pairs absorbs it).
  H2  Smaller groups = fewer bitonic stages (log^2 m): m=512/256 should
      beat the current m=2080.
  H3  The non-sort parts of the step (extract+canonical, run-length
      scans) are small; measure to confirm.
  H4  On-device compaction needs a within-group partition sort
      (1-key, 4 operands) — measure its cost.

Methodology per memory/tpu-bench-methodology: chain a real data
dependency through every iteration, warm 150 forced steps, force with a
host readback.  ONE process, variants interleaved where it matters.
"""

import sys
import time

import numpy as np

from kmer_tpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax import lax

from kmer_tpu.ops.canonical import canonical_kmer_lanes

WARM = 150
ITERS = 200
K = 21
B = 32768
L = 150
P = L - K + 1
N_STEP = B * P                  # 4,259,840
N_SORT = 1 << 22                # sort-only probes

SENT = jnp.uint32(0xFFFFFFFF)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench(name, step, state, n_keys, iters=ITERS):
    t0 = time.perf_counter()
    state = step(state)
    np.asarray(jax.tree_util.tree_leaves(state)[0].ravel()[:8])
    log(f"[{name}] compile+first: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(WARM):
        state = step(state)
    np.asarray(jax.tree_util.tree_leaves(state)[0].ravel()[:8])
    warm_dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        state = step(state)
    np.asarray(jax.tree_util.tree_leaves(state)[0].ravel()[:8])
    dt = (time.perf_counter() - t0) / iters
    ok = abs(warm_dt / WARM - dt) / dt < 0.25
    print(f"{name:22s} {dt * 1e3:8.3f} ms  {n_keys / dt / 1e9:7.2f} B keys/s"
          f"  (warm {warm_dt / WARM * 1e3:.3f} ms{'' if ok else '  MISMATCH'})",
          flush=True)
    return dt


def remix(s0, s1):
    """Data-dependent fresh uniform u32 pair from sorted outputs."""
    a = s0 * jnp.uint32(2654435761) ^ jnp.roll(s1, 3, axis=-1)
    b = s1 * jnp.uint32(1597334677) + jnp.roll(s0, 5, axis=-1)
    return a, b


def mk_sort2(m):
    G = N_SORT // m

    @jax.jit
    def step(s):
        a, b = s
        hi = a.reshape(G, m) >> 22          # 10 used bits, like prod layout
        lo = b.reshape(G, m)
        s0, s1 = lax.sort((hi, lo), num_keys=2, dimension=1)
        return remix(s0, s1)
    return step


def mk_sort1(m, dim0=False):
    G = N_SORT // m

    @jax.jit
    def step(s):
        a, b = s
        if dim0:
            top = a.reshape(m, G)
            bot = b.reshape(m, G)
            s0, s1 = lax.sort((top, bot), num_keys=1, dimension=0)
            s0, s1 = s0.T, s1.T
        else:
            top = a.reshape(G, m)
            bot = b.reshape(G, m)
            s0, s1 = lax.sort((top, bot), num_keys=1, dimension=1)
        return remix(s0, s1)
    return step


def mk_part4(m):
    """Within-group partition sort: 1-bit-ish key + 3 payload words
    (the compaction stage-2 candidate)."""
    G = N_SORT // m

    @jax.jit
    def step(s):
        a, b = s
        f = (a.reshape(G, m) >> 31)         # pseudo is_start flag
        w0 = a.reshape(G, m)
        w1 = b.reshape(G, m)
        c = (b.reshape(G, m) >> 16)
        s0, s1, s2, s3 = lax.sort((f, w0, w1, c), num_keys=1, dimension=1)
        return remix(s1, s2)
    return step


# ---- full count-step variants -------------------------------------------

lengths = None
limits = None


def run_lengths_repacked(sorted_2d):
    """run_lengths over (G, m) repacked (top32..., botS) words: validity
    from the LAST word (= SENT only for sentinel lanes)."""
    G, m = sorted_2d[0].shape
    neq = jnp.zeros((G, m), bool).at[:, 0].set(True)
    for w in sorted_2d:
        neq = neq | (jnp.roll(w, 1, axis=1) != w).at[:, 0].set(True)
    is_start = neq
    idx = lax.broadcasted_iota(jnp.int32, (G, m), 1)
    start_pos = jnp.where(is_start, idx, m)
    suffix_min = lax.cummin(start_pos, axis=1, reverse=True)
    next_start = jnp.concatenate(
        [suffix_min[:, 1:], jnp.full((G, 1), m, jnp.int32)], axis=1)
    valid = sorted_2d[-1] != SENT
    counts = jnp.where(is_start & valid, next_start - idx, 0)
    return is_start, counts


def mk_step_cur(m):
    from kmer_tpu.ops import count as count_ops
    G = N_STEP // m

    @jax.jit
    def step(codes):
        words, _ = canonical_kmer_lanes(codes, lengths, K, limits=limits)
        flat = [w.reshape(G, m) for w in words]
        s2d = list(lax.sort(tuple(flat), num_keys=2, dimension=1))
        is_start, counts = count_ops.run_lengths_grouped(s2d)
        inj = (counts[:L] % 4).astype(jnp.uint8)
        return codes.at[0, :].set(inj)
    return step


def mk_step_nk1(m):
    G = N_STEP // m

    @jax.jit
    def step(codes):
        words, valid = canonical_kmer_lanes(codes, lengths, K, limits=limits)
        hi, lo = words
        top = (hi << jnp.uint32(22)) | (lo >> jnp.uint32(10))
        bot = jnp.where(valid, lo & jnp.uint32(0x3FF), SENT)
        s0, s1 = lax.sort((top.reshape(G, m), bot.reshape(G, m)),
                          num_keys=1, dimension=1)
        is_start, counts = run_lengths_repacked([s0, s1])
        inj = (counts.reshape(-1)[:L] % 4).astype(jnp.uint8)
        return codes.at[0, :].set(inj)
    return step


def mk_extract_only():
    @jax.jit
    def step(codes):
        words, valid = canonical_kmer_lanes(codes, lengths, K, limits=limits)
        hi, lo = words
        top = (hi << jnp.uint32(22)) | (lo >> jnp.uint32(10))
        bot = jnp.where(valid, lo & jnp.uint32(0x3FF), SENT)
        inj = ((top[0, :P] ^ bot[0, :P]) % 4).astype(jnp.uint8)
        return codes.at[0, :P].set(inj)
    return step


def run_lengths_repacked16(sorted_2d):
    """Scan in int16 (counts <= m < 2^15): narrower VPU traffic."""
    G, m = sorted_2d[0].shape
    neq = jnp.zeros((G, m), bool).at[:, 0].set(True)
    for w in sorted_2d:
        neq = neq | (jnp.roll(w, 1, axis=1) != w).at[:, 0].set(True)
    is_start = neq
    idx = lax.broadcasted_iota(jnp.int16, (G, m), 1)
    start_pos = jnp.where(is_start, idx, jnp.int16(m))
    suffix_min = lax.cummin(start_pos, axis=1, reverse=True)
    next_start = jnp.concatenate(
        [suffix_min[:, 1:], jnp.full((G, 1), m, jnp.int16)], axis=1)
    valid = sorted_2d[-1] != SENT
    counts = jnp.where(is_start & valid, next_start - idx, jnp.int16(0))
    return is_start, counts


def mk_scan_only(m, bits16=False):
    G = N_SORT // m
    rl = run_lengths_repacked16 if bits16 else run_lengths_repacked

    @jax.jit
    def step(s):
        a, b = s
        is_start, counts = rl([a.reshape(G, m), b.reshape(G, m)])
        c2 = counts.astype(jnp.uint32)
        return (a ^ c2.reshape(a.shape),
                b + is_start.astype(jnp.uint32).reshape(b.shape))
    return step


def mk_step_nk1_16(m):
    G = N_STEP // m

    @jax.jit
    def step(codes):
        words, valid = canonical_kmer_lanes(codes, lengths, K, limits=limits)
        hi, lo = words
        top = (hi << jnp.uint32(22)) | (lo >> jnp.uint32(10))
        bot = jnp.where(valid, lo & jnp.uint32(0x3FF), SENT)
        s0, s1 = lax.sort((top.reshape(G, m), bot.reshape(G, m)),
                          num_keys=1, dimension=1)
        is_start, counts = run_lengths_repacked16([s0, s1])
        inj = (counts.reshape(-1)[:L].astype(jnp.int32) % 4).astype(jnp.uint8)
        return codes.at[0, :].set(inj)
    return step


def main():
    global lengths, limits
    dev = jax.devices()[0]
    log(f"device: {dev} backend={jax.default_backend()}")

    rng = np.random.default_rng(0)
    sort_state = (jnp.asarray(rng.integers(0, 1 << 32, N_SORT, dtype=np.uint32)),
                  jnp.asarray(rng.integers(0, 1 << 32, N_SORT, dtype=np.uint32)))
    codes = jnp.asarray(rng.integers(0, 4, (B, L), dtype=np.uint8))
    lengths = jnp.full((B,), L, jnp.int32)
    limits = jnp.full((B,), L, jnp.int32)

    phase = int(__import__("os").environ.get("PHASE", "1"))
    if phase == 3:
        # full production step via grouped_count backends
        from kmer_tpu.ops.count import grouped_count

        def mk_step_prod(m, backend):
            @jax.jit
            def step(codes):
                words, valid = canonical_kmer_lanes(codes, lengths, K,
                                                    limits=limits)
                std, is_start, counts = grouped_count(words, valid, K, m,
                                                      backend=backend)
                inj = (counts[:L] % 4).astype(jnp.uint8)
                return codes.at[0, :].set(inj)
            return step

        bench("prod_xla_m512", mk_step_prod(512, "xla"), codes, N_STEP)
        bench("prod_pal_m512", mk_step_prod(512, "pallas"), codes, N_STEP)
        bench("prod_pal_m256", mk_step_prod(256, "pallas"), codes, N_STEP)
        bench("prod_pal_m128", mk_step_prod(128, "pallas"), codes, N_STEP)
        bench("prod_pal_m1024", mk_step_prod(1024, "pallas"), codes, N_STEP)
        bench("prod_xla_m512#2", mk_step_prod(512, "xla"), codes, N_STEP)
        return
    if phase == 4:
        from kmer_tpu.ops.count import grouped_count

        def mk_step_prod(m, backend):
            @jax.jit
            def step(codes):
                words, valid = canonical_kmer_lanes(codes, lengths, K,
                                                    limits=limits)
                std, is_start, counts = grouped_count(words, valid, K, m,
                                                      backend=backend)
                inj = (counts[:L] % 4).astype(jnp.uint8)
                return codes.at[0, :].set(inj)
            return step

        bench("prod_hyb_m512", mk_step_prod(512, "hybrid"), codes, N_STEP)
        bench("prod_hyb_m256", mk_step_prod(256, "hybrid"), codes, N_STEP)
        bench("prod_hyb_m128", mk_step_prod(128, "hybrid"), codes, N_STEP)
        bench("prod_xla_m512#3", mk_step_prod(512, "xla"), codes, N_STEP)
        bench("prod_hyb_m256#2", mk_step_prod(256, "hybrid"), codes, N_STEP)
        return
    if phase == 5:
        # full production step via count_step_sort (pallas extractor on)
        from kmer_tpu.pipeline.count import count_step_sort

        def mk_full(m):
            @jax.jit
            def step(codes):
                s, is_start, counts = count_step_sort(
                    codes, lengths, limits, k=K, canonical=True,
                    group_keys=m)
                inj = (counts[:L] % 4).astype(jnp.uint8)
                return codes.at[0, :].set(inj)
            return step

        def mk_extract_pallas():
            from kmer_tpu.ops.pallas.extract import extract_repacked

            @jax.jit
            def step(codes):
                top, bot = extract_repacked(codes, lengths, limits, K, True)
                inj = ((top[0, :P] ^ bot[0, :P]) % 4).astype(jnp.uint8)
                return codes.at[0, :P].set(inj)
            return step

        bench("extract_pallas", mk_extract_pallas(), codes, N_STEP)
        bench("full_m256", mk_full(256), codes, N_STEP)
        bench("full_m512", mk_full(512), codes, N_STEP)
        bench("full_m128", mk_full(128), codes, N_STEP)
        bench("full_m256#2", mk_full(256), codes, N_STEP)
        return
    if phase in (6, 7):
        # compaction-stage probes
        def mk_part3(m):
            G = N_SORT // m

            @jax.jit
            def step(s):
                a, b = s
                f = (a.reshape(G, m) >> 31)
                top = a.reshape(G, m)
                packed = b.reshape(G, m) >> 13
                s0, s1, s2 = lax.sort((f, top, packed), num_keys=1,
                                      dimension=1)
                return remix(s1, s2)
            return step

        def mk_pack_dma(m):
            from kmer_tpu.ops.pallas.compact import pack_groups
            G = N_SORT // m

            @jax.jit
            def step(s):
                a, b = s
                w0 = a.reshape(G, m)
                w1 = b.reshape(G, m)
                cnt = w0 ^ w1
                d = (w0[:, :8].sum(axis=1) % m).astype(jnp.int32)
                out, total = pack_groups([w0, w1, cnt], d)
                flat = out.reshape(-1)[:N_SORT]
                na = a ^ flat * jnp.uint32(2654435761)
                nb = b + jnp.roll(flat, 3)
                return na, nb
            return step

        def mk_sort1_u16(m):
            G = N_SORT // m

            @jax.jit
            def step(s):
                a, b = s
                top = a.reshape(G, m)
                bot = (b.reshape(G, m) & jnp.uint32(0x3FF)).astype(jnp.uint16)
                s0, s1 = lax.sort((top, bot), num_keys=1, dimension=1)
                return remix(s0.reshape(a.shape),
                             (s1.astype(jnp.uint32) |
                              (s0 << jnp.uint32(10))).reshape(a.shape))
            return step

        if phase == 6:
            bench("s1k_u16_m256", mk_sort1_u16(256), sort_state, N_SORT)
            bench("s1k_m256#2", mk_sort1(256), sort_state, N_SORT)
            bench("part3_m2048", mk_part3(2048), sort_state, N_SORT)
            bench("part3_m512", mk_part3(512), sort_state, N_SORT)
        bench("pack_dma_m2048", mk_pack_dma(2048), sort_state, N_SORT)
        bench("pack_dma_m8192", mk_pack_dma(8192), sort_state, N_SORT)

        from kmer_tpu.pipeline.count import count_step_compact

        @jax.jit
        def step_compact(codes):
            out, total = count_step_compact(codes, lengths, limits, k=K,
                                            canonical=True, group_keys=256)
            flat = out.reshape(-1)
            inj = (flat[:L] % 4).astype(jnp.uint8)
            return codes.at[0, :].set(inj)

        bench("prod_compact_m256", step_compact, codes, N_STEP)
        return
    if phase in (8, 9, 10):
        # sublane-axis fused kernel (strided-column groups)
        from kmer_tpu.ops.count import grouped_count

        def mk_step_prod(m, backend):
            @jax.jit
            def step(codes):
                words, valid = canonical_kmer_lanes(codes, lengths, K,
                                                    limits=limits)
                std, is_start, counts = grouped_count(words, valid, K, m,
                                                      backend=backend)
                inj = (counts[:L] % 4).astype(jnp.uint8)
                return codes.at[0, :].set(inj)
            return step

        if phase == 8:
            bench("prod_palT_m128", mk_step_prod(128, "pallas_t"),
                  codes, N_STEP)
            bench("prod_palT_m256", mk_step_prod(256, "pallas_t"),
                  codes, N_STEP)
            bench("prod_palT_m64", mk_step_prod(64, "pallas_t"),
                  codes, N_STEP)
            bench("prod_hyb_m256#3", mk_step_prod(256, "hybrid"),
                  codes, N_STEP)
            return
        if phase == 9:
            bench("prod_palT_m32", mk_step_prod(32, "pallas_t"),
                  codes, N_STEP)
            bench("prod_palT_m64#2", mk_step_prod(64, "pallas_t"),
                  codes, N_STEP)
            bench("prod_palT_m16", mk_step_prod(16, "pallas_t"),
                  codes, N_STEP)
            bench("prod_palT_m64#3", mk_step_prod(64, "pallas_t"),
                  codes, N_STEP)
            return
        # phase 10: transposed (sublane-axis) extraction probes
        from kmer_tpu.ops.canonical import lex_min, revcomp_words
        from kmer_tpu.ops.count import grouped_count_repacked

        def extract_T(codes_t):
            """(L, B) codes -> repacked (top, bot) (P, B)."""
            c32 = codes_t.astype(jnp.uint32)
            low = 2 * K - 32
            hi = jnp.zeros((P, B), jnp.uint32)
            lo = jnp.zeros((P, B), jnp.uint32)
            for j in range(K):
                sl = lax.dynamic_slice_in_dim(c32, j, P, axis=0)
                bitpos = 2 * (K - 1 - j)
                if bitpos >= 32:
                    hi = hi | (sl << jnp.uint32(bitpos - 32))
                else:
                    lo = lo | (sl << jnp.uint32(bitpos))
            fwd = [hi, lo]
            rc = revcomp_words(fwd, K)
            mn = lex_min(fwd, rc)
            pos = lax.broadcasted_iota(jnp.int32, (P, B), 0)
            valid = pos <= (lengths.astype(jnp.int32)[None, :] - K)
            top = (mn[0] << jnp.uint32(32 - low)) | (mn[1] >> jnp.uint32(low))
            bot = jnp.where(valid, mn[1] & jnp.uint32((1 << low) - 1), SENT)
            top = jnp.where(valid, top, SENT)
            return top, bot

        def mk_ext_T():
            @jax.jit
            def step(codes):
                ct = codes.T
                top, bot = extract_T(ct)
                inj = ((top[:P, 0] ^ bot[:P, 0]) % 4).astype(jnp.uint8)
                return codes.at[0, :P].set(inj)
            return step

        def mk_step_T(m):
            @jax.jit
            def step(codes):
                ct = codes.T
                top, bot = extract_T(ct)
                std, is_start, counts = grouped_count_repacked(
                    [top, bot], K, m, backend="pallas_t")
                inj = (counts[:L] % 4).astype(jnp.uint8)
                return codes.at[0, :].set(inj)
            return step

        bench("ext_T_xla", mk_ext_T(), codes, N_STEP)
        bench("step_T_m16", mk_step_T(16), codes, N_STEP)
        bench("prod_palT_m8", mk_step_prod(8, "pallas_t"), codes, N_STEP)
        bench("step_T_m32", mk_step_T(32), codes, N_STEP)
        return
    if phase == 11:
        # log-doubling extraction (O(log k) shift-or, rc from the chain)
        from kmer_tpu.ops.count import grouped_count_repacked
        from kmer_tpu.ops.extract import (kmer_lanes_repacked_T,
                                          kmer_lanes_repacked_T_doubling)

        def mk_ext(fn, kk=K):
            pp = L - kk + 1

            @jax.jit
            def step(codes):
                rw, _ = fn(codes.T, lengths, kk, limits=limits,
                           canonical=True)
                inj = ((rw[0][:pp, 0] ^ rw[-1][:pp, 0]) % 4).astype(jnp.uint8)
                return codes.at[0, :pp].set(inj)
            return step

        def mk_step(fn, m, kk=K):
            @jax.jit
            def step(codes):
                rw, _ = fn(codes.T, lengths, kk, limits=limits,
                           canonical=True)
                std, is_start, counts = grouped_count_repacked(
                    rw, kk, m, backend="pallas_t")
                inj = (counts[:L] % 4).astype(jnp.uint8)
                return codes.at[0, :].set(inj)
            return step

        bench("ext_dbl", mk_ext(kmer_lanes_repacked_T_doubling), codes, N_STEP)
        bench("ext_slice#2", mk_ext(kmer_lanes_repacked_T), codes, N_STEP)
        bench("step_dbl_m16", mk_step(kmer_lanes_repacked_T_doubling, 16),
              codes, N_STEP)
        bench("step_slice_m16#2", mk_step(kmer_lanes_repacked_T, 16),
              codes, N_STEP)
        bench("step_dbl_m32", mk_step(kmer_lanes_repacked_T_doubling, 32),
              codes, N_STEP)
        return
    if phase == 12:
        # fully fused single-kernel step (extract+canonical+repack+sort
        # +runlength in one pallas kernel): kills the ~68 MB HBM
        # round-trip of repacked keys between the two stages
        from kmer_tpu.ops.count import grouped_count_repacked
        from kmer_tpu.ops.extract import kmer_lanes_repacked_T
        from kmer_tpu.ops.pallas.fused_extract import fused_extract_count_T

        def mk_fused(seg, bl=512):
            @jax.jit
            def step(codes):
                rflat, counts = fused_extract_count_T(
                    codes.T, lengths, limits, K, canonical=True,
                    seg=seg, block_lanes=bl)
                inj = (counts[:L] % 4).astype(jnp.uint8)
                return codes.at[0, :].set(inj)
            return step

        def mk_two_stage(m):
            @jax.jit
            def step(codes):
                rw, _ = kmer_lanes_repacked_T(codes.T, lengths, K,
                                              limits=limits, canonical=True)
                std, is_start, counts = grouped_count_repacked(
                    rw, K, m, backend="pallas_t")
                inj = (counts[:L] % 4).astype(jnp.uint8)
                return codes.at[0, :].set(inj)
            return step

        bench("fused_s16", mk_fused(16), codes, N_STEP)
        bench("two_stage_m16#3", mk_two_stage(16), codes, N_STEP)
        bench("fused_s8", mk_fused(8), codes, N_STEP)
        bench("fused_s32", mk_fused(32), codes, N_STEP)
        bench("fused_s16_bl1024", mk_fused(16, 1024), codes, N_STEP)
        bench("fused_s16#2", mk_fused(16), codes, N_STEP)
        return
    if phase == 13:
        # seg sweep around the s8 win + k=31 fused variant
        from kmer_tpu.ops.pallas.fused_extract import fused_extract_count_T

        def mk_fused(seg, bl=512, kk=K):
            @jax.jit
            def step(codes):
                rflat, counts = fused_extract_count_T(
                    codes.T, lengths, limits, kk, canonical=True,
                    seg=seg, block_lanes=bl)
                inj = (counts[:L] % 4).astype(jnp.uint8)
                return codes.at[0, :].set(inj)
            return step

        bench("fused_s4", mk_fused(4), codes, N_STEP)
        bench("fused_s8#2", mk_fused(8), codes, N_STEP)
        bench("fused_s8_bl256", mk_fused(8, 256), codes, N_STEP)
        bench("fused_s2", mk_fused(2), codes, N_STEP)
        bench("fused_s8_bl1024", mk_fused(8, 1024), codes, N_STEP)
        bench("fused_s8_k31", mk_fused(8, 512, 31), codes, B * (L - 31 + 1))
        bench("fused_s4#2", mk_fused(4), codes, N_STEP)
        return
    if phase == 14:
        # k=31 x block_lanes interaction (bench showed 0.96 ms at bl256)
        from kmer_tpu.ops.pallas.fused_extract import fused_extract_count_T

        def mk_fused(seg, bl, kk):
            @jax.jit
            def step(codes):
                rflat, counts = fused_extract_count_T(
                    codes.T, lengths, limits, kk, canonical=True,
                    seg=seg, block_lanes=bl)
                inj = (counts[:L] % 4).astype(jnp.uint8)
                return codes.at[0, :].set(inj)
            return step

        n31 = B * (L - 31 + 1)
        bench("k31_s8_bl256", mk_fused(8, 256, 31), codes, n31)
        bench("k31_s8_bl512#2", mk_fused(8, 512, 31), codes, n31)
        bench("k21_s8_bl256#2", mk_fused(8, 256, 21), codes, N_STEP)
        bench("k31_s16_bl256", mk_fused(16, 256, 31), codes, n31)
        bench("k31_s8_bl128", mk_fused(8, 128, 31), codes, n31)
        bench("k25_s8_bl256", mk_fused(8, 256, 25), codes, B * (L - 25 + 1))
        return
    if phase == 15:
        # all-pairs dedup (no sort) vs bitonic inside the fused kernel
        from kmer_tpu.ops.pallas.fused_extract import fused_extract_count_T

        def mk_fused(seg, bl, kk, algo):
            @jax.jit
            def step(codes):
                rflat, counts = fused_extract_count_T(
                    codes.T, lengths, limits, kk, canonical=True,
                    seg=seg, block_lanes=bl, algo=algo)
                inj = (counts[:L] % 4).astype(jnp.uint8)
                return codes.at[0, :].set(inj)
            return step

        n31 = B * (L - 31 + 1)
        bench("k21_s8_dedup", mk_fused(8, 256, 21, "dedup"), codes, N_STEP)
        bench("k21_s8_sort#r", mk_fused(8, 256, 21, "sort"), codes, N_STEP)
        bench("k21_s4_dedup", mk_fused(4, 256, 21, "dedup"), codes, N_STEP)
        bench("k31_s8_dedup", mk_fused(8, 256, 31, "dedup"), codes, n31)
        bench("k21_s8_dedup#2", mk_fused(8, 256, 21, "dedup"), codes, N_STEP)
        return
    if phase == 16:
        # small-seg dedup sweep (gapped s4 measured ~2x its s8)
        from kmer_tpu.ops.pallas.fused_extract import fused_extract_count_T

        def mk_fused(seg, bl, kk, algo):
            @jax.jit
            def step(codes):
                rflat, counts = fused_extract_count_T(
                    codes.T, lengths, limits, kk, canonical=True,
                    seg=seg, block_lanes=bl, algo=algo)
                inj = (counts[:L] % 4).astype(jnp.uint8)
                return codes.at[0, :].set(inj)
            return step

        n31 = B * (L - 31 + 1)
        bench("k21_s2_dedup", mk_fused(2, 256, 21, "dedup"), codes, N_STEP)
        bench("k21_s4_dedup#2", mk_fused(4, 256, 21, "dedup"), codes, N_STEP)
        bench("k31_s4_dedup", mk_fused(4, 256, 31, "dedup"), codes, n31)
        bench("k21_s4_sort", mk_fused(4, 256, 21, "sort"), codes, N_STEP)
        bench("k31_s2_dedup", mk_fused(2, 256, 31, "dedup"), codes, n31)
        return
    if phase == 17:
        # post-doubling tile re-sweep (doubling extraction is the
        # default now; the bl/seg optimum may have moved)
        from kmer_tpu.ops.pallas.fused_extract import fused_extract_count_T

        def mk_fused(seg, bl, kk, algo="dedup"):
            @jax.jit
            def step(codes):
                rflat, counts = fused_extract_count_T(
                    codes.T, lengths, limits, kk, canonical=True,
                    seg=seg, block_lanes=bl, algo=algo)
                inj = (counts[:L] % 4).astype(jnp.uint8)
                return codes.at[0, :].set(inj)
            return step

        n31 = B * (L - 31 + 1)
        bench("k21_s4_bl512", mk_fused(4, 512, 21), codes, N_STEP)
        bench("k21_s4_bl128", mk_fused(4, 128, 21), codes, N_STEP)
        bench("k21_s2_bl256", mk_fused(2, 256, 21), codes, N_STEP)
        bench("k21_s4_bl256#r", mk_fused(4, 256, 21), codes, N_STEP)
        bench("k31_s4_bl512", mk_fused(4, 512, 31), codes, n31)
        return
    if phase == 18:
        # stage decomposition: raw (no collapse) and non-canonical
        # variants isolate dedup / RC / extraction+write costs
        from kmer_tpu.ops.pallas.fused_extract import fused_extract_count_T

        def mk_var(algo, canon):
            @jax.jit
            def step(codes):
                rflat, counts = fused_extract_count_T(
                    codes.T, lengths, limits, 21, canonical=canon,
                    seg=4, block_lanes=256, algo=algo)
                inj = (counts[:L] % 4).astype(jnp.uint8)
                return codes.at[0, :].set(inj)
            return step

        bench("full_canon_dedup", mk_var("dedup", True), codes, N_STEP)
        bench("canon_raw", mk_var("raw", True), codes, N_STEP)
        bench("nocanon_dedup", mk_var("dedup", False), codes, N_STEP)
        bench("nocanon_raw", mk_var("raw", False), codes, N_STEP)
        bench("full_canon_dedup#2", mk_var("dedup", True), codes, N_STEP)
        return
    if phase == 1:
        # ranked by importance — partial output is still useful
        bench("step_cur_m2080", mk_step_cur(2080), codes, N_STEP)
        bench("step_nk1_m512", mk_step_nk1(512), codes, N_STEP)
        bench("step_nk1_m256", mk_step_nk1(256), codes, N_STEP)
        bench("s2k_m512", mk_sort2(512), sort_state, N_SORT)
        bench("s1k_m512", mk_sort1(512), sort_state, N_SORT)
        bench("s1k_m256", mk_sort1(256), sort_state, N_SORT)
        bench("s1k_m1024", mk_sort1(1024), sort_state, N_SORT)
        bench("s2k_m2048", mk_sort2(2048), sort_state, N_SORT)
    bench("extract_only", mk_extract_only(), codes, N_STEP)
    bench("scan_m512", mk_scan_only(512), sort_state, N_SORT)
    bench("scan16_m512", mk_scan_only(512, bits16=True), sort_state, N_SORT)
    bench("step_nk1_16_m512", mk_step_nk1_16(512), codes, N_STEP)
    bench("step_nk1_16_m256", mk_step_nk1_16(256), codes, N_STEP)
    bench("part4_m512", mk_part4(512), sort_state, N_SORT)
    bench("s1k_m128", mk_sort1(128), sort_state, N_SORT)
    bench("s1k_m512_dim0", mk_sort1(512, dim0=True), sort_state, N_SORT)
    # re-run to catch cross-run drift
    bench("step_nk1_m512#2", mk_step_nk1(512), codes, N_STEP)
    bench("step_cur_m2080#2", mk_step_cur(2080), codes, N_STEP)


if __name__ == "__main__":
    main()
