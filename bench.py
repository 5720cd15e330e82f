#!/usr/bin/env python3
"""Benchmark: canonical k=21 counting throughput per chip (north-star
metric, BASELINE.json).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "kmers/s", "vs_baseline": R, ...}

vs_baseline compares against the only measurable reference number
(BASELINE.md): the semantics-exact oracle of the reference pipeline runs
at ~0.40 M chunks/s on this host's CPU (the committed Rust binary is a
macOS Mach-O and cannot run here; the reference publishes no numbers).

Measurement methodology (docs/DESIGN.md, memory/tpu-bench-methodology):
this attachment's runtime makes naive timing lie in BOTH directions —
`block_until_ready` does not reliably wait, results of identical
dispatches can be served without re-execution, and fresh executables run
slow until "promoted" after ~100 executions.  So every step (a) chains a
genuine data dependency from each step's counts into the next step's
codes (no elision / no result reuse possible; XLA cannot fold it), (b)
warms 150 forced steps first, and (c) forces completion with a host
readback that depends on the whole chain.

Self-audit (VERDICT r4 #2): the device metrics are measured ROUND-ROBIN
— each of NROUNDS rounds times one big block per metric, with a
~150-step re-warm before every block (executable promotion decays while
other metrics run) — so all metrics sample the same interference
phases, and the JSON carries every window plus the median, not just the
best.  A "floor" leg (the no-extraction no-collapse kernel-shape
ablation, scripts/vpu_floor.py) rides the same rounds, so
light / measured floor / achieved are directly comparable (#4).

The end-to-end leg reports cold AND warm runs with per-stage seconds
(utils/stagetime) and the measured D2H link rate (#3).

Extra diagnostics go to stderr; stdout carries exactly the JSON line.
"""

import json
import sys
import time

import numpy as np

BASELINE_KMERS_PER_SEC = 0.40e6   # BASELINE.md: oracle extract+sort rate

K = 21
B = 32768         # reads per batch (BASELINE.json config 2 shape)
L = 150
BG = 2048         # gapped batch
WARMUP = 150      # executable-promotion warmup (forced)
NROUNDS = int(__import__("os").environ.get("KMER_TPU_BENCH_ROUNDS",
                                           "12"))  # round-robin rounds
# 12 rounds (~2 min extra vs 10): this attachment's interference
# phases span 2x for the SAME executable (DESIGN "r5 A/B
# adjudication"), so more phase samples reduce the variance of the
# best-window stat; every window + the median stay in the JSON.
REWARM = 150      # per-block re-promotion (untimed)
BIG_ITERS = 1600  # steps per timed block (~15-40 ms fixed cost / block)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from kmer_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()

    # device-init watchdog: a broken attachment makes jax.devices()
    # block forever (observed: relay up, remote worker unreachable) —
    # fail loudly instead of hanging the caller.
    import os
    import threading
    init_done = threading.Event()

    def _watchdog():
        if not init_done.wait(timeout=900):
            log("FATAL: TPU backend initialization did not complete "
                "within 900 s — attachment down?")
            os._exit(2)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax
    import jax.numpy as jnp

    from kmer_tpu.config import KmerConfig
    from kmer_tpu.ops.encode import words_per_key
    from kmer_tpu.ops.pallas.fused_extract import fused_extract_count_T
    from kmer_tpu.pipeline.count import count_step_sort, gapped_step_sort
    from kmer_tpu.utils.profiling import Roofline

    dev = jax.devices()[0]
    init_done.set()
    log(f"device: {dev} backend={jax.default_backend()}")

    gk = int(os.environ.get("KMER_TPU_BENCH_GROUP_KEYS", "0")) or None
    cfg = KmerConfig(k=K, **({"sort_group_keys": gk} if gk else {}))
    log(f"sort group keys: {cfg.sort_group_keys}")

    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, (B, L), dtype=np.uint8))
    lengths = jnp.full((B,), L, jnp.int32)
    limits = jnp.full((B,), L, jnp.int32)
    codes_g = jnp.asarray(rng.integers(0, 4, (BG, L), dtype=np.uint8))
    lengths_g = jnp.full((BG,), L, jnp.int32)
    limits_g = jnp.full((BG,), L, jnp.int32)
    codes_t = jnp.asarray(rng.integers(0, 4, (L, B), dtype=np.uint8))

    def chained(K_, group_keys):
        @jax.jit
        def step(c):
            s, is_start, counts = count_step_sort(
                c, lengths, limits, k=K_, canonical=True,
                group_keys=group_keys)
            inj = (counts[:L] % 4).astype(jnp.uint8)
            return c.at[0, :].set(inj)
        return step

    @jax.jit
    def step_gapped(c):
        s, is_start, counts = gapped_step_sort(
            c, lengths_g, limits_g, c_min=80, c_max=140,
            l_len=27, r_len=27, group_keys=cfg.sort_group_keys)
        inj = (counts[:L] % 4).astype(jnp.uint8)
        return c.at[0, :].set(inj)

    @jax.jit
    def step_floor(c):
        # kernel-SHAPE floor: the fused kernel with NO extraction and
        # NO collapse (copy+raw ablation) — same tiles, same output
        # planes; the irreducible cost of the step's shape
        ws, counts = fused_extract_count_T(
            c, lengths, limits, K, canonical=True, seg=2,
            block_lanes=512, algo="raw", extract="copy")
        inj = (counts[:B].astype(jnp.uint32) % 4).astype(jnp.uint8)
        return c.at[0, :].set(inj)

    metrics = [
        # name, step fn, initial state, lanes per step
        ("k21", chained(21, cfg.sort_group_keys), codes, B * (L - 21 + 1)),
        ("k31", chained(31, cfg.sort_group_keys), codes, B * (L - 31 + 1)),
        ("k45", chained(45, cfg.sort_group_keys), codes, B * (L - 45 + 1)),
        ("gapped", step_gapped, codes_g,
         BG * sum(L - c + 1 for c in range(80, 141))),
        ("floor", step_floor, codes_t, B * (L - 21 + 1)),
    ]

    def block(step, s, n):
        if n <= 0:
            return 0.0, s
        t0 = time.perf_counter()
        for _ in range(n):
            s = step(s)
        _ = np.asarray(s[0, :8])   # depends on the whole chain
        return time.perf_counter() - t0, s

    # compile + promote every metric once, then round-robin the timed
    # windows so all metrics sample the same interference phases
    states = {}
    for name, step, s0, _lanes in metrics:
        t0 = time.perf_counter()
        _, s = block(step, s0, 1)
        log(f"{name}: first step (incl. compile) "
            f"{time.perf_counter() - t0:.2f}s")
        _, s = block(step, s, WARMUP)
        states[name] = s

    windows = {name: [] for name, *_ in metrics}
    for r in range(NROUNDS):
        for name, step, _s0, _lanes in metrics:
            _, states[name] = block(step, states[name], REWARM)
            dt, states[name] = block(step, states[name], BIG_ITERS)
            windows[name].append(dt / BIG_ITERS)
            log(f"round{r} {name:7s} {dt / BIG_ITERS * 1e3:7.3f} ms/step")

    stats = {}
    for name, _step, _s0, lanes in metrics:
        w = sorted(windows[name])
        best, med = w[0], w[len(w) // 2]
        stats[name] = {
            "windows_ms": [round(x * 1e3, 4) for x in windows[name]],
            "best_ms": round(best * 1e3, 4),
            "median_ms": round(med * 1e3, 4),
            "best_rate": round(lanes / best),
            "median_rate": round(lanes / med),
        }
        log(f"{name}: best {best * 1e3:.3f} ms ({lanes / best / 1e9:.2f} B"
            f"/s), median {med * 1e3:.3f} ms ({lanes / med / 1e9:.2f} B/s)")

    kmers_per_sec = stats["k21"]["best_rate"]

    # roofline story (VERDICT r4 #4) in one place: HBM speed-of-light
    # for the exact output bytes, the MEASURED kernel-shape floor (the
    # ablation cannot be beaten without changing the output contract),
    # and the achieved step — same units, same phases.
    cnt_b = 1 if os.environ.get("KMER_TPU_COUNTS_DTYPE", "i8") == "i8" \
        else 4
    rl = Roofline.for_fused_step(B, L, K, words_per_key(K), cnt_bytes=cnt_b)
    light_ms = rl.seconds_at_roofline() * 1e3
    rl32 = Roofline.for_fused_step(B, L, K, words_per_key(K), cnt_bytes=4)
    roof = {
        "light_ms": round(light_ms, 4),
        "floor_ms": stats["floor"]["best_ms"],
        "achieved_ms": stats["k21"]["best_ms"],
        "fraction_of_light": round(light_ms / stats["k21"]["best_ms"], 4),
        "fraction_of_floor": round(
            stats["floor"]["best_ms"] / stats["k21"]["best_ms"], 4),
        "light_i32model_ms": round(rl32.seconds_at_roofline() * 1e3, 4),
    }
    log(f"roofline: light {roof['light_ms']} ms, measured floor "
        f"{roof['floor_ms']} ms, achieved {roof['achieved_ms']} ms")

    # host-merge metric: the from_pairs choke point at the flush-merge
    # shape (native bucket-parallel aggregator; scales with cores)
    from kmer_tpu.pipeline.table import KmerTable
    hm_n = 8 << 20
    hm_keys = np.asarray(rng.integers(0, 2 ** 32, (hm_n, 2)),
                         dtype=np.uint32)
    hm_keys[:, 0] &= (1 << 10) - 1
    hm_keys = hm_keys[rng.integers(0, hm_n // 2, hm_n)]
    hm_counts = np.ones(hm_n, np.int64)
    hm_best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        KmerTable.from_pairs(K, hm_keys, hm_counts)
        hm_best = min(hm_best, time.perf_counter() - t0)
    hm_rate = hm_n / hm_best
    log(f"host merge: {hm_best * 1e3:.0f} ms = {hm_rate / 1e6:.1f} M"
        " pairs/s")

    # end-to-end corpus run, instrumented (VERDICT r4 #3): cold then
    # warm, each with per-stage wall seconds — the warm run is the
    # pipeline's number; cold - warm is compile.  The measured D2H
    # link rate contextualizes the readback stage (this rig: a
    # ~15-50 MB/s tunnel; production hosts: PCIe).
    import tempfile

    from kmer_tpu.io.generator import genome_reads_fasta
    from kmer_tpu.pipeline.count import count_fasta
    from kmer_tpu.utils import stagetime
    from kmer_tpu.utils.linkspeed import d2h_gbps
    n_reads = int(os.environ.get("KMER_TPU_BENCH_E2E_READS", "10000"))
    e2e = None
    if n_reads > 0:
        # guarded: an e2e failure (tunnel drop mid-transfer, disk full)
        # must not discard the already-measured device metrics
        try:
            link = d2h_gbps()
            runs = {}
            with tempfile.TemporaryDirectory() as d:
                fa = os.path.join(d, "bench.fasta")
                with open(fa, "w") as f:
                    f.write(genome_reads_fasta(n_reads, L,
                                               genome_len=1_000_000,
                                               seed=1))
                for label in ("cold", "warm"):
                    st = {}
                    t0 = time.perf_counter()
                    with stagetime.collect(st):
                        table = count_fasta(fa, cfg.replace(canonical=True))
                    wall = time.perf_counter() - t0
                    runs[label] = {
                        "seconds": round(wall, 3),
                        "stages": {k2: round(v, 3)
                                   for k2, v in sorted(st.items())},
                    }
                    log(f"e2e {label}: {wall:.2f}s "
                        f"{runs[label]['stages']}")
            warm_s = runs["warm"]["seconds"]
            e2e = {
                "reads": n_reads,
                "distinct": table.num_distinct,
                "cold": runs["cold"],
                "warm": runs["warm"],
                "reads_per_sec_warm": round(n_reads / warm_s),
                "kmers_per_sec_warm": round(n_reads * (L - K + 1) / warm_s),
                "d2h_link_gbps": round(link, 4),
                "note": "warm stage seconds attribute the wall; "
                        "readback rides the measured link rate",
            }
        except Exception as e:          # noqa: BLE001 — reported in JSON
            e2e = {"error": f"{type(e).__name__}: {e}"}
            log(f"end-to-end FAILED (device metrics preserved): {e}")

    # production-scale end-to-end (the SCALE_r05 shape): 1 M genome-
    # coverage reads, 165 MB FASTA, ~15.3 M distinct — the regime the
    # devmerge growth + grouped merges + u24 wire drain were built
    # for.  Same guard discipline: a failure must not discard the
    # metrics above.
    from kmer_tpu.io.generator import genome_reads_fasta
    n_scale = int(os.environ.get("KMER_TPU_BENCH_SCALE_READS",
                                 "1000000"))
    e2e_scale = None
    if n_scale > 0:
        try:
            with tempfile.TemporaryDirectory() as d:
                fa = os.path.join(d, "scale.fasta")
                with open(fa, "w") as f:
                    f.write(genome_reads_fasta(
                        n_scale, L, genome_len=10_000_000, seed=5,
                        error_rate=0.002))
                runs = {}
                for label in ("cold", "warm"):
                    st = {}
                    t0 = time.perf_counter()
                    with stagetime.collect(st):
                        stab = count_fasta(fa, cfg.replace(canonical=True))
                    wall = time.perf_counter() - t0
                    runs[label] = {
                        "seconds": round(wall, 2),
                        "stages": {k2: round(v, 2)
                                   for k2, v in sorted(st.items())},
                    }
                    log(f"e2e-scale {label}: {wall:.2f}s "
                        f"{runs[label]['stages']}")
            warm_s = runs["warm"]["seconds"]
            e2e_scale = {
                "reads": n_scale,
                "total_kmers": int(stab.counts.sum()),
                "distinct": stab.num_distinct,
                "cold": runs["cold"],
                "warm": runs["warm"],
                "reads_per_sec_warm": round(n_scale / warm_s),
                "kmers_per_sec_warm": round(
                    int(stab.counts.sum()) / warm_s),
            }
        except Exception as e:          # noqa: BLE001 — reported in JSON
            e2e_scale = {"error": f"{type(e).__name__}: {e}"}
            log(f"scale end-to-end FAILED (other metrics preserved): {e}")

    print(json.dumps({
        "metric": f"canonical k={K} count throughput (1 chip, sort mode)",
        "value": kmers_per_sec,
        "unit": "kmers/s",
        "vs_baseline": round(kmers_per_sec / BASELINE_KMERS_PER_SEC, 2),
        # light / measured kernel-shape floor / achieved, same phases
        "roofline": roof,
        # every timed window for every metric — noise vs regression is
        # adjudicable from the artifact alone (VERDICT r4 #2)
        "device_metrics": {
            name: stats[name] for name, *_ in metrics
        },
        "kmers_per_sec_k31": stats["k31"]["best_rate"],
        "kmers_per_sec_k45": stats["k45"]["best_rate"],
        "gapped_chunks_per_sec": stats["gapped"]["best_rate"],
        "host_merge_pairs_per_sec": round(hm_rate),
        "end_to_end": e2e,
        "end_to_end_scale": e2e_scale,
    }))


if __name__ == "__main__":
    main()
