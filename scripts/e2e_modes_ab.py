#!/usr/bin/env python3
"""Output-contract A/B (VERDICT r4 #7): plain sort readback vs on-device
compaction vs the r5 device-resident table (devmerge), end-to-end on
two corpus shapes:

  pool    reference-style repetitive corpus (pool-of-10 80-mers,
          distinct/total << 1 — random_fasta_generator.py semantics)
  genome  reads from a 1 M-base genome (distinct/total ~ 0.5, the
          bench e2e shape)

Each mode runs twice (cold=compile, warm=pipeline) with per-stage
seconds; one JSON line per (corpus, mode) on stdout.

Usage: python scripts/e2e_modes_ab.py [n_reads]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")
from kmer_tpu.utils.jaxcache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from kmer_tpu.config import KmerConfig  # noqa: E402
from kmer_tpu.io.generator import (genome_reads_fasta,  # noqa: E402
                                   reference_style_fasta)
from kmer_tpu.pipeline.count import count_fasta  # noqa: E402
from kmer_tpu.utils import stagetime  # noqa: E402
from kmer_tpu.utils.linkspeed import d2h_gbps  # noqa: E402

N_READS = int(sys.argv[1]) if len(sys.argv) > 1 else 10000

MODES = [
    # label, env overrides, cfg overrides
    ("plain", {"KMER_TPU_DEVMERGE": "0"}, {}),
    ("compact", {"KMER_TPU_DEVMERGE": "0"}, {"compact": True}),
    ("devmerge", {"KMER_TPU_DEVMERGE": "1"}, {}),
]


def log(m):
    print(m, file=sys.stderr, flush=True)


def run(corpus_label, fa, cfg):
    ref = None
    for label, envs, cfg_kw in MODES:
        saved = {k: os.environ.get(k) for k in envs}
        os.environ.update(envs)
        try:
            c = cfg.replace(**cfg_kw) if cfg_kw else cfg
            out = {"corpus": corpus_label, "mode": label}
            for runlabel in ("cold", "warm"):
                st = {}
                t0 = time.perf_counter()
                with stagetime.collect(st):
                    table = count_fasta(fa, c)
                wall = time.perf_counter() - t0
                out[runlabel] = {
                    "seconds": round(wall, 3),
                    "stages": {k2: round(v, 3)
                               for k2, v in sorted(st.items())},
                }
                log(f"{corpus_label}/{label}/{runlabel}: {wall:.2f}s "
                    f"{out[runlabel]['stages']}")
            out["distinct"] = table.num_distinct
            out["total"] = int(table.total)
            if ref is None:
                ref = table
            else:
                assert table == ref, f"{label} table != plain table"
            print(json.dumps(out), flush=True)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v


def main():
    log(f"link: {d2h_gbps():.4f} GB/s; n_reads={N_READS}")
    with tempfile.TemporaryDirectory() as d:
        pool = os.path.join(d, "pool.fasta")
        with open(pool, "w") as f:
            # reference generator corpus shape at scale: records are
            # 5 x 80-mer lines drawn from a pool of 10
            f.write(reference_style_fasta(n_records=N_READS // 5,
                                          seed=7))
        genome = os.path.join(d, "genome.fasta")
        with open(genome, "w") as f:
            f.write(genome_reads_fasta(N_READS, 150,
                                       genome_len=1_000_000, seed=1))
        cfg = KmerConfig(k=21, canonical=True)
        run("pool", pool, cfg)
        run("genome", genome, cfg)


if __name__ == "__main__":
    main()
