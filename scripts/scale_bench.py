#!/usr/bin/env python3
"""Production-scale end-to-end run: 1 M genome-coverage reads (~165 MB
FASTA) through the full count_fasta pipeline on real hardware, with
per-stage wall attribution (utils/stagetime).

The corpus is the realistic k-mer workload shape (io/generator
.genome_reads_fasta): reads sampled with reverse-complement strands and
substitution errors from one genome, so the distinct table is genome-
sized (~10 M keys) while total k-mers are coverage-sized (~130 M) —
exactly the regime the device-resident table (ops/devmerge) was built
for on slow links, and the regime where per-batch readback pipelines
dominate on fast ones.

Emits one JSON line per run (cold, then warm in the same process).

Usage: python scripts/scale_bench.py [--reads 1000000] [--genome 10000000]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")
from kmer_tpu.utils.jaxcache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=1_000_000)
    ap.add_argument("--genome", type=int, default=10_000_000)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--error-rate", type=float, default=0.002)
    ap.add_argument("--k", type=int, default=21)
    args = ap.parse_args()

    import jax

    from kmer_tpu import KmerConfig, count_fasta
    from kmer_tpu.io.generator import genome_reads_fasta
    from kmer_tpu.utils import stagetime
    from kmer_tpu.utils.linkspeed import d2h_gbps

    print(f"# device={jax.devices()[0]}", file=sys.stderr, flush=True)
    cfg = KmerConfig(k=args.k, canonical=True)

    with tempfile.TemporaryDirectory() as d:
        fa = os.path.join(d, "scale.fasta")
        t0 = time.perf_counter()
        with open(fa, "w") as f:
            f.write(genome_reads_fasta(args.reads, args.read_len,
                                       genome_len=args.genome, seed=5,
                                       error_rate=args.error_rate))
        gen_s = time.perf_counter() - t0
        sz = os.path.getsize(fa)
        print(f"# corpus {sz / 1e6:.0f} MB in {gen_s:.1f}s",
              file=sys.stderr, flush=True)
        link = d2h_gbps()
        for label in ("cold", "warm"):
            st = {}
            t0 = time.perf_counter()
            with stagetime.collect(st):
                table = count_fasta(fa, cfg)
            wall = time.perf_counter() - t0
            total = int(table.counts.sum())
            print(json.dumps({
                "run": label,
                "reads": args.reads,
                "corpus_mb": round(sz / 1e6, 1),
                "k": args.k,
                "secs": round(wall, 2),
                "stages": {k2: round(v, 2) for k2, v in sorted(st.items())},
                "total_kmers": total,
                "distinct": table.num_distinct,
                "reads_per_sec": round(args.reads / wall),
                "kmers_per_sec": round(total / wall),
                "bases_per_sec": round(args.reads * args.read_len / wall),
                "d2h_link_gbps": round(link, 4),
            }), flush=True)


if __name__ == "__main__":
    main()
