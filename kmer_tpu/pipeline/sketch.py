"""Streaming distinct-k-mer estimation driver (ops/sketch.py).

One pass over the corpus; the (2^(b+5),) class histogram lives on
device across all batches — the host fetches it once at the end, so
peak host memory and total D2H are O(2^b) regardless of corpus size.
The reference has no estimation capability (SURVEY.md §0); this is the
ntCard-shaped capability extension.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import KmerConfig
from ..io.fasta import iter_batches, iter_parse_chunks
from ..ops.sketch import estimate_from_histogram, hll_step


def estimate_distinct_files(paths, cfg: KmerConfig | None = None, *,
                            b: int = 10, **cfg_kw):
    """Estimated number of DISTINCT k-mers (and the exact total) across
    FASTA/FASTQ files.

    Returns (estimate: float, total_kmers: int).  b is the HLL
    precision: 2^b buckets, relative error ~ 1.04/sqrt(2^b) (b=10:
    ~3.3%).  Ingest is chunked (bounded host memory); the sketch is
    accumulated on device."""
    cfg = cfg or KmerConfig(**cfg_kw)
    if cfg.gapped:
        raise ValueError("estimation applies to contiguous k-mers")
    if isinstance(paths, str):
        paths = [paths]
    hist = jnp.zeros((1 << (b + 5),), jnp.int32)
    total = 0
    for p in paths:
        for codes, offsets, _cur in iter_parse_chunks(
                p, max_bases=cfg.ingest_chunk_bases or (256 << 20),
                allow_ambiguous=cfg.skip_invalid, min_qual=cfg.min_qual):
            for batch in iter_batches(codes, offsets,
                                      batch_reads=cfg.batch_reads,
                                      max_len=cfg.max_read_len,
                                      overlap=cfg.overlap):
                hist = hll_step(jnp.asarray(batch.codes),
                                jnp.asarray(batch.lengths),
                                jnp.asarray(batch.start_limits),
                                hist, k=cfg.k, canonical=cfg.canonical,
                                b=b, mask_ambiguous=cfg.skip_invalid)
                total += int(np.maximum(
                    np.minimum(batch.lengths, batch.start_limits
                               + cfg.k - 1) - cfg.k + 1, 0).sum())
    h = np.asarray(hist)
    hashed = int(h.sum())     # valid windows actually sketched
    if not cfg.skip_invalid:
        # no masking: the sketch must have seen every extractable window
        assert hashed == total, (hashed, total)
    return estimate_from_histogram(h, b), hashed
