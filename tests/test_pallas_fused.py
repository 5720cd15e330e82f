"""Correctness of the fused grouped sort+run-length Pallas kernel
(ops/pallas/fused_count) against the XLA grouped_count path, interpret
mode on CPU.  Sizes kept small — interpreter cost scales with the
unrolled bitonic network."""

import numpy as np
import pytest

import jax.numpy as jnp

from kmer_tpu.ops import count as C
from kmer_tpu.ops.encode import words_per_key
from kmer_tpu.pipeline.table import KmerTable


def _aggregate(k, std, is_start, counts):
    ks = np.stack([np.asarray(w) for w in std], 1)
    cc = np.asarray(counts)
    sel = np.asarray(is_start) & (cc > 0)
    return KmerTable.from_pairs(k, ks[sel], cc[sel])


@pytest.mark.parametrize("k", [15, 21, 54])
def test_fused_kernel_matches_xla(k):
    """W = 1, 2, 4 word keys; duplicates, ties and invalid lanes."""
    rng = np.random.default_rng(k)
    n = 700
    W = words_per_key(k)
    s = 2 * k - 32 * (W - 1)
    valid = rng.random(n) < 0.85
    words = []
    for i in range(W):
        used = s if i == 0 else 32
        # tiny value range forces duplicate keys and sort-prefix ties
        w = rng.integers(0, min(1 << used, 6), n).astype(np.uint32)
        words.append(np.where(valid, w, 0xFFFFFFFF).astype(np.uint32))
    jw = [jnp.asarray(w) for w in words]
    jv = jnp.asarray(valid)

    truth = KmerTable.from_pairs(k, np.stack(words, 1)[valid],
                                 np.ones(int(valid.sum()), np.int64))
    for backend in ("xla", "pallas", "hybrid", "dedup"):
        t = _aggregate(k, *C.grouped_count(jw, jv, k, 128, backend=backend))
        assert t == truth, backend
    # sublane-axis kernel (strided-column groups): small m keeps the
    # interpreter affordable
    t = _aggregate(k, *C.grouped_count(jw, jv, k, 8, backend="pallas_t"))
    assert t == truth, "pallas_t"


@pytest.mark.parametrize("k,canon", [(21, True), (21, False), (17, True),
                                     (31, False), (25, True)])
def test_pallas_extractor_matches_xla(k, canon):
    """extract_repacked == XLA extract + canonical + repack_words,
    bit-exact, across key widths, strand-canonical modes, short reads
    and ownership limits."""
    from kmer_tpu.ops.canonical import canonical_kmer_lanes
    from kmer_tpu.ops.extract import kmer_lanes
    from kmer_tpu.ops.pallas.extract import extract_repacked
    rng = np.random.default_rng(3 * k + canon)
    B, L = 40, 80
    codes = jnp.asarray(rng.integers(0, 4, (B, L), dtype=np.uint8))
    lengths = jnp.asarray(rng.integers(0, L + 1, B, dtype=np.int32))
    limits = jnp.asarray(rng.integers(1, L + 1, B, dtype=np.int32))
    top, bot = extract_repacked(codes, lengths, limits, k, canon,
                                interpret=True)
    if canon:
        words, valid = canonical_kmer_lanes(codes, lengths, k, limits=limits)
    else:
        words, valid = kmer_lanes(codes, lengths, k, limits=limits)
    rw, nk = C.repack_words([w.reshape(-1) for w in words],
                            valid.reshape(-1), k)
    assert nk == 1
    assert (np.asarray(top).reshape(-1) == np.asarray(rw[0])).all()
    assert (np.asarray(bot).reshape(-1) == np.asarray(rw[1])).all()


def test_count_step_pallas_extract_end_to_end(tmp_path):
    """count_fasta with the Pallas extractor forced on (interpret mode)
    must match the oracle exactly."""
    import os
    from kmer_tpu import KmerConfig, count_fasta
    from kmer_tpu.io.generator import random_reads_fasta
    from kmer_tpu.utils import oracle
    p = tmp_path / "pe.fasta"
    p.write_text(random_reads_fasta(15, 70, seed=9))
    os.environ["KMER_TPU_EXTRACT"] = "pallas"
    try:
        t = count_fasta(str(p), KmerConfig(k=21, canonical=True,
                                           batch_reads=8, max_read_len=96))
    finally:
        del os.environ["KMER_TPU_EXTRACT"]
    want = oracle.oracle_count(oracle.read_fasta_py(str(p)), 21,
                               canonical=True)
    assert t.to_dict() == dict(want)


@pytest.mark.parametrize("algo", ["sort", "dedup"])
@pytest.mark.parametrize("k,canon,amb", [(21, True, False),
                                         (21, False, True),
                                         (17, True, True),
                                         (31, False, False),
                                         (11, True, False)])
def test_fused_extract_count_matches_two_stage(k, canon, amb, algo):
    """Single-kernel fused step (ops/pallas/fused_extract) == XLA
    extraction + grouped count, as aggregated tables, across key
    widths, canonical and skip-invalid modes, short reads and limits —
    for both in-segment collapse algorithms (bitonic sort+run-length
    and the all-pairs dedup)."""
    from kmer_tpu.ops.canonical import canonical_kmer_lanes
    from kmer_tpu.ops.extract import kmer_lanes
    from kmer_tpu.ops.pallas.fused_extract import fused_extract_count_T
    rng = np.random.default_rng(5 * k + 2 * canon + amb)
    B, L = 24, 60
    hi = 5 if amb else 4          # code 4 = ambiguous base
    codes = jnp.asarray(rng.integers(0, hi, (B, L), dtype=np.uint8))
    lengths = jnp.asarray(rng.integers(0, L + 1, B, dtype=np.int32))
    limits = jnp.asarray(rng.integers(1, L + 1, B, dtype=np.int32))

    rflat, counts = fused_extract_count_T(
        codes.T, lengths, limits, k, canonical=canon,
        mask_ambiguous=amb, seg=8, block_lanes=128, algo=algo,
        interpret=True)
    std = C.unpack_words(rflat, k)
    got = _aggregate(k, std, counts > 0, counts)

    if canon:
        words, valid = canonical_kmer_lanes(codes, lengths, k,
                                            limits=limits,
                                            mask_ambiguous=amb)
    else:
        words, valid = kmer_lanes(codes, lengths, k, limits=limits,
                                  mask_ambiguous=amb)
    ks = np.stack([np.asarray(w).reshape(-1) for w in words], 1)
    v = np.asarray(valid).reshape(-1)
    want = KmerTable.from_pairs(k, ks[v], np.ones(int(v.sum()), np.int64))
    assert got == want


@pytest.mark.parametrize("variant", ["mxu", "mxu8", "mxus", "mxus8"])
@pytest.mark.parametrize("k,canon,amb", [(5, True, True),
                                         (13, False, True),
                                         (21, True, False),
                                         (27, True, True),
                                         (31, True, False)])
def test_mxu_extraction_bit_equals_doubling(k, canon, amb, variant):
    """The MXU banded-matmul extraction (subword values as bf16xbf16->
    f32 systolic matmuls — exact because every 4^j weight is a power of
    two and every <=12-base subvalue < 2^24 — or the all-integer
    s8xs8->s32 variant with 4-base subwords) must be BIT-IDENTICAL to
    the doubling extraction on the raw kernel outputs, across key
    widths, canonical selection, and ambiguity masking."""
    from kmer_tpu.ops.pallas.fused_extract import fused_extract_count_T
    rng = np.random.default_rng(7 * k + 2 * canon + amb)
    B, L = 192, 73
    hi = 8 if amb else 4
    codes = jnp.asarray(rng.integers(0, hi, (L, B), dtype=np.uint8))
    lengths = jnp.asarray(rng.integers(0, L + 1, B, dtype=np.int32))
    limits = jnp.asarray(rng.integers(0, L + 1, B, dtype=np.int32))
    outs = {}
    for extract in ("doubling", variant):
        outs[extract] = fused_extract_count_T(
            codes, lengths, limits, k, canonical=canon,
            mask_ambiguous=amb, seg=4, block_lanes=128, algo="dedup",
            extract=extract, interpret=True)
    for wa, wb in zip(outs["doubling"][0], outs[variant][0]):
        np.testing.assert_array_equal(np.asarray(wa), np.asarray(wb))
    np.testing.assert_array_equal(np.asarray(outs["doubling"][1]),
                                  np.asarray(outs[variant][1]))


@pytest.mark.parametrize("variant", ["mxu", "mxu8", "mxus", "mxus8"])
@pytest.mark.parametrize("k,canon", [(33, True), (45, False), (63, True),
                                     (16, True), (32, False)])
def test_mxu_multiword_keys_match_oracle(k, canon, variant):
    """The MXU extractor lifts the fused kernel's W <= 2 cap: k >= 33
    (3- and 4-word repacked keys) and the s == 0 widths (k = 16/32,
    flag-payload residual) must match the XLA extraction oracle as
    aggregated tables, with sparse ambiguity masking exercised —
    for both the f32 and the all-integer s8 banded-matmul variants."""
    from kmer_tpu.ops.canonical import canonical_kmer_lanes
    from kmer_tpu.ops.extract import kmer_lanes
    from kmer_tpu.ops.pallas.fused_extract import fused_extract_count_T
    rng = np.random.default_rng(17 * k + canon)
    B, L = 96, 96
    codes = rng.integers(0, 4, (B, L), dtype=np.uint8)
    m = rng.random((B, L)) < 0.02
    codes = np.where(m, rng.integers(4, 8, (B, L), dtype=np.uint8), codes)
    codes = jnp.asarray(codes)
    lengths = jnp.asarray(rng.integers(0, L + 1, B, dtype=np.int32))
    limits = jnp.asarray(rng.integers(0, L + 1, B, dtype=np.int32))
    rflat, counts = fused_extract_count_T(
        codes.T, lengths, limits, k, canonical=canon,
        mask_ambiguous=True, seg=4, block_lanes=128, algo="dedup",
        extract=variant, interpret=True)
    got = _aggregate(k, C.unpack_words(rflat, k), counts > 0, counts)
    fn = canonical_kmer_lanes if canon else kmer_lanes
    words, valid = fn(codes, lengths, k, limits=limits,
                      mask_ambiguous=True)
    ks = np.stack([np.asarray(w).reshape(-1) for w in words], 1)
    v = np.asarray(valid).reshape(-1)
    want = KmerTable.from_pairs(k, ks[v], np.ones(int(v.sum()), np.int64))
    assert got == want
    assert got.num_distinct > 0


def test_mxu_fits_guard_and_fallback(monkeypatch):
    """mxu_fits bounds the VMEM-resident weights/accumulator; a
    requested-but-unfit mxu extraction falls back (doubling for W<=2,
    XLA for wide keys) and still matches the oracle."""
    from kmer_tpu.ops.canonical import canonical_kmer_lanes
    from kmer_tpu.ops.pallas.fused_extract import mxu_fits
    from kmer_tpu.pipeline.count import count_step_sort
    assert mxu_fits(21, 150, True, False)
    assert mxu_fits(63, 96, True, True)
    assert not mxu_fits(63, 4096, True, True)
    assert not mxu_fits(21, 65536, True, False)
    monkeypatch.setenv("KMER_TPU_FUSED_EXTRACT", "mxu")
    monkeypatch.setenv("KMER_TPU_STEP", "fused")
    rng = np.random.default_rng(4)
    B, L, k = 2, 4096, 63                  # unfit -> XLA path (W=4)
    codes = jnp.asarray(rng.integers(0, 4, (B, L), dtype=np.uint8))
    lengths = jnp.full((B,), L, jnp.int32)
    limits = jnp.full((B,), L, jnp.int32)
    s, is_start, counts = count_step_sort(codes, lengths, limits, k=k,
                                          canonical=True, group_keys=256)
    ks = np.stack([np.asarray(w).reshape(-1) for w in s], 1)
    c = np.asarray(counts).reshape(-1)
    sel = np.asarray(is_start).reshape(-1) & (c > 0)
    got = KmerTable.from_pairs(k, ks[sel], c[sel].astype(np.int64))
    words, valid = canonical_kmer_lanes(codes, lengths, k, limits=limits)
    kk = np.stack([np.asarray(w).reshape(-1) for w in words], 1)
    v = np.asarray(valid).reshape(-1)
    want = KmerTable.from_pairs(k, kk[v], np.ones(int(v.sum()), np.int64))
    assert got == want


@pytest.mark.parametrize("llen,rlen,cmin,cmax,L,amb", [
    (27, 27, 80, 140, 150, False),
    (27, 27, 80, 100, 120, True),
    (13, 9, 30, 40, 64, False),
])
def test_gapped_mxu_tables_bit_equal_doubling(llen, rlen, cmin, cmax, L,
                                              amb, monkeypatch):
    """Gapped fused kernel with MXU sub-key tables == doubling tables,
    bit-identical raw outputs (same exactness argument as the
    contiguous MXU path; gapped adds the distinct-L/R-table case)."""
    from kmer_tpu.ops.pallas import fused_gapped as fg
    rng = np.random.default_rng(13 * llen + rlen + amb)
    B = 160
    hi = 8 if amb else 4
    codes = jnp.asarray(rng.integers(0, hi, (L, B), dtype=np.uint8))
    lengths = jnp.asarray(rng.integers(0, L + 1, B, dtype=np.int32))
    limits = jnp.asarray(rng.integers(0, L + 1, B, dtype=np.int32))
    outs = {}
    for algo in ("doubling", "mxu"):
        monkeypatch.setenv("KMER_TPU_FUSED_EXTRACT", algo)
        outs[algo] = fg.fused_gapped_count_T(
            codes, lengths, limits, l_len=llen, r_len=rlen,
            c_min=cmin, c_max=cmax, mask_ambiguous=amb, seg=4,
            block_lanes=128, algo="dedup", interpret=True)
    for wa, wb in zip(outs["doubling"][0], outs["mxu"][0]):
        np.testing.assert_array_equal(np.asarray(wa), np.asarray(wb))
    np.testing.assert_array_equal(np.asarray(outs["doubling"][1]),
                                  np.asarray(outs["mxu"][1]))


def test_count_step_fused_path_end_to_end(tmp_path):
    """Full fused single-kernel path (KMER_TPU_STEP=fused), interpret
    mode, vs the oracle."""
    import os
    from kmer_tpu import KmerConfig, count_fasta
    from kmer_tpu.io.generator import reference_style_fasta
    from kmer_tpu.utils import oracle
    p = tmp_path / "fp.fasta"
    p.write_text(reference_style_fasta(n_records=3, seed=47))
    os.environ["KMER_TPU_STEP"] = "fused"
    os.environ["KMER_TPU_T_M"] = "8"
    try:
        for k, canon in ((21, True), (11, False)):
            t = count_fasta(str(p), KmerConfig(k=k, canonical=canon,
                                               batch_reads=8,
                                               max_read_len=128,
                                               sort_group_keys=16))
            want = oracle.oracle_count(oracle.read_fasta_py(str(p)), k,
                                       canonical=canon)
            assert t.to_dict() == dict(want), k
    finally:
        del os.environ["KMER_TPU_STEP"]
        del os.environ["KMER_TPU_T_M"]


def test_count_step_transposed_path_end_to_end(tmp_path):
    """Full transposed fast path (KMER_TPU_STEP=t): extraction along
    sublanes + pallas_t kernel, interpret mode, vs the oracle."""
    import os
    from kmer_tpu import KmerConfig, count_fasta
    from kmer_tpu.io.generator import reference_style_fasta
    from kmer_tpu.utils import oracle
    p = tmp_path / "tp.fasta"
    p.write_text(reference_style_fasta(n_records=3, seed=31))
    os.environ["KMER_TPU_STEP"] = "t"
    try:
        for k, canon in ((21, True), (11, False)):
            t = count_fasta(str(p), KmerConfig(k=k, canonical=canon,
                                               batch_reads=8,
                                               max_read_len=128,
                                               sort_group_keys=16))
            want = oracle.oracle_count(oracle.read_fasta_py(str(p)), k,
                                       canonical=canon)
            assert t.to_dict() == dict(want), k
    finally:
        del os.environ["KMER_TPU_STEP"]


@pytest.mark.parametrize("algo", ["dedup", "sort"])
@pytest.mark.parametrize("llen,rlen,cmin,cmax,L,amb", [
    (5, 5, 12, 20, 40, False),      # W=2 keys, c range partly > L
    (5, 3, 10, 14, 32, True),       # asymmetric windows + ambiguity
    (27, 27, 54, 60, 80, False),    # reference window shape, W=4 keys
])
def test_fused_gapped_matches_xla(llen, rlen, cmin, cmax, L, amb, algo):
    """Fused gapped kernel (ops/pallas/fused_gapped) == XLA gapped
    extraction + grouped count, as aggregated tables: short reads,
    limits, ambiguity masks, both collapse algorithms."""
    from kmer_tpu.ops.extract import gapped_lanes
    from kmer_tpu.ops.pallas.fused_gapped import fused_gapped_count_T
    rng = np.random.default_rng(llen * 100 + cmin + amb)
    B = 10
    hi = 5 if amb else 4
    codes = jnp.asarray(rng.integers(0, hi, (B, L), dtype=np.uint8))
    lengths = jnp.asarray(rng.integers(0, L + 1, B, dtype=np.int32))
    limits = jnp.asarray(rng.integers(1, L + 1, B, dtype=np.int32))
    nb = llen + rlen

    rflat, counts = fused_gapped_count_T(
        codes.T, lengths, limits, l_len=llen, r_len=rlen, c_min=cmin,
        c_max=cmax, mask_ambiguous=amb, seg=8, block_lanes=128,
        algo=algo, interpret=True)
    std = C.unpack_words(rflat, nb)
    got = _aggregate(nb, std, counts > 0, counts)

    words, valid = gapped_lanes(codes, lengths, llen, rlen, c_min=cmin,
                                c_max=cmax, limits=limits,
                                mask_ambiguous=amb)
    ks = np.stack([np.asarray(w).reshape(-1) for w in words], 1)
    v = np.asarray(valid).reshape(-1)
    want = KmerTable.from_pairs(nb, ks[v], np.ones(int(v.sum()), np.int64))
    assert got == want


def test_gapped_fused_path_end_to_end(tmp_path):
    """Full fused gapped path (KMER_TPU_GAPPED_STEP=fused), interpret
    mode, vs the gapped oracle."""
    import os
    from collections import Counter
    from kmer_tpu import KmerConfig, count_fasta
    from kmer_tpu.io.generator import reference_style_fasta
    from kmer_tpu.utils import oracle
    p = tmp_path / "gf.fasta"
    p.write_text(reference_style_fasta(n_records=3, seed=77))
    os.environ["KMER_TPU_GAPPED_STEP"] = "fused"
    try:
        t = count_fasta(str(p), KmerConfig(gapped=True, mode="sort",
                                           batch_reads=8,
                                           max_read_len=512,
                                           sort_group_keys=64))
    finally:
        del os.environ["KMER_TPU_GAPPED_STEP"]
    want = Counter(oracle.oracle_gapped_lines(oracle.read_fasta_py(str(p))))
    assert t.to_dict() == dict(want)


def test_gapped_fused_compact_end_to_end(tmp_path):
    """Fused gapped kernel feeding on-device compaction
    (KMER_TPU_GAPPED_STEP=fused + compact=True), interpret mode, vs the
    uncompacted table."""
    import os
    from kmer_tpu import KmerConfig, count_fasta
    from kmer_tpu.io.generator import reference_style_fasta
    p = tmp_path / "gfc.fasta"
    p.write_text(reference_style_fasta(n_records=3, seed=78))
    base = KmerConfig(gapped=True, c_min=56, c_max=64, batch_reads=8,
                      max_read_len=512)
    want = count_fasta(str(p), base)
    os.environ["KMER_TPU_GAPPED_STEP"] = "fused"
    try:
        got = count_fasta(str(p), base.replace(compact=True))
        got_sort = count_fasta(str(p), base)
    finally:
        del os.environ["KMER_TPU_GAPPED_STEP"]
    assert got == want
    assert got_sort == want


def test_select_fused_extract_policy(monkeypatch):
    """The shared backend policy (select_fused_extract): auto picks
    doubling for W=1, per-chunk mxu for W=2 with a residual word, and
    the shared-band mxus for wide keys + the s==0 widths (r4 sweeps);
    forced doubling stays the escape hatch to the XLA path for wide
    keys; a forced-but-unfit variant downgrades."""
    from kmer_tpu.ops.pallas.fused_extract import select_fused_extract
    monkeypatch.delenv("KMER_TPU_FUSED_EXTRACT", raising=False)
    # W=1: doubling (parity within noise, simpler integer path)
    assert select_fused_extract(13, 150, True) == "doubling"
    # W=2 with residual: per-chunk mxu (r3/r4 alternated-sweep winner)
    assert select_fused_extract(21, 150, True) == "mxu"
    assert select_fused_extract(31, 150, True) == "mxu"
    # unfit W<=2 falls back to doubling
    assert select_fused_extract(21, 65536, True) == "doubling"
    # wide keys + s==0 widths: shared-band tables (r4: ~15% at k=45)
    assert select_fused_extract(33, 150, True) == "mxus"
    assert select_fused_extract(63, 96, True, True) == "mxus"
    assert select_fused_extract(16, 150, True) == "mxus"
    assert select_fused_extract(32, 150, True) == "mxus"
    # unfit -> None (XLA fallback)
    assert select_fused_extract(63, 8192, True, True) is None
    monkeypatch.setenv("KMER_TPU_FUSED_EXTRACT", "doubling")
    assert select_fused_extract(21, 150, True) == "doubling"
    assert select_fused_extract(33, 150, True) is None
    monkeypatch.setenv("KMER_TPU_FUSED_EXTRACT", "mxu")
    assert select_fused_extract(33, 150, True) == "mxu"
    assert select_fused_extract(21, 65536, True) == "doubling"
    assert select_fused_extract(63, 8192, True, True) is None
    monkeypatch.setenv("KMER_TPU_FUSED_EXTRACT", "mxus8")
    assert select_fused_extract(45, 150, True) == "mxus8"


def test_auto_policy_multiword_end_to_end(tmp_path):
    """Default env (auto): k=45 counting runs the fused mxu kernel in
    interpret mode and matches the XLA-forced table bit-exactly."""
    import os
    from kmer_tpu import KmerConfig, count_fasta
    from kmer_tpu.io.generator import random_reads_fasta
    p = tmp_path / "bigk.fasta"
    p.write_text(random_reads_fasta(6, 120, seed=11))
    cfg = KmerConfig(k=45, canonical=True, batch_reads=8,
                     max_read_len=128, sort_group_keys=64)
    os.environ["KMER_TPU_STEP"] = "fused"
    try:
        got = count_fasta(str(p), cfg)
    finally:
        del os.environ["KMER_TPU_STEP"]
    os.environ["KMER_TPU_FUSED_EXTRACT"] = "doubling"   # -> XLA path
    try:
        # different batch shape => different trace: the env re-routing
        # happens at trace time, so reusing cfg would hit the jit cache
        # of the mxu run and compare it with itself
        want = count_fasta(str(p), cfg.replace(batch_reads=12))
    finally:
        del os.environ["KMER_TPU_FUSED_EXTRACT"]
    assert got == want


def test_mxu8_spaced_bit_equals_mxu():
    """Spaced-seed extraction through the all-integer s8 variant is
    bit-identical to the f32 banded-matmul variant (same zeroed-band
    algebra, different accumulator)."""
    from kmer_tpu.ops.extract import parse_seed_mask
    from kmer_tpu.ops.pallas.fused_extract import fused_extract_count_T
    rng = np.random.default_rng(99)
    B, L = 128, 64
    mask = "110101011"
    positions = parse_seed_mask(mask)
    codes = jnp.asarray(rng.integers(0, 8, (L, B), dtype=np.uint8))
    lengths = jnp.asarray(rng.integers(0, L + 1, B, dtype=np.int32))
    limits = jnp.asarray(rng.integers(0, L + 1, B, dtype=np.int32))
    outs = {}
    for extract in ("mxu", "mxu8"):
        outs[extract] = fused_extract_count_T(
            codes, lengths, limits, len(positions), canonical=True,
            mask_ambiguous=True, seg=2, block_lanes=128, algo="dedup",
            extract=extract, positions=positions, interpret=True)
    for wa, wb in zip(outs["mxu"][0], outs["mxu8"][0]):
        np.testing.assert_array_equal(np.asarray(wa), np.asarray(wb))
    np.testing.assert_array_equal(np.asarray(outs["mxu"][1]),
                                  np.asarray(outs["mxu8"][1]))
