import jax.numpy as jnp
import numpy as np
import pytest

from kmer_tpu.ops import encode, extract
from kmer_tpu.ops.canonical import canonical_kmer_lanes
from kmer_tpu.utils import oracle


def _random_reads(rng, n, lmin, lmax):
    return ["".join(encode.BASE_ORDER[c] for c in rng.integers(0, 4, rng.integers(lmin, lmax + 1)))
            for _ in range(n)]


def _batchify(seqs, L):
    B = len(seqs)
    codes = np.zeros((B, L), np.uint8)
    lens = np.zeros((B,), np.int32)
    for i, s in enumerate(seqs):
        c = encode.encode_seq(s)
        codes[i, : len(c)] = c
        lens[i] = len(c)
    return jnp.asarray(codes), jnp.asarray(lens)


def _lanes_to_strings(words, valid, k):
    wn = [np.asarray(w) for w in words]
    v = np.asarray(valid)
    keys = np.stack([w[v] for w in wn], axis=-1)
    return encode.decode_key_words(keys, k)


@pytest.mark.parametrize("k", [3, 15, 16, 21, 31])
def test_kmer_lanes_match_oracle(k):
    rng = np.random.default_rng(42 + k)
    seqs = _random_reads(rng, 6, k - 2, 40)  # includes reads shorter than k
    codes, lens = _batchify(seqs, 40)
    words, valid = extract.kmer_lanes(codes, lens, k)
    got = _lanes_to_strings(words, valid, k)
    want = [m for s in seqs for m in oracle.oracle_kmers(s, k)]
    assert sorted(got) == sorted(want)


def test_kmer_lanes_row_order():
    # lanes of row b, position p correspond to seq[b][p:p+k]
    k = 4
    seqs = ["ACGTACGT", "TTTTAAAA"]
    codes, lens = _batchify(seqs, 8)
    words, valid = extract.kmer_lanes(codes, lens, k)
    v = np.asarray(valid)
    assert v.all()
    for b, s in enumerate(seqs):
        keys = np.stack([np.asarray(w)[b] for w in words], axis=-1)
        assert encode.decode_key_words(keys, k) == oracle.oracle_kmers(s, k)


def test_sentinel_on_invalid_lanes():
    k = 5
    seqs = ["ACGTACG"]  # len 7 -> 3 valid lanes of P=4... L=8 -> P=4
    codes, lens = _batchify(seqs, 8)
    words, valid = extract.kmer_lanes(codes, lens, k)
    v = np.asarray(valid)[0]
    assert v.tolist() == [True, True, True, False]
    for w in words:
        assert np.asarray(w)[0, ~v].min(initial=0xFFFFFFFF) == 0xFFFFFFFF


def test_start_limits_mask():
    k = 3
    seqs = ["ACGTACGTAC"]
    codes, lens = _batchify(seqs, 10)
    limits = jnp.asarray(np.array([4], np.int32))
    words, valid = extract.kmer_lanes(codes, lens, k, limits=limits)
    got = _lanes_to_strings(words, valid, k)
    assert got == oracle.oracle_kmers(seqs[0], k)[:4]


@pytest.mark.parametrize("k", [5, 16, 21])
def test_rc_lanes_match_oracle(k):
    rng = np.random.default_rng(7 + k)
    seqs = _random_reads(rng, 4, k, 35)
    codes, lens = _batchify(seqs, 35)
    words, valid = extract.rc_kmer_lanes(codes, lens, k)
    got = _lanes_to_strings(words, valid, k)
    want = [encode.revcomp_str(m) for s in seqs for m in oracle.oracle_kmers(s, k)]
    assert sorted(got) == sorted(want)


@pytest.mark.parametrize("k", [5, 21, 31])
def test_canonical_lanes_match_oracle(k):
    rng = np.random.default_rng(11 + k)
    seqs = _random_reads(rng, 5, k, 40)
    codes, lens = _batchify(seqs, 40)
    words, valid = canonical_kmer_lanes(codes, lens, k)
    got = _lanes_to_strings(words, valid, k)
    want = [m for s in seqs for m in oracle.oracle_kmers(s, k, canonical=True)]
    assert sorted(got) == sorted(want)


def test_gapped_lanes_match_oracle_small():
    # small window params so the test is fast but exercises the combine
    rng = np.random.default_rng(3)
    seqs = _random_reads(rng, 4, 70, 120)
    codes, lens = _batchify(seqs, 120)
    words, valid = extract.gapped_lanes(codes, lens)
    got = _lanes_to_strings(words, valid, 54)
    want = oracle.oracle_gapped_lines(seqs)
    assert sorted(got) == sorted(want)


def test_gapped_lanes_short_reads_emit_nothing():
    seqs = ["ACGT" * 19]  # 76 bp < c_min=80
    codes, lens = _batchify(seqs, 80)
    words, valid = extract.gapped_lanes(codes, lens)
    assert not np.asarray(valid).any()


def test_gapped_lanes_exact_80bp_one_chunk():
    rng = np.random.default_rng(9)
    s = "".join(encode.BASE_ORDER[c] for c in rng.integers(0, 4, 80))
    codes, lens = _batchify([s], 80)
    words, valid = extract.gapped_lanes(codes, lens)
    got = _lanes_to_strings(words, valid, 54)
    assert got == [s[:27] + s[-27:]]
