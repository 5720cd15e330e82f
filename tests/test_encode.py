import numpy as np
import pytest

from kmer_tpu.ops import encode


def test_base_order_matches_ascii():
    # A<C<G<T in ASCII == code order — load-bearing for sort parity.
    assert [encode.BASE_ORDER[i] for i in range(4)] == sorted("ACGT")


def test_encode_decode_roundtrip():
    s = "ACGTTGCAACGT"
    codes = encode.encode_seq(s)
    assert codes.dtype == np.uint8
    assert encode.decode_codes(codes) == s


def test_encode_lowercase():
    assert encode.decode_codes(encode.encode_seq("acgt")) == "ACGT"


def test_encode_invalid_base():
    with pytest.raises(encode.InvalidBaseError):
        encode.encode_seq("ACGNT")


def test_words_per_key():
    # 2k+1 bits: k=15 -> 31 bits -> 1 word; k=16 -> 33 -> 2; k=27 -> 55 -> 2
    assert encode.words_per_key(15) == 1
    assert encode.words_per_key(16) == 2
    assert encode.words_per_key(27) == 2
    assert encode.words_per_key(54) == 4


@pytest.mark.parametrize("k", [1, 4, 15, 16, 21, 27, 31, 32, 54])
def test_key_words_roundtrip(k):
    rng = np.random.default_rng(k)
    codes = rng.integers(0, 4, k, dtype=np.uint8)
    words = encode.key_words_from_codes(codes)
    back = encode.codes_from_key_words(words, k)
    np.testing.assert_array_equal(back, codes)


def test_key_order_matches_string_order():
    # integer order on key words == lexicographic order on strings
    rng = np.random.default_rng(0)
    k = 21
    seqs = ["".join(encode.BASE_ORDER[c] for c in rng.integers(0, 4, k))
            for _ in range(200)]
    keys = [tuple(int(w) for w in encode.key_words_from_codes(encode.encode_seq(s)))
            for s in seqs]
    assert sorted(range(200), key=lambda i: keys[i]) == \
           sorted(range(200), key=lambda i: seqs[i])


def test_decode_key_words_to_lines():
    k = 5
    seqs = ["ACGTA", "TTTTT", "AAAAA"]
    words = np.stack([encode.key_words_from_codes(encode.encode_seq(s)) for s in seqs])
    raw = encode.decode_key_words_to_lines(words, k)
    assert raw == b"ACGTA\nTTTTT\nAAAAA\n"


def test_revcomp():
    assert encode.revcomp_str("ACGT") == "ACGT"
    assert encode.revcomp_str("AACG") == "CGTT"


def test_revcomp_words_matches_slice_extraction():
    """revcomp_words (bit-trick RC from the forward key) must equal the
    slice-sum RC extraction for every key width class."""
    import jax.numpy as jnp
    from kmer_tpu.ops.canonical import revcomp_words
    from kmer_tpu.ops.extract import kmer_lanes, rc_kmer_lanes
    rng = np.random.default_rng(1)
    for k in (5, 15, 16, 21, 31, 32, 33, 54, 63):
        B, L = 6, 70
        codes = jnp.asarray(rng.integers(0, 4, (B, L), dtype=np.uint8))
        lengths = jnp.asarray(rng.integers(0, L + 1, B, dtype=np.int32))
        fwd, _ = kmer_lanes(codes, lengths, k, sentinel=False)
        want, _ = rc_kmer_lanes(codes, lengths, k, sentinel=False)
        got = revcomp_words(fwd, k)
        for a, b in zip(got, want):
            assert (np.asarray(a) == np.asarray(b)).all(), k
