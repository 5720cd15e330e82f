"""N/IUPAC tolerance mode (KmerConfig.skip_invalid): ambiguous bases
are accepted by the parser and every window containing one is dropped;
strict mode keeps the reference's non-ACGT error contract."""

import os
import tempfile

import numpy as np
import pytest

from kmer_tpu import KmerConfig, count_fasta
from kmer_tpu.io import fasta
from kmer_tpu.ops.encode import AMBIG_CODE, InvalidBaseError, encode_seq
from kmer_tpu.pipeline.streaming import stream_count_fasta
from kmer_tpu.utils import oracle


@pytest.fixture()
def tmpdir():
    with tempfile.TemporaryDirectory() as d:
        yield d


def _write(tmpdir, text, name="x.fasta"):
    p = os.path.join(tmpdir, name)
    with open(p, "w") as f:
        f.write(text)
    return p


FASTA_N = """>r1
ACGTNACGTACGTTACGACGTNAC
>r2
NNACGTACGTGGGTTTACGTACGT
>r3
ACGTRYACGTACGTACGTWACGTA
"""


def test_strict_mode_rejects_n(tmpdir):
    p = _write(tmpdir, FASTA_N)
    with pytest.raises(InvalidBaseError):
        count_fasta(p, KmerConfig(k=5, batch_reads=8, max_read_len=32))


def test_encode_seq_modes():
    with pytest.raises(InvalidBaseError):
        encode_seq("ACGN")
    codes = encode_seq("ACGN", allow_ambiguous=True)
    assert codes[-1] == AMBIG_CODE
    with pytest.raises(InvalidBaseError):
        encode_seq("ACG!", allow_ambiguous=True)


def test_parsers_agree_with_ambiguous(tmpdir):
    p = _write(tmpdir, FASTA_N)
    c1, o1 = fasta.parse_fasta_native(p, allow_ambiguous=True)
    c2, o2 = fasta.parse_fasta_numpy(p, allow_ambiguous=True)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(o1, o2)
    assert (c1 == AMBIG_CODE).sum() == 7   # 2+2 Ns + R,Y,W

    with pytest.raises(InvalidBaseError):
        fasta.parse_fasta_native(p, allow_ambiguous=False)


@pytest.mark.parametrize("k,canonical,mode", [
    (5, False, "sort"), (5, True, "sort"), (5, False, "dense"),
    (11, False, "sort"),
])
def test_skip_invalid_matches_oracle(tmpdir, k, canonical, mode):
    p = _write(tmpdir, FASTA_N)
    cfg = KmerConfig(k=k, canonical=canonical, mode=mode, batch_reads=8,
                     max_read_len=32, skip_invalid=True)
    table = count_fasta(p, cfg)
    want = oracle.oracle_count(oracle.read_fasta_py(p), k, canonical,
                               skip_invalid=True)
    assert table.to_dict() == dict(want)
    assert all("N" not in km and "R" not in km for km in table.to_dict())


def test_skip_invalid_streaming(tmpdir):
    p = _write(tmpdir, FASTA_N * 4)
    cfg = KmerConfig(k=7, mode="sort", batch_reads=8, max_read_len=32,
                     partitions=4, skip_invalid=True)
    got = stream_count_fasta(p, cfg, spill_dir=os.path.join(tmpdir, "sp"))
    want = oracle.oracle_count(oracle.read_fasta_py(p), 7,
                               skip_invalid=True)
    assert got.to_dict() == dict(want)


def test_skip_invalid_across_segment_seams(tmpdir):
    """An N near a host segmentation seam must not leak windows."""
    seq = "ACGT" * 20 + "N" + "ACGT" * 20
    p = _write(tmpdir, f">long\n{seq}\n")
    cfg = KmerConfig(k=9, batch_reads=4, max_read_len=32, skip_invalid=True)
    table = count_fasta(p, cfg)
    want = oracle.oracle_count([seq], 9, skip_invalid=True)
    assert table.to_dict() == dict(want)


@pytest.mark.parametrize("shape", [(8, 1), (4, 2)])
def test_skip_invalid_distributed(shape):
    """skip_invalid must flow through the mesh path (it was silently
    dropped once: N encoded as 'A' and counted)."""
    import jax.numpy as jnp
    from kmer_tpu.ops.encode import encode_seq
    from kmer_tpu.parallel import distributed, mesh as mesh_lib
    rng = np.random.default_rng(0)
    B, L, k = 8, 64, 9
    seqs = []
    for _ in range(B):
        s = "".join("ACGT"[c] for c in rng.integers(0, 4, L))
        pos = int(rng.integers(0, L))
        s = s[:pos] + "N" + s[pos + 1:]
        seqs.append(s)
    codes = np.stack([encode_seq(s, allow_ambiguous=True) for s in seqs])
    lens = np.full((B,), L, np.int32)
    lims = np.full((B,), L, np.int32)
    m = mesh_lib.make_mesh(shape[0], shape[1])
    fn = distributed.make_distributed_count(m, k=k, mask_ambiguous=True)
    from kmer_tpu import KmerTable
    s_, st, cnt, ov = fn(jnp.asarray(codes), jnp.asarray(lens),
                         jnp.asarray(lims))
    assert not bool(ov)
    table = KmerTable.from_device_runs(k, s_, st, cnt)
    want = oracle.oracle_count(seqs, k, skip_invalid=True)
    assert table.to_dict() == dict(want)


def test_skip_invalid_streaming_with_mesh(tmpdir):
    from kmer_tpu.parallel import mesh as mesh_lib
    from kmer_tpu.pipeline.streaming import StreamingCounter
    path = _write(tmpdir, FASTA_N * 3)
    cfg = KmerConfig(k=7, mode="sort", batch_reads=8, max_read_len=32,
                     partitions=4, skip_invalid=True)
    m = mesh_lib.make_mesh(8, 1)
    sc = StreamingCounter(path, cfg, os.path.join(tmpdir, "spm"), mesh=m)
    sc.run()
    want = oracle.oracle_count(oracle.read_fasta_py(path), 7,
                               skip_invalid=True)
    assert sc.final_table().to_dict() == dict(want)


def test_skip_invalid_dense_distributed():
    import jax.numpy as jnp
    from kmer_tpu import KmerTable
    from kmer_tpu.ops.encode import encode_seq
    from kmer_tpu.parallel import distributed, mesh as mesh_lib
    rng = np.random.default_rng(1)
    B, L, k = 8, 48, 6
    seqs = []
    for _ in range(B):
        s = "".join("ACGT"[c] for c in rng.integers(0, 4, L))
        s = s[:10] + "N" + s[11:]
        seqs.append(s)
    codes = np.stack([encode_seq(s, allow_ambiguous=True) for s in seqs])
    lens = np.full((B,), L, np.int32)
    lims = np.full((B,), L, np.int32)
    m = mesh_lib.make_mesh(8, 1)
    fn = distributed.make_distributed_dense(m, k=k, mask_ambiguous=True)
    hist = np.asarray(fn(jnp.asarray(codes), jnp.asarray(lens),
                         jnp.asarray(lims)))
    table = KmerTable.from_dense(hist, k)
    want = oracle.oracle_count(seqs, k, skip_invalid=True)
    assert table.to_dict() == dict(want)
