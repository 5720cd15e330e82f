"""Streaming two-pass counting + checkpoint/resume (SURVEY.md §5.3-5.4,
§7.8).  The exactness bar: streaming output is bit-identical to the
in-memory path, no matter how often the run is interrupted."""

import json
import os
import tempfile

import numpy as np
import pytest

from kmer_tpu import KmerConfig, count_fasta
from kmer_tpu.io.generator import random_reads_fasta, reference_style_fasta
from kmer_tpu.pipeline.streaming import (StreamingCounter, route_partition,
                                         stream_count_fasta)
from kmer_tpu.ops.encode import key_words_from_codes


@pytest.fixture()
def tmpdir():
    with tempfile.TemporaryDirectory() as d:
        yield d


def _write(tmpdir, text, name="x.fasta"):
    p = os.path.join(tmpdir, name)
    with open(p, "w") as f:
        f.write(text)
    return p


def _cfg(**kw):
    base = dict(k=21, mode="sort", batch_reads=16, max_read_len=64,
                partitions=8)
    base.update(kw)
    return KmerConfig(**base)


def test_route_partition_monotone_and_complete():
    rng = np.random.default_rng(0)
    k = 21
    keys = np.stack([key_words_from_codes(rng.integers(0, 4, k))
                     for _ in range(500)])
    for P in (1, 2, 3, 8, 16):
        dest = route_partition(keys, k, P)
        assert dest.min() >= 0 and dest.max() < P
        # monotone: sorting keys sorts dests
        import numpy.lib.recfunctions  # noqa: F401
        be = np.ascontiguousarray(keys.astype(">u4"))
        v = be.view(np.dtype((np.void, be.shape[1] * 4))).reshape(-1)
        order = np.argsort(v)
        d_sorted = dest[order]
        assert np.all(np.diff(d_sorted) >= 0)


@pytest.mark.parametrize("k,canonical", [(21, False), (21, True), (9, False)])
def test_streaming_matches_in_memory(tmpdir, k, canonical):
    path = _write(tmpdir, random_reads_fasta(50, 70, seed=3))
    cfg = _cfg(k=k, canonical=canonical)
    want = count_fasta(path, cfg)
    got = stream_count_fasta(path, cfg, spill_dir=os.path.join(tmpdir, "sp"))
    assert got == want


def test_streaming_gapped_mode(tmpdir):
    path = _write(tmpdir, reference_style_fasta(n_records=6, seed=1))
    cfg = KmerConfig(gapped=True, mode="sort", batch_reads=8,
                     max_read_len=256, partitions=4)
    sc = StreamingCounter(path, cfg, os.path.join(tmpdir, "sp"))
    sc.run()
    table = sc.final_table()
    # oracle: brute-force gapped multiset
    from kmer_tpu.utils.oracle import oracle_gapped_lines, read_fasta_py
    from collections import Counter
    chunks = Counter(oracle_gapped_lines(read_fasta_py(path)))
    assert table.to_dict() == dict(chunks)
    assert table.total == sum(chunks.values())


def test_resume_mid_pass1(tmpdir):
    path = _write(tmpdir, random_reads_fasta(60, 70, seed=4))
    cfg = _cfg()
    want = count_fasta(path, cfg)
    sp = os.path.join(tmpdir, "sp")

    sc1 = StreamingCounter(path, cfg, sp)
    sc1.run_pass1(max_batches=2)          # interrupted mid-pass-1
    assert not sc1.state["pass1_done"]

    sc2 = StreamingCounter(path, cfg, sp)  # fresh process, same dir
    assert sc2.state["pass1_next_batch"] == 2
    sc2.run()
    assert sc2.final_table() == want


def test_resume_after_torn_append(tmpdir):
    """A crash mid-append leaves a spill file longer than the manifest
    says; resume must truncate it back and still be exact."""
    path = _write(tmpdir, random_reads_fasta(60, 70, seed=5))
    cfg = _cfg()
    want = count_fasta(path, cfg)
    sp = os.path.join(tmpdir, "sp")

    sc1 = StreamingCounter(path, cfg, sp)
    sc1.run_pass1(max_batches=1)
    # simulate torn write: garbage appended after the manifested length
    victim = os.path.join(sp, "part_00000.bin")
    with open(victim, "ab") as f:
        f.write(b"\xde\xad\xbe\xef" * 7)

    sc2 = StreamingCounter(path, cfg, sp)
    sc2.run()
    assert sc2.final_table() == want


def test_resume_mid_pass2(tmpdir):
    path = _write(tmpdir, random_reads_fasta(40, 70, seed=6))
    cfg = _cfg()
    want = count_fasta(path, cfg)
    sp = os.path.join(tmpdir, "sp")

    sc1 = StreamingCounter(path, cfg, sp)
    sc1.run_pass1()
    sc1.run_pass2()
    # wind back two partitions as if the job died mid-pass-2
    sc1.state["pass2_done"][3] = False
    sc1.state["pass2_done"][5] = False
    sc1._checkpoint()

    sc2 = StreamingCounter(path, cfg, sp)
    sc2.run()
    assert sc2.final_table() == want


def test_mismatched_config_rejected(tmpdir):
    path = _write(tmpdir, random_reads_fasta(10, 70, seed=7))
    sp = os.path.join(tmpdir, "sp")
    StreamingCounter(path, _cfg(), sp)
    with pytest.raises(ValueError, match="different run"):
        StreamingCounter(path, _cfg(k=19), sp)


def test_streaming_tsv_matches_table(tmpdir):
    import io
    path = _write(tmpdir, random_reads_fasta(30, 70, seed=8))
    cfg = _cfg()
    sc = StreamingCounter(path, cfg, os.path.join(tmpdir, "sp"))
    sc.run()
    buf = io.StringIO()
    sc.write_tsv(buf)
    buf2 = io.StringIO()
    sc.final_table().write_tsv(buf2)
    assert buf.getvalue() == buf2.getvalue()


def test_manifest_is_valid_json_at_every_step(tmpdir):
    path = _write(tmpdir, random_reads_fasta(20, 70, seed=9))
    sp = os.path.join(tmpdir, "sp")
    sc = StreamingCounter(path, _cfg(), sp)
    sc.run()
    with open(os.path.join(sp, "manifest.json")) as f:
        state = json.load(f)
    assert state["pass1_done"] and all(state["pass2_done"])


def test_partition_count_invariance(tmpdir):
    """The final table is identical for any spill partition count."""
    path = _write(tmpdir, random_reads_fasta(40, 70, seed=11))
    tables = []
    for P in (1, 4, 32):
        cfg = _cfg(partitions=P)
        t = stream_count_fasta(path, cfg,
                               spill_dir=os.path.join(tmpdir, f"sp{P}"))
        tables.append(t)
    assert tables[1] == tables[0]
    assert tables[2] == tables[0]


@pytest.mark.parametrize("shape", [(8, 1), (4, 2)])
def test_streaming_with_mesh_matches_single(tmpdir, shape):
    """Multi-chip pass 1 (distributed count step feeding the spills)
    yields the exact single-device streaming table."""
    from kmer_tpu.parallel import mesh as mesh_lib
    path = _write(tmpdir, random_reads_fasta(40, 64, seed=12))
    cfg = _cfg(batch_reads=16, max_read_len=64)
    want = stream_count_fasta(path, cfg, spill_dir=os.path.join(tmpdir, "s1"))
    m = mesh_lib.make_mesh(shape[0], shape[1])
    sc = StreamingCounter(path, cfg, os.path.join(tmpdir, f"sm{shape[0]}"),
                          mesh=m)
    sc.run()
    assert sc.final_table() == want


def test_chunked_ingest_bounded_memory(tmp_path):
    """Tiny ingest chunks: identical table, and the resume cursor in the
    manifest advances past completed chunks (no byte re-parse on
    resume)."""
    from kmer_tpu.io.generator import random_reads_fasta
    from kmer_tpu.pipeline.count import count_fasta
    from kmer_tpu.pipeline.streaming import StreamingCounter
    path = tmp_path / "chunky.fasta"
    path.write_text(random_reads_fasta(60, 90, seed=44))
    cfg = KmerConfig(k=21, batch_reads=8, max_read_len=96,
                     ingest_chunk_bases=1000, partitions=4)
    want = count_fasta(str(path), cfg.replace(ingest_chunk_bases=0))
    # one-shot count through chunked ingest
    assert count_fasta(str(path), cfg) == want
    # streaming, interrupted after every batch
    sc = StreamingCounter(str(path), cfg, str(tmp_path / "sp"))
    while not sc.state["pass1_done"]:
        sc.run_pass1(max_batches=1)
        # re-open to exercise manifest resume
        sc = StreamingCounter(str(path), cfg, str(tmp_path / "sp"))
    assert sc.state["pass1_cursor"] > 0
    sc.run_pass2()
    assert sc.final_table() == want


def test_chunked_ingest_gzip_streamed(tmp_path):
    """gzip input through the chunked native parser (no temp file)."""
    import gzip
    from kmer_tpu.io.generator import random_reads_fasta
    from kmer_tpu.pipeline.count import count_fasta
    text = random_reads_fasta(30, 80, seed=45)
    plain = tmp_path / "g.fasta"
    plain.write_text(text)
    gzp = tmp_path / "g.fasta.gz"
    with gzip.open(gzp, "wt") as f:
        f.write(text)
    cfg = KmerConfig(k=15, batch_reads=8, max_read_len=96,
                     ingest_chunk_bases=700)
    assert count_fasta(str(gzp), cfg) == count_fasta(str(plain), cfg)
