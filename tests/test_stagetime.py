"""Stage-time accounting (utils/stagetime): the e2e instrumentation
bench.py's end_to_end breakdown rides (VERDICT r4 #3)."""

import time

import numpy as np

from kmer_tpu import KmerConfig, count_fasta
from kmer_tpu.io.generator import random_reads_fasta
from kmer_tpu.utils import stagetime


def test_stage_accumulates_and_nests():
    out = {}
    with stagetime.collect(out):
        with stagetime.stage("a"):
            time.sleep(0.01)
        with stagetime.stage("a"):
            pass
        with stagetime.stage("b"):
            pass
    assert out["a"] >= 0.01
    assert "b" in out and out["total"] >= out["a"]
    # inactive: no collector, no keys, no error
    with stagetime.stage("c"):
        pass
    assert "c" not in out


def test_stage_iter_attributes_consumer_wait():
    def slow():
        for i in range(3):
            time.sleep(0.005)
            yield i
    out = {}
    with stagetime.collect(out):
        assert list(stagetime.stage_iter("ing", slow())) == [0, 1, 2]
    assert out["ing"] >= 0.015
    # without a collector it's a plain passthrough
    assert list(stagetime.stage_iter("ing", iter([7]))) == [7]


def test_count_fasta_stage_breakdown(tmp_path):
    """Driving count_fasta under collect() yields a breakdown whose
    stages cover most of the wall (the bench e2e contract) and does not
    change the table."""
    fa = tmp_path / "st.fasta"
    fa.write_text(random_reads_fasta(64, 120, seed=3))
    cfg = KmerConfig(k=21, batch_reads=16, max_read_len=128)
    ref = count_fasta(str(fa), cfg)
    out = {}
    with stagetime.collect(out):
        got = count_fasta(str(fa), cfg)
    assert got == ref
    expected = {"ingest", "batch_prep", "dispatch", "readback",
                "table_build", "host_merge"}
    assert expected <= set(out), sorted(out)
    assert all(v >= 0 for v in out.values())
    # stages are disjoint sections of the driver thread's wall
    assert sum(v for k, v in out.items() if k != "total") <= out["total"]


def test_count_fasta_dense_stage_breakdown(tmp_path):
    fa = tmp_path / "std.fasta"
    fa.write_text(random_reads_fasta(16, 60, seed=4))
    cfg = KmerConfig(k=6, mode="dense", batch_reads=8, max_read_len=64)
    out = {}
    with stagetime.collect(out):
        count_fasta(str(fa), cfg)
    assert "readback" in out and "ingest" in out
