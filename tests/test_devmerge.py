"""Device-resident sorted-table accumulation (ops/devmerge)."""

import numpy as np
import pytest

from kmer_tpu.ops import devmerge


def _merge_np(table: dict, keys, counts):
    for k, c in zip(keys, counts):
        if c > 0:
            table[tuple(k)] = table.get(tuple(k), 0) + int(c)
    return table


def _as_batch(keys_2d, counts, W):
    words = [np.ascontiguousarray(keys_2d[:, i]) for i in range(W)]
    return words, np.asarray(counts, np.int32)


@pytest.mark.parametrize("W", [1, 2, 3])
def test_merge_batches_equal_oracle(W):
    rng = np.random.default_rng(W)
    C = 1 << 12
    words, counts = devmerge.empty_state(C, W)
    oracle: dict = {}
    for batch in range(4):
        n = int(rng.integers(500, 1500))
        keys = rng.integers(0, 50, (n, W)).astype(np.uint32)
        cts = rng.integers(0, 4, n).astype(np.int32)   # some dead (0)
        words, counts, d = devmerge.merge_batch(
            words, counts, *_as_batch(keys, cts, W))
        _merge_np(oracle, keys, cts)
        assert int(d) == len(oracle)
    k, c = devmerge.fetch_state(words, counts, int(d))
    got = {tuple(row): int(cc) for row, cc in zip(k, c)}
    assert got == {k2: v for k2, v in oracle.items()}
    # sorted unique ascending, lexicographic on words
    as_tuples = [tuple(int(x) for x in row) for row in k]
    assert as_tuples == sorted(as_tuples)


def test_merge_all_dead_and_empty_fetch():
    W = 2
    words, counts = devmerge.empty_state(256, W)
    keys = np.full((64, W), 7, np.uint32)
    cts = np.zeros(64, np.int32)
    words, counts, d = devmerge.merge_batch(
        words, counts, *_as_batch(keys, cts, W))
    assert int(d) == 0
    k, c = devmerge.fetch_state(words, counts, 0)
    assert k.shape == (0, W) and c.shape == (0,)


def test_merge_counts_accumulate_across_batches():
    W = 1
    words, counts = devmerge.empty_state(128, W)
    keys = np.array([[3], [3], [9]], np.uint32)
    cts = np.array([2, 5, 1], np.int32)
    words, counts, d = devmerge.merge_batch(
        words, counts, *_as_batch(keys, cts, W))
    words, counts, d = devmerge.merge_batch(
        words, counts, *_as_batch(keys, cts, W))
    k, c = devmerge.fetch_state(words, counts, int(d))
    assert k.tolist() == [[3], [9]]
    assert c.tolist() == [14, 2]


@pytest.mark.parametrize("W", [1, 2, 3])
def test_grow_state_mid_stream(W):
    """Growth (sentinel append) preserves the sorted-unique state:
    merges continue across a grow and the final table equals the
    oracle.  Also the no-op path (new_rows <= C)."""
    rng = np.random.default_rng(100 + W)
    words, counts = devmerge.empty_state(1 << 10, W)
    oracle: dict = {}
    d = 0
    for batch in range(6):
        if batch == 2:
            words, counts = devmerge.grow_state(words, counts, 1 << 12)
            assert counts.shape[0] == 1 << 12
        if batch == 4:   # no-op: shrink requests are ignored
            words, counts = devmerge.grow_state(words, counts, 16)
            assert counts.shape[0] == 1 << 12
        n = int(rng.integers(200, 500))
        keys = rng.integers(0, 300, (n, W)).astype(np.uint32)
        cts = rng.integers(0, 4, n).astype(np.int32)
        words, counts, d = devmerge.merge_batch(
            words, counts, *_as_batch(keys, cts, W))
        _merge_np(oracle, keys, cts)
        assert int(d) == len(oracle)
    k, c = devmerge.fetch_state(words, counts, int(d))
    got = {tuple(row): int(cc) for row, cc in zip(k, c)}
    assert got == oracle


def test_max_rows_budget(monkeypatch):
    """max_rows honors the MB budget (floor power of two) and is robust
    to a malformed env value."""
    monkeypatch.setenv("KMER_TPU_DEVMERGE_MAX_MB", "12")
    # 12e6 / 12 B per row = 1e6 rows -> floor pow2 = 2^19
    assert devmerge.max_rows(2) == 1 << 19
    monkeypatch.setenv("KMER_TPU_DEVMERGE_MAX_MB", "bogus")
    assert devmerge.max_rows(2) == devmerge.max_rows(2)  # no raise
    monkeypatch.setenv("KMER_TPU_DEVMERGE_MAX_MB", "0.0001")
    assert devmerge.max_rows(1) == 1 << 16    # floored at 2^16


def test_count_fasta_devmerge_growth_bit_identity(tmp_path, monkeypatch):
    """When the corpus' distinct keys exceed the initial capacity the
    driver GROWS the state (no drain thrash); table still exact.  The
    initial capacity is pinned tiny via a patched empty_state (the env
    knob now means FIXED capacity, which forces drains instead)."""
    from kmer_tpu import KmerConfig, count_fasta
    from kmer_tpu.io.generator import random_reads_fasta
    from kmer_tpu.ops import devmerge as dm
    fa = tmp_path / "dmg.fasta"
    fa.write_text(random_reads_fasta(60, 64, seed=14))
    cfg = KmerConfig(k=15, batch_reads=8, max_read_len=64)
    monkeypatch.setenv("KMER_TPU_DEVMERGE", "0")
    ref = count_fasta(str(fa), cfg)
    monkeypatch.setenv("KMER_TPU_DEVMERGE", "1")
    orig = dm.empty_state
    grown = []
    orig_grow = dm.grow_state
    monkeypatch.setattr(dm, "empty_state",
                        lambda r, w: orig(min(r, 2048), w))
    monkeypatch.setattr(dm, "grow_state",
                        lambda w, c, n: grown.append(n) or orig_grow(
                            w, c, n))
    got = count_fasta(str(fa), cfg)
    assert got == ref
    assert (got.keys == ref.keys).all()
    assert (got.counts == ref.counts).all()
    assert grown, "expected the growth path to trigger"


def test_count_fasta_devmerge_budget_cap_drains(tmp_path, monkeypatch):
    """When growth would exceed the KMER_TPU_DEVMERGE_MAX_MB budget the
    driver falls back to drain-and-reset at the capped capacity —
    still exact."""
    from kmer_tpu import KmerConfig, count_fasta
    from kmer_tpu.io.generator import random_reads_fasta
    from kmer_tpu.ops import devmerge as dm
    fa = tmp_path / "dmb.fasta"
    fa.write_text(random_reads_fasta(60, 64, seed=16))
    cfg = KmerConfig(k=15, batch_reads=8, max_read_len=64)
    monkeypatch.setenv("KMER_TPU_DEVMERGE", "0")
    ref = count_fasta(str(fa), cfg)
    monkeypatch.setenv("KMER_TPU_DEVMERGE", "1")
    orig = dm.empty_state
    monkeypatch.setattr(dm, "empty_state",
                        lambda r, w: orig(min(r, 2048), w))
    # budget floor (2^16 rows) < the ~3000 distinct this corpus needs
    # at 2048 capacity -> max_rows still allows growth; cap the budget
    # below the patched capacity instead so need always exceeds it
    monkeypatch.setattr(dm, "max_rows", lambda w: 2048)
    grown = []
    orig_grow = dm.grow_state
    monkeypatch.setattr(dm, "grow_state",
                        lambda w, c, n: grown.append(n) or orig_grow(
                            w, c, n))
    got = count_fasta(str(fa), cfg)
    assert got == ref
    assert (got.keys == ref.keys).all()
    assert not grown, "budget cap must force drains, not growth"


def test_capacity_exact_fit():
    """C == distinct + N is legal (the contract's boundary)."""
    W = 1
    N = 8
    words, counts = devmerge.empty_state(N, W)      # C = N, state empty
    keys = np.arange(N, dtype=np.uint32).reshape(-1, 1)
    cts = np.ones(N, np.int32)
    words, counts, d = devmerge.merge_batch(
        words, counts, *_as_batch(keys, cts, W))
    assert int(d) == N
    k, c = devmerge.fetch_state(words, counts, N)
    assert k[:, 0].tolist() == list(range(N))
    assert c.tolist() == [1] * N


def test_count_fasta_devmerge_bit_identity(tmp_path, monkeypatch):
    """Forced devmerge (device-resident table) is bit-identical to the
    per-batch readback path — contiguous, gapped, spaced, multi-batch."""
    from kmer_tpu import KmerConfig, count_fasta
    from kmer_tpu.io.generator import random_reads_fasta
    fa = tmp_path / "dm.fasta"
    fa.write_text(random_reads_fasta(37, 90, seed=11))
    for cfg in (
        KmerConfig(k=21, canonical=True, batch_reads=8, max_read_len=96),
        KmerConfig(k=45, batch_reads=8, max_read_len=96),
        KmerConfig(gapped=True, l_len=5, r_len=5, c_min=12, c_max=16,
                   batch_reads=8, max_read_len=96),
        KmerConfig(seed_mask="1101011", canonical=True, batch_reads=8,
                   max_read_len=96),
    ):
        monkeypatch.setenv("KMER_TPU_DEVMERGE", "0")
        ref = count_fasta(str(fa), cfg)
        monkeypatch.setenv("KMER_TPU_DEVMERGE", "1")
        got = count_fasta(str(fa), cfg)
        assert got == ref
        assert (got.keys == ref.keys).all()
        assert (got.counts == ref.counts).all()


def test_count_fasta_devmerge_forced_drains(tmp_path, monkeypatch):
    """A tiny capacity forces a drain before (nearly) every merge; the
    table must still be exact."""
    from kmer_tpu import KmerConfig, count_fasta
    from kmer_tpu.io.generator import random_reads_fasta
    fa = tmp_path / "dmd.fasta"
    fa.write_text(random_reads_fasta(25, 64, seed=12))
    cfg = KmerConfig(k=15, batch_reads=4, max_read_len=64)
    monkeypatch.setenv("KMER_TPU_DEVMERGE", "0")
    ref = count_fasta(str(fa), cfg)
    monkeypatch.setenv("KMER_TPU_DEVMERGE", "1")
    # capacity just above one batch's lane count (4 reads x 50 lanes,
    # width rounded to 64 -> 4 x 50 = 200 lanes) so distinct+N exceeds
    # it on the second merge
    monkeypatch.setenv("KMER_TPU_DEVMERGE_ROWS", "512")
    got = count_fasta(str(fa), cfg)
    assert got == ref


def test_devmerge_rows_override_below_batch_is_clamped(tmp_path,
                                                       monkeypatch):
    """KMER_TPU_DEVMERGE_ROWS below one batch's lane count must be
    clamped, not honored: merge_batch truncates live rows past C, so an
    undersized capacity would silently drop keys (the contract says a
    drain can always make room — only true when C >= N)."""
    from kmer_tpu import KmerConfig, count_fasta
    from kmer_tpu.io.generator import random_reads_fasta
    fa = tmp_path / "dmc.fasta"
    fa.write_text(random_reads_fasta(25, 64, seed=13))
    cfg = KmerConfig(k=15, batch_reads=4, max_read_len=64)
    monkeypatch.setenv("KMER_TPU_DEVMERGE", "0")
    ref = count_fasta(str(fa), cfg)
    monkeypatch.setenv("KMER_TPU_DEVMERGE", "1")
    # 64 << one batch's ~200 lanes: without the clamp this drops keys
    monkeypatch.setenv("KMER_TPU_DEVMERGE_ROWS", "64")
    got = count_fasta(str(fa), cfg)
    assert got == ref
    assert (got.keys == ref.keys).all()
    assert (got.counts == ref.counts).all()


@pytest.mark.parametrize("W", [1, 2])
def test_wire_fetch_matches_raw(W):
    """Wire-compressed drain == raw fetch, including count-255 edge,
    counts > 255 (escape), deltas in [2^24, 2^32) (u24-plane escape),
    and 2^32-straddling key gaps (escape)."""
    rng = np.random.default_rng(3 + W)
    C = 1 << 12
    words, counts = devmerge.empty_state(C, W)
    n = 900
    if W == 1:
        # keys over 2^31: mean gap ~2^21 with a natural tail of
        # gaps >= 2^24 exercising the u24 escape; force two anyway
        base = rng.choice(2 ** 30, n - 2, replace=False)
        keys = np.sort(np.concatenate(
            [base, [2 ** 30 + (1 << 25), 2 ** 30 + (1 << 26)]])
        ).astype(np.uint32).reshape(-1, 1)
    else:
        # sparse in 2^40: forces many high-word (>= 2^32) deltas
        k64 = np.sort(rng.choice(1 << 40, n, replace=False))
        keys = np.stack([(k64 >> 32).astype(np.uint32),
                         k64.astype(np.uint32)], axis=1)
    cts = rng.integers(1, 4, n).astype(np.int32)
    cts[5] = 255          # boundary: encodes without escape
    cts[6] = 256          # escape
    cts[7] = 100000       # escape
    words, counts, d = devmerge.merge_batch(
        words, counts, *_as_batch(keys, cts, W))
    raw_k, raw_c = devmerge.fetch_state(words, counts, int(d))
    wire = devmerge.fetch_state_wire(words, counts, int(d))
    assert wire is not None
    wk, wc = wire
    assert np.array_equal(wk, raw_k)
    assert np.array_equal(wc, raw_c)


def test_wire_fetch_u32_tier():
    """A table whose mean gap straddles 2^24 (sparse: ~100k keys over
    2^42) overflows the u24 escape patch but fits the u32 tier — the
    wire fetch must fall back to u32, not decline (regression: the
    first u24-only wire declined exactly the density the hardware
    battery models)."""
    rng = np.random.default_rng(7)
    n = 100_000
    k64 = np.sort(rng.choice(1 << 42, n, replace=False))
    keys = np.stack([(k64 >> 32).astype(np.uint32),
                     k64.astype(np.uint32)], axis=1)
    cts = rng.integers(1, 4, n).astype(np.int32)
    cts[rng.choice(n, 300, replace=False)] = 70_000   # count escapes
    words, counts = devmerge.empty_state(1 << 18, 2)
    words, counts, d = devmerge.merge_batch(
        words, counts, *_as_batch(keys, cts, 2))
    # confirm the fixture actually overflows the u24 patch
    enc = devmerge.wire_encode(words, counts, 1 << 17)
    assert int(enc[5]) > devmerge.WIRE_PATCH_ROWS
    assert int(enc[6]) <= devmerge.WIRE_PATCH_ROWS
    raw_k, raw_c = devmerge.fetch_state(words, counts, int(d))
    wire = devmerge.fetch_state_wire(words, counts, int(d))
    assert wire is not None
    assert np.array_equal(wire[0], raw_k)
    assert np.array_equal(wire[1], raw_c)


def test_wire_fetch_w3_counts_tier():
    """Wide keys (W=3) drain raw key planes + u8 counts with an escape
    patch — result == raw fetch, including counts > 255."""
    rng = np.random.default_rng(9)
    words, counts = devmerge.empty_state(1 << 12, 3)
    n = 700
    keys = rng.integers(0, 2 ** 31, (n, 3)).astype(np.uint32)
    keys = np.unique(keys, axis=0)
    cts = rng.integers(1, 4, len(keys)).astype(np.int32)
    cts[3] = 255
    cts[4] = 256
    cts[5] = 1_000_000
    words, counts, d = devmerge.merge_batch(
        words, counts, *_as_batch(keys, cts, 3))
    raw_k, raw_c = devmerge.fetch_state(words, counts, int(d))
    wire = devmerge.fetch_state_wire(words, counts, int(d))
    assert wire is not None
    assert np.array_equal(wire[0], raw_k)
    assert np.array_equal(wire[1], raw_c)
    # empty wide state: empty result, not None
    w0, c0 = devmerge.empty_state(64, 3)
    got = devmerge.fetch_state_wire(w0, c0, 0)
    assert got[0].shape == (0, 3) and got[1].shape == (0,)


@pytest.mark.parametrize("seed", range(8))
def test_wire_fetch_randomized_tiers(seed):
    """Property sweep over the wire-tier boundaries: random key
    density (dense u24-tier gaps through sparse u32-tier through
    hi-word escapes), random counts (incl. >255 escapes), W in
    {1, 2, 3} — fetch_state_wire must equal fetch_state whenever it
    returns, at every density (the u24-only wire regressed exactly at
    a density boundary the fixtures straddled)."""
    rng = np.random.default_rng(1000 + seed)
    W = int(rng.integers(1, 4))
    # keyspace width picks the tier: narrow -> dense deltas (u24),
    # wide -> sparse (u32 / escapes)
    bits = int(rng.integers(16, 43 if W >= 2 else 31))
    n = int(rng.integers(200, 3000))
    if W == 1:
        keys = np.sort(rng.choice(1 << min(bits, 31), n, replace=False)
                       ).astype(np.uint32).reshape(-1, 1)
    else:
        k64 = np.sort(rng.choice(1 << bits, n, replace=False))
        cols = [(k64 >> 32).astype(np.uint32), k64.astype(np.uint32)]
        if W == 3:
            cols = [np.zeros(n, np.uint32)] + cols
        keys = np.stack(cols, axis=1)
    cts = rng.integers(1, 300, n).astype(np.int32)   # some > 255
    cts[rng.integers(0, n, 5)] = 1_000_000
    words, counts = devmerge.empty_state(
        1 << max(10, (2 * n - 1).bit_length()), W)
    words, counts, d = devmerge.merge_batch(
        words, counts, *_as_batch(keys, cts, W))
    raw = devmerge.fetch_state(words, counts, int(d))
    wire = devmerge.fetch_state_wire(words, counts, int(d))
    assert wire is not None     # patches can't overflow at n <= 3000
    assert np.array_equal(wire[0], raw[0])
    assert np.array_equal(wire[1], raw[1])


def test_streaming_devmerge_bit_identity(tmp_path, monkeypatch):
    """Forced devmerge in streaming pass 1 (drain-commit checkpoints)
    is bit-identical to the per-batch spill path, including under
    cooperative interruption and a forced tiny capacity."""
    from kmer_tpu import KmerConfig
    from kmer_tpu.io.generator import random_reads_fasta
    from kmer_tpu.pipeline.streaming import StreamingCounter
    fa = tmp_path / "sdm.fasta"
    fa.write_text(random_reads_fasta(33, 80, seed=13))
    cfg = KmerConfig(k=21, canonical=True, batch_reads=4,
                     max_read_len=96, partitions=3)
    monkeypatch.setenv("KMER_TPU_DEVMERGE", "0")
    ref_sc = StreamingCounter(str(fa), cfg, str(tmp_path / "ref"))
    ref_sc.run()
    ref = ref_sc.final_table()

    monkeypatch.setenv("KMER_TPU_DEVMERGE", "1")
    sc = StreamingCounter(str(fa), cfg, str(tmp_path / "dm"))
    sc.run()
    assert sc.final_table() == ref

    # tiny capacity: drains before (nearly) every merge
    monkeypatch.setenv("KMER_TPU_DEVMERGE_ROWS", "512")
    sc2 = StreamingCounter(str(fa), cfg, str(tmp_path / "dm2"))
    sc2.run()
    assert sc2.final_table() == ref
    monkeypatch.delenv("KMER_TPU_DEVMERGE_ROWS")

    # cooperative interruption: one batch per call, fresh counter every
    # time (resume from manifest) — un-drained work re-counts, never
    # doubles
    d3 = str(tmp_path / "dm3")
    for _ in range(40):
        sc3 = StreamingCounter(str(fa), cfg, d3)
        if sc3.state["pass1_done"]:
            break
        sc3.run_pass1(max_batches=1)
    else:
        raise AssertionError("pass1 did not finish")
    sc3 = StreamingCounter(str(fa), cfg, d3)
    sc3.run()
    assert sc3.final_table() == ref


def test_streaming_devmerge_growth_bit_identity(tmp_path, monkeypatch):
    """Streaming pass 1 grows the device state (no drain thrash) when
    distinct exceeds the initial capacity; table still exact.  Initial
    capacity pinned tiny via a patched empty_state (the env knob means
    FIXED capacity and forces drains instead)."""
    from kmer_tpu import KmerConfig
    from kmer_tpu.io.generator import random_reads_fasta
    from kmer_tpu.ops import devmerge as dm
    from kmer_tpu.pipeline.streaming import StreamingCounter
    fa = tmp_path / "sdg.fasta"
    fa.write_text(random_reads_fasta(60, 64, seed=15))
    cfg = KmerConfig(k=15, batch_reads=8, max_read_len=64, partitions=3)
    monkeypatch.setenv("KMER_TPU_DEVMERGE", "0")
    ref_sc = StreamingCounter(str(fa), cfg, str(tmp_path / "ref"))
    ref_sc.run()
    ref = ref_sc.final_table()

    monkeypatch.setenv("KMER_TPU_DEVMERGE", "1")
    orig = dm.empty_state
    orig_grow = dm.grow_state
    grown = []
    monkeypatch.setattr(dm, "empty_state",
                        lambda r, w: orig(min(r, 2048), w))
    monkeypatch.setattr(dm, "grow_state",
                        lambda w, c, n: grown.append(n) or orig_grow(
                            w, c, n))
    sc = StreamingCounter(str(fa), cfg, str(tmp_path / "dmg"))
    sc.run()
    assert sc.final_table() == ref
    assert grown, "expected the streaming growth path to trigger"


def test_streaming_devmerge_crash_between_drains(tmp_path, monkeypatch):
    """A 'crash' (abandoned counter, no commit) after merging batches
    into the device table must lose nothing on resume: the manifest
    cursor still points at the last drain."""
    from kmer_tpu import KmerConfig
    from kmer_tpu.io.generator import random_reads_fasta
    from kmer_tpu.pipeline.streaming import StreamingCounter
    fa = tmp_path / "sdc.fasta"
    fa.write_text(random_reads_fasta(21, 64, seed=14))
    cfg = KmerConfig(k=15, batch_reads=4, max_read_len=64, partitions=2)
    monkeypatch.setenv("KMER_TPU_DEVMERGE", "0")
    ref_sc = StreamingCounter(str(fa), cfg, str(tmp_path / "ref"))
    ref_sc.run()
    ref = ref_sc.final_table()

    monkeypatch.setenv("KMER_TPU_DEVMERGE", "1")
    d = str(tmp_path / "dm")
    sc = StreamingCounter(str(fa), cfg, d)
    # merge a few batches WITHOUT letting pass1 finish, then abandon:
    # run_pass1(max_batches=2) commits at return (cooperative), so to
    # simulate a crash we call the internals directly
    from kmer_tpu.io.fasta import parse_seqs, iter_batches
    codes, offsets = parse_seqs(str(fa))
    dm = {"words": None, "counts": None, "distinct": 0,
          "bound": 0, "total": 0, "d_dev": None}
    for i, b in enumerate(iter_batches(codes, offsets, batch_reads=4,
                                       max_len=64, overlap=14)):
        sc._dm_merge(dm, b, i)
        if i == 1:
            break
    del sc, dm          # crash: device state vanishes, no commit
    sc2 = StreamingCounter(str(fa), cfg, d)
    assert sc2.state["pass1_next_batch"] == 0     # nothing committed
    sc2.run()
    assert sc2.final_table() == ref


def test_device_merge_config_and_cli(tmp_path, monkeypatch):
    """device_merge config field: validated, forced on/off without env,
    env still wins; CLI --device-merge reaches the config."""
    from kmer_tpu import KmerConfig, count_fasta
    from kmer_tpu.io.generator import random_reads_fasta
    from kmer_tpu.pipeline.count import _devmerge_ok
    import pytest as _pt
    with _pt.raises(ValueError):
        KmerConfig(device_merge="maybe")
    monkeypatch.delenv("KMER_TPU_DEVMERGE", raising=False)
    assert _devmerge_ok(KmerConfig(device_merge="on")) is True
    assert _devmerge_ok(KmerConfig(device_merge="off")) is False
    monkeypatch.setenv("KMER_TPU_DEVMERGE", "0")
    assert _devmerge_ok(KmerConfig(device_merge="on")) is False
    monkeypatch.delenv("KMER_TPU_DEVMERGE")

    fa = tmp_path / "cfg.fasta"
    fa.write_text(random_reads_fasta(9, 60, seed=15))
    cfg_on = KmerConfig(k=15, batch_reads=4, max_read_len=64,
                        device_merge="on")
    cfg_off = cfg_on.replace(device_merge="off")
    assert count_fasta(str(fa), cfg_on) == count_fasta(str(fa), cfg_off)

    from kmer_tpu.cli import main as cli_main
    out = tmp_path / "out.tsv"
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(["count", str(fa), "-k", "15", "--batch-reads", "4",
                       "--max-read-len", "64", "--device-merge", "on"])
    assert rc == 0
    buf2 = io.StringIO()
    with contextlib.redirect_stdout(buf2):
        rc = cli_main(["count", str(fa), "-k", "15", "--batch-reads", "4",
                       "--max-read-len", "64", "--device-merge", "off"])
    assert rc == 0
    assert buf.getvalue() == buf2.getvalue()
