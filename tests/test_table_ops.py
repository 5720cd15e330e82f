"""KmerTable set operations + vectorized query (host-side, no device).

Differential contract: every op is checked against the dict-based
oracle of its definition (KMC-tools `simple` semantics: union = sum,
intersect = min over shared keys, counters_subtract = difference with
<= 0 dropped, kmers_subtract = key removal)."""

import numpy as np
import pytest

from kmer_tpu.pipeline.table import KmerTable


def _table_from_dict(k, d):
    from kmer_tpu.ops.encode import encode_seq, key_words_from_codes
    if not d:
        return KmerTable.empty(k)
    keys = np.stack([key_words_from_codes(encode_seq(km)) for km in d])
    return KmerTable.from_pairs(k, keys,
                                np.array(list(d.values()), np.int64))


def _rand_tables(k=7, seed=0, n_a=40, n_b=40):
    rng = np.random.default_rng(seed)
    pool = ["".join("ACGT"[c] for c in rng.integers(0, 4, k))
            for _ in range(60)]
    da = {km: int(rng.integers(1, 50))
          for km in rng.choice(pool, n_a, replace=False)}
    db = {km: int(rng.integers(1, 50))
          for km in rng.choice(pool, n_b, replace=False)}
    return da, db, _table_from_dict(k, da), _table_from_dict(k, db)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_union_sum(seed):
    da, db, a, b = _rand_tables(seed=seed)
    want = dict(da)
    for km, c in db.items():
        want[km] = want.get(km, 0) + c
    assert a.union(b).to_dict() == want


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_intersect_min(seed):
    da, db, a, b = _rand_tables(seed=seed)
    want = {km: min(c, db[km]) for km, c in da.items() if km in db}
    assert a.intersect(b).to_dict() == want
    assert b.intersect(a).to_dict() == want


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_counters_subtract(seed):
    da, db, a, b = _rand_tables(seed=seed)
    want = {km: c - db.get(km, 0) for km, c in da.items()
            if c - db.get(km, 0) > 0}
    assert a.subtract(b).to_dict() == want


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_kmers_subtract(seed):
    da, db, a, b = _rand_tables(seed=seed)
    want = {km: c for km, c in da.items() if km not in db}
    assert a.subtract(b, counters=False).to_dict() == want


def test_setops_empty_and_multiword():
    # W=2 keys (k=21) + empty operands
    da, db, a, b = _rand_tables(k=21, seed=3, n_a=20, n_b=20)
    e = KmerTable.empty(21)
    assert a.intersect(e).num_distinct == 0
    assert e.intersect(a).num_distinct == 0
    assert a.subtract(e) == a
    assert a.union(e) == a
    want = {km: min(c, db[km]) for km, c in da.items() if km in db}
    assert a.intersect(b).to_dict() == want


def test_get_many_matches_get():
    da, db, a, _ = _rand_tables(seed=4)
    queries = list(da)[:10] + list(db)[:10]
    got = a.get_many(queries)
    assert got.tolist() == [a.get(km) for km in queries]
    with pytest.raises(ValueError):
        a.get_many(["ACGT"])


def test_get_many_canonical():
    from kmer_tpu.ops.encode import revcomp_str
    d = {"ACGTACG": 3, "AAAAAAA": 2}
    t = _table_from_dict(7, d)
    q = [revcomp_str("ACGTACG"), "AAAAAAA", revcomp_str("AAAAAAA")]
    assert t.get_many(q, canonical=True).tolist() == [3, 2, 2]


def test_cli_tools_roundtrip(tmp_path, capsys):
    from kmer_tpu.cli import main
    da, db, a, b = _rand_tables(seed=5)
    pa, pb = tmp_path / "a.npz", tmp_path / "b.npz"
    a.save(pa), b.save(pb)
    out = tmp_path / "u.npz"
    assert main(["tools", "union", str(pa), str(pb),
                 "-o", str(out)]) == 0
    assert KmerTable.load(str(out)) == a.union(b)
    tsv = capsys.readouterr().out
    assert len(tsv.splitlines()) == a.union(b).num_distinct
    assert main(["tools", "intersect", str(pa), str(pb)]) == 0
    got = dict(ln.split("\t") for ln in
               capsys.readouterr().out.splitlines())
    assert {k: int(v) for k, v in got.items()} == a.intersect(b).to_dict()
    # k mismatch is a clean error
    c = _table_from_dict(9, {"ACGTACGTA": 1})
    pc = tmp_path / "c.npz"
    c.save(pc)
    assert main(["tools", "union", str(pa), str(pc)]) == 1


@pytest.mark.parametrize("seed", [0, 3])
def test_compare_jaccard_containment(seed):
    da, db, a, b = _rand_tables(seed=seed)
    got = a.compare(b)
    inter = len(set(da) & set(db))
    union = len(set(da) | set(db))
    assert got["distinct_shared"] == inter
    assert got["jaccard"] == pytest.approx(inter / union)
    assert got["containment_a_in_b"] == pytest.approx(inter / len(da))
    assert got["containment_b_in_a"] == pytest.approx(inter / len(db))
    # symmetric in the jaccard sense
    assert b.compare(a)["jaccard"] == pytest.approx(got["jaccard"])
    e = KmerTable.empty(7)
    assert a.compare(e)["jaccard"] == 0.0


def test_cli_tools_compare(tmp_path, capsys):
    import json
    from kmer_tpu.cli import main
    da, db, a, b = _rand_tables(seed=6)
    pa, pb = tmp_path / "a.npz", tmp_path / "b.npz"
    a.save(pa), b.save(pb)
    assert main(["tools", "compare", str(pa), str(pb)]) == 0
    got = json.loads(capsys.readouterr().out)
    assert got == a.compare(b)


def test_cli_dump(tmp_path, capsys):
    from kmer_tpu.cli import main
    da, _, a, _ = _rand_tables(seed=8)
    pa = tmp_path / "a.npz"
    a.save(pa)
    assert main(["dump", str(pa)]) == 0
    out = capsys.readouterr().out
    got = {ln.split("\t")[0]: int(ln.split("\t")[1])
           for ln in out.splitlines()}
    assert got == a.to_dict()
    assert main(["dump", str(pa), "--histo"]) == 0
    h = dict(tuple(map(int, ln.split("\t")))
             for ln in capsys.readouterr().out.splitlines())
    assert h == a.multiplicity_histogram()
    assert main(["dump", str(pa), "--top", "3"]) == 0
    top = capsys.readouterr().out.splitlines()
    assert len(top) == 3
    assert [tuple(ln.split("\t")) for ln in top] == \
        [(km, str(c)) for km, c in a.top(3)]
    assert main(["dump", str(pa), "--min-count", "25"]) == 0
    got2 = capsys.readouterr().out.splitlines()
    assert len(got2) == a.filter_min_count(25).num_distinct


def test_cli_tools_union_many(tmp_path, capsys):
    from kmer_tpu.cli import main
    da, db, a, b = _rand_tables(seed=9)
    dc, _, c, _ = _rand_tables(seed=10)
    for name, t in (("a", a), ("b", b), ("c", c)):
        t.save(tmp_path / f"{name}.npz")
    out = tmp_path / "u.npz"
    assert main(["tools", "union", str(tmp_path / "a.npz"),
                 str(tmp_path / "b.npz"), str(tmp_path / "c.npz"),
                 "-o", str(out)]) == 0
    assert KmerTable.load(str(out)) == a.union(b).union(c)
    capsys.readouterr()
    # non-union ops reject multiple B tables
    assert main(["tools", "intersect", str(tmp_path / "a.npz"),
                 str(tmp_path / "b.npz"), str(tmp_path / "c.npz")]) == 1
