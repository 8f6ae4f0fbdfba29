"""Predicate scans with zone-map data skipping (LakeTable.snapshot_dataset
``where=`` + prune_chains): parquet footer min/max statistics prune whole
bucket chains, an exact vectorized mask filters the merged LWW winners.
Reference analog: the store-side CQL filter push-down of the reference's
query path (GeoMesaDataStore query planning); re-expressed as conjunct
push-down over the bucketed Parquet lake."""

import datetime

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from geomesa_nifi_ray.engine import CDCEngine
from geomesa_nifi_ray.lake import predicate_mask, validate_where

EPOCH_US = datetime.datetime(1970, 1, 1)


def _ts(us: int) -> datetime.datetime:
    return EPOCH_US + datetime.timedelta(microseconds=us)


def _epoch(eng, epoch, urls, ts0, offset0, langs=None, ops=None):
    import ray.data

    n = len(urls)
    t = pa.table({
        "url": pa.array(urls),
        "warc_ts": pa.array([ts0 + i for i in range(n)],
                            pa.int64()).cast(pa.timestamp("us")),
        "html": pa.array([b"<p>x</p>"] * n, pa.large_binary()),
        "lang": pa.array(langs if langs is not None else ["en"] * n),
        "offset": pa.array(list(range(offset0, offset0 + n)), pa.int64()),
        **({"_op": pa.array(ops)} if ops else {}),
    })
    eng.apply_epoch(ray.data.from_arrow(t), epoch=epoch,
                    offset_range=(offset0, offset0 + n - 1))


@pytest.fixture()
def lake(ray_session, tmp_path):
    """40 Jan-era keys; 2 recent updates; 1 recent delete; 1 null-lang row.
    Recency predicates must skip every bucket untouched since epoch 0."""
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=8)
    urls = [f"https://p/{i}" for i in range(40)]
    _epoch(eng, 0, urls, 1_000_000, 0,
           langs=(["en"] * 20 + ["de"] * 19 + [None]))
    _epoch(eng, 1, [urls[0], urls[5]], 9_000_000, 100, langs=["fr", "fr"])
    _epoch(eng, 2, [urls[9]], 9_500_000, 200, ops=["delete"])
    return eng


def _exact(eng, where):
    snap = eng.table.snapshot_table()
    return snap.filter(predicate_mask(snap, validate_where(snap.schema, where)))


def _rows(x):
    t = x if isinstance(x, pa.Table) else pa.Table.from_pylist(x.take_all())
    return sorted(map(tuple, zip(*(t[c].to_pylist() for c in sorted(t.column_names)))))


@pytest.mark.parametrize("where", [
    [("warc_ts", ">=", "1970-01-01T00:00:05")],
    [("warc_ts", "<", "1970-01-01T00:00:05")],
    [("warc_ts", ">=", _ts(1_000_010)), ("warc_ts", "<=", _ts(1_000_020))],
    [("lang", "==", "fr")],
    [("lang", "==", "en")],                      # null lang never matches
    [("url", ">=", "https://p/3"), ("url", "<", "https://p/35")],
    [("offset", ">", 100)],
])
def test_where_matches_exact_filter(lake, where):
    ds = lake.table.snapshot_dataset(where=where)
    exact = _exact(lake, where)
    assert _rows(ds) == _rows(exact)
    assert exact.num_rows > 0  # every case exercises a non-empty result


def test_recency_scan_skips_cold_chains(lake):
    ds = lake.table.snapshot_dataset(where=[("warc_ts", ">=", _ts(5_000_000))])
    got = sorted(r["url"] for r in ds.take_all())
    # the epoch-2 delete must not resurrect p/9 even though its tombstone
    # delta's stats admit the chain
    assert got == ["https://p/0", "https://p/5"]
    rep = lake.table.last_prune_report
    assert rep["chains_total"] == 8
    assert rep["chains_skipped"] > 0
    assert rep["chains_kept"] + rep["chains_skipped"] == 8
    assert rep["files_checked"] > 0


def test_columns_projection_drops_predicate_column(lake):
    ds = lake.table.snapshot_dataset(
        columns=["url", "lang"], where=[("warc_ts", ">=", _ts(5_000_000))])
    t = pa.Table.from_pylist(ds.take_all())
    assert sorted(t.column_names) == ["lang", "url"]
    assert sorted(t["url"].to_pylist()) == ["https://p/0", "https://p/5"]


def test_fast_path_where(ray_session, tmp_path):
    """A fresh single-epoch lake (no deltas, schema v0) takes the parallel
    multi-file fast path; where= must filter there too."""
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=4)
    _epoch(eng, 0, [f"https://q/{i}" for i in range(10)], 1_000_000, 0)
    entries = eng.table.live_entries()
    assert all(not e.get("deltas") for e in entries.values())
    ds = eng.table.snapshot_dataset(
        columns=["url"], where=[("warc_ts", "<=", _ts(1_000_003))])
    assert sorted(r["url"] for r in ds.take_all()) == [
        f"https://q/{i}" for i in range(4)]
    assert eng.table.last_prune_report["chains_total"] == len(entries)


def test_missing_column_excludes_pre_evolution_chains(ray_session, tmp_path):
    """After additive schema evolution, buckets untouched since evolution
    lack the new column in every chain file -> the null-projected rows can
    never match, so those chains are skipped outright."""
    import ray.data

    from geomesa_nifi_ray.schema import CompatibilityMode

    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=8,
                    compatibility=CompatibilityMode.UPDATE)
    urls = [f"https://e/{i}" for i in range(40)]
    _epoch(eng, 0, urls, 1_000_000, 0)
    t = pa.table({
        "url": pa.array([urls[0]]),
        "warc_ts": pa.array([9_000_000], pa.int64()).cast(pa.timestamp("us")),
        "html": pa.array([b"<p>y</p>"], pa.large_binary()),
        "lang": pa.array(["en"]),
        "offset": pa.array([100], pa.int64()),
        "mime": pa.array(["text/html"]),  # additive evolution
    })
    eng.apply_epoch(ray.data.from_arrow(t), epoch=1, offset_range=(100, 100))
    assert "mime" in eng.table.schema.names
    ds = eng.table.snapshot_dataset(where=[("mime", "==", "text/html")])
    assert [r["url"] for r in ds.take_all()] == [urls[0]]
    rep = eng.table.last_prune_report
    assert rep["chains_skipped"] >= 6  # every bucket epoch 1 didn't touch


def test_empty_result_when_nothing_matches(lake):
    ds = lake.table.snapshot_dataset(where=[("lang", "==", "zz")])
    assert ds.take_all() == []
    assert lake.table.last_prune_report["chains_kept"] == 0
    # schema survives the empty scan
    assert ds.schema().names == list(lake.table.schema.names)


def test_where_validation_errors(lake):
    t = lake.table
    with pytest.raises(KeyError):
        t.snapshot_dataset(where=[("nope", "==", 1)])
    with pytest.raises(ValueError):
        t.snapshot_dataset(where=[("lang", "!=", "en")])
    with pytest.raises(ValueError):
        t.snapshot_dataset(where=[("lang", "==", None)])
    with pytest.raises(ValueError):
        t.snapshot_dataset(where=[])
    with pytest.raises(ValueError):
        t.snapshot_dataset(where=[("lang", "==")])


def test_prune_chains_argument_conflicts(lake):
    t = lake.table
    where = [("lang", "==", "en")]
    with pytest.raises(ValueError):
        t.prune_chains(where, epoch=0, include_pending=True)
    with pytest.raises(ValueError):
        t.prune_chains(where, entries=t.live_entries(), epoch=0)
    # the public path still normalizes raw specs itself
    kept, rep = t.prune_chains(where)
    assert rep["chains_total"] == 8 and set(kept) <= set(t.live_entries())


def test_where_with_time_travel_epoch(lake):
    """where composes with epoch= time travel: at epoch 0 the recent
    updates don't exist yet, so a recency scan is empty and skips all."""
    ds = lake.table.snapshot_dataset(
        epoch=0, where=[("warc_ts", ">=", _ts(5_000_000))])
    assert ds.take_all() == []
    assert lake.table.last_prune_report["chains_skipped"] == \
        lake.table.last_prune_report["chains_total"]


def test_where_cli_parser_leftmost_operator():
    """The parser splits at the LEFTMOST operator occurrence (longer op
    winning ties), so comparison substrings inside the VALUE never split
    the expression, and its op set is the validator's own."""
    from geomesa_nifi_ray.__main__ import _parse_where

    assert _parse_where(["url==https://a?x>=1"]) == \
        [("url", "==", "https://a?x>=1")]
    assert _parse_where(["title==a<=b"]) == [("title", "==", "a<=b")]
    assert _parse_where(["warc_ts>=2020-01-10"]) == \
        [("warc_ts", ">=", "2020-01-10")]
    with pytest.raises(ValueError, match="COL<OP>VALUE"):
        _parse_where(["lang~en"])


def test_snapshot_cli_where(lake, tmp_path):
    """`snapshot --where` end to end: filtered export + prune report in
    the one-line JSON summary; a malformed conjunct exits 2."""
    import json

    import pyarrow.parquet as pq

    from conftest import run_cli as run

    lake_root = lake.lake_root
    out_dir = str(tmp_path / "snap")
    r = run("snapshot", "--lake", lake_root, "--out", out_dir,
            "--where", "warc_ts>=1970-01-01T00:00:05", "--where", "lang==fr")
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["prune"]["chains_skipped"] > 0
    got = pq.read_table(out_dir)
    assert sorted(got["url"].to_pylist()) == ["https://p/0", "https://p/5"]

    r = run("snapshot", "--lake", lake_root, "--out", str(tmp_path / "bad"),
            "--where", "lang~en", expect=2)
    assert "COL<OP>VALUE" in r.stderr


def test_prune_never_loses_rows_property(lake):
    """The pruned scan equals the unpruned exact filter for a sweep of
    cutoffs crossing every epoch boundary (soundness, both directions)."""
    for cut_us in (0, 1_000_000, 1_000_020, 5_000_000, 9_000_001, 10_000_000):
        where = [("warc_ts", ">=", _ts(cut_us))]
        assert _rows(lake.table.snapshot_dataset(where=where)) == \
            _rows(_exact(lake, where)), f"cutoff {cut_us}"
        where = [("warc_ts", "<", _ts(cut_us))]
        assert _rows(lake.table.snapshot_dataset(where=where)) == \
            _rows(_exact(lake, where)), f"cutoff {cut_us}"


def test_snapshot_cli_columns(lake, tmp_path):
    """`snapshot --columns` projects the export; predicate columns are
    read for --where without being exported; unknown names exit 2."""
    import json

    import pyarrow.parquet as pq

    from conftest import run_cli as run

    lake_root = lake.lake_root
    out_dir = str(tmp_path / "snapcols")
    r = run("snapshot", "--lake", lake_root, "--out", out_dir,
            "--columns", "url", "--where", "lang==fr")
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["prune"]["files_checked"] > 0
    got = pq.read_table(out_dir)
    assert got.column_names == ["url"]
    assert sorted(got["url"].to_pylist()) == ["https://p/0", "https://p/5"]

    r = run("snapshot", "--lake", lake_root, "--out", str(tmp_path / "badc"),
            "--columns", "url,nosuch", expect=2)
    assert "nosuch" in r.stderr

    # separator-only --columns is a user error, never a silent 0-column
    # export with exit 0
    r = run("snapshot", "--lake", lake_root, "--out", str(tmp_path / "badc2"),
            "--columns", ",", expect=2)
    assert "no column names" in r.stderr


def test_egress_cli_where_and_columns(lake, tmp_path):
    """`egress --where/--columns`: filtered + projected change stream.
    Tombstones carry only key+order columns, so a non-key conjunct drops
    them (documented SQL null semantics) while a key conjunct keeps them."""
    import glob
    import json
    import os

    from conftest import run_cli as run

    lake_root = lake.lake_root

    def rows(out_dir):
        lines = []
        for p in glob.glob(os.path.join(out_dir, "*.jsonl")):
            with open(p) as f:
                lines += [json.loads(ln) for ln in f if ln.strip()]
        return lines

    out1 = str(tmp_path / "eg1")
    run("egress", "--lake", lake_root, "--epoch", "1", "--out", out1,
        "--where", "lang==fr", "--columns", "url,lang")
    got = rows(out1)
    assert sorted(r["url"] for r in got) == ["https://p/0", "https://p/5"]
    assert all(set(r) == {"url", "lang"} for r in got)

    # epoch 2 is a delete: its tombstone has a null lang, so a lang
    # conjunct drops it...
    out2 = str(tmp_path / "eg2")
    run("egress", "--lake", lake_root, "--epoch", "2", "--out", out2,
        "--where", "lang==fr")
    assert rows(out2) == []
    # ...while the KEY conjunct keeps the delete flowing
    out3 = str(tmp_path / "eg3")
    run("egress", "--lake", lake_root, "--epoch", "2", "--out", out3,
        "--where", "url==https://p/9")
    assert [r["url"] for r in rows(out3)] == ["https://p/9"]

    r = run("egress", "--lake", lake_root, "--epoch", "1",
            "--out", str(tmp_path / "bade"), "--where", "nosuch==1",
            expect=2)
    assert "nosuch" in r.stderr

    # a nonexistent epoch is the likeliest user error: clean exit 2, not
    # a FileNotFoundError traceback out of the manifest read
    r = run("egress", "--lake", lake_root, "--epoch", "99",
            "--out", str(tmp_path / "bade2"), expect=2)
    assert "no manifest for epoch 99" in r.stderr


def test_diff_cli_where(lake, tmp_path):
    """`diff --where` filters the diff rows (payload-column conjuncts)."""
    import glob
    import json
    import os

    from conftest import run_cli as run

    out = str(tmp_path / "d1")
    run("diff", "--lake", lake.lake_root, "--from", "0", "--to", "2",
        "--out", out, "--where", "lang==fr")
    lines = []
    for p in glob.glob(os.path.join(out, "*.jsonl")):
        with open(p) as f:
            lines += [json.loads(ln) for ln in f if ln.strip()]
    assert sorted(r["url"] for r in lines) == ["https://p/0", "https://p/5"]
