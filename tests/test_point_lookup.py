"""Keyed point lookup (LakeTable.lookup_keys + the lookup CLI): O(probe)
keyed reads over the bucketed lake — bucket-hash routing, row-group
key-skipping, LWW/tombstone resolution, time-travel. Reference analog:
the modify writer's keyed store reads (FeatureWriters.scala:115-160)."""

import json
import os
import subprocess
import sys

import pyarrow as pa
import pytest

from geomesa_nifi_ray.engine import CDCEngine


def _epoch(eng, epoch, rows, offset0):
    import ray.data

    n = len(rows["url"])
    t = pa.table({
        "url": pa.array(rows["url"]),
        "warc_ts": pa.array(rows["ts"], pa.int64()).cast(pa.timestamp("us")),
        "html": pa.array(rows.get("html", [b"<p>x</p>"] * n),
                         pa.large_binary()),
        "lang": pa.array(rows.get("lang", ["en"] * n)),
        "offset": pa.array(list(range(offset0, offset0 + n)), pa.int64()),
        **({"_op": pa.array(rows["_op"])} if "_op" in rows else {}),
    })
    eng.apply_epoch(ray.data.from_arrow(t), epoch=epoch,
                    offset_range=(offset0, offset0 + n - 1))


@pytest.fixture()
def lake(ray_session, tmp_path):
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=4)
    urls = [f"https://p/{i}" for i in range(20)]
    _epoch(eng, 0, {"url": urls, "ts": [1_000_000 + i for i in range(20)]}, 0)
    # epoch 1: update 3 keys, delete 2
    _epoch(eng, 1, {
        "url": [urls[0], urls[5], urls[9], urls[3], urls[7]],
        "ts": [2_000_000 + i for i in range(5)],
        "lang": ["de", "de", "de", None, None],
        "html": [b"<p>v2</p>"] * 3 + [None, None],
        "_op": ["upsert", "upsert", "upsert", "delete", "delete"],
    }, 100)
    return eng


def test_lookup_matches_snapshot(lake):
    snap = lake.table.snapshot_table()
    by_url = {u: i for i, u in enumerate(snap["url"].to_pylist())}
    probe = ["https://p/0", "https://p/5", "https://p/12",
             "https://p/3",            # tombstoned -> no row
             "https://p/999"]          # never written -> no row
    hit = lake.table.lookup_keys(probe)
    assert sorted(hit["url"].to_pylist()) == \
        ["https://p/0", "https://p/12", "https://p/5"]
    for row in hit.to_pylist():
        i = by_url[row["url"]]
        expect = {c: snap[c][i].as_py() for c in snap.column_names}
        assert row == expect
    # updated key carries the epoch-1 value, not the base
    v = {r["url"]: r for r in hit.to_pylist()}
    assert v["https://p/0"]["lang"] == "de"


def test_lookup_time_travel_and_validation(lake):
    # at epoch 0 the later-deleted key is still present with base values
    old = lake.table.lookup_keys(["https://p/3", "https://p/0"], epoch=0)
    got = {r["url"]: r for r in old.to_pylist()}
    assert set(got) == {"https://p/3", "https://p/0"}
    assert got["https://p/0"]["lang"] == "en"
    with pytest.raises(ValueError, match="lookup-able epochs"):
        lake.table.lookup_keys(["https://p/0"], epoch=9)


def test_lookup_projection_dedup_empty(lake):
    # projection may drop key/order columns (merge re-adds them internally)
    hit = lake.table.lookup_keys(
        ["https://p/5", "https://p/5", None], columns=["lang"])
    assert hit.column_names == ["lang"]
    assert hit.num_rows == 1 and hit["lang"][0].as_py() == "de"
    empty = lake.table.lookup_keys([], columns=["url", "lang"])
    assert empty.num_rows == 0 and empty.column_names == ["url", "lang"]
    # all-absent probe keeps the projected schema too
    miss = lake.table.lookup_keys(["https://nope"], columns=["url"])
    assert miss.num_rows == 0 and miss.column_names == ["url"]


def test_lookup_cli(lake):
    root = lake.lake_root
    out = subprocess.run(
        [sys.executable, "-m", "geomesa_nifi_ray", "lookup", "--lake", root,
         "--key", "https://p/5", "--key", "https://p/3",
         "--columns", "url,lang,offset"],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [json.loads(l) for l in out.stdout.strip().splitlines() if l]
    assert rows == [{"url": "https://p/5", "lang": "de", "offset": 101}]
    bad = subprocess.run(
        [sys.executable, "-m", "geomesa_nifi_ray", "lookup", "--lake", root,
         "--key", "https://p/5", "--epoch", "9"],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert bad.returncode == 2 and "lookup-able epochs" in bad.stderr
