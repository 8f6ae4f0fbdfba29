"""Keyed point lookup (LakeTable.lookup_keys + the lookup CLI): O(probe)
keyed reads over the bucketed lake — bucket-hash routing, row-group
key-skipping, LWW/tombstone resolution, time-travel. Reference analog:
the modify writer's keyed store reads (FeatureWriters.scala:115-160)."""

import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.compute as pc
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


# -- bulk deletes built on the same keyed machinery --------------------------

def test_delete_keys_epoch(lake):
    """delete_keys: O(probe) keyed delete as an exactly-once maintenance
    epoch — tombstones only for live keys, absent keys no-op, time-travel
    and the tail cursor untouched."""
    before = lake.table.snapshot_table().num_rows
    r = lake.delete_keys(["https://p/5", "https://p/3",   # live, tombstoned
                          "https://nope"])                # absent
    assert r.rows_deleted == 1                            # only p/5 was live
    snap = lake.table.snapshot_table()
    assert snap.num_rows == before - 1
    assert "https://p/5" not in snap["url"].to_pylist()
    # maintenance epochs advance no offsets: the tail cursor is unchanged
    assert lake.committed_offset() == 104
    # pre-delete state is still time-travel readable
    assert lake.table.lookup_keys(["https://p/5"], epoch=1).num_rows == 1
    # replaying the same epoch is a no-op (exactly-once)
    assert lake.delete_keys(["https://p/0"], epoch=r.epoch) is None
    assert lake.table.snapshot_table().num_rows == before - 1


def test_delete_where_predicate(lake):
    """delete_where: predicate scan-delete — write side O(matches), null
    predicate values keep their rows, snapshot matches a manual filter."""
    snap0 = lake.table.snapshot_table()
    keep = snap0.filter(pc.fill_null(
        pc.not_equal(snap0["lang"], "de"), True))
    r = lake.delete_where(lambda b: pc.equal(b["lang"], "de"),
                          columns=["lang"])
    assert r.rows_deleted == snap0.num_rows - keep.num_rows > 0
    snap1 = lake.table.snapshot_table()
    assert sorted(snap1["url"].to_pylist()) == sorted(keep["url"].to_pylist())
    # deleting again finds nothing: commits a zero-delete epoch
    r2 = lake.delete_where(lambda b: pc.equal(b["lang"], "de"),
                           columns=["lang"])
    assert r2.rows_deleted == 0
    assert lake.table.snapshot_table().num_rows == snap1.num_rows


def test_delete_cli(lake):
    out = subprocess.run(
        [sys.executable, "-m", "geomesa_nifi_ray", "--num-cpus", "2",
         "delete", "--lake", lake.lake_root, "--key", "https://p/8"],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    r = json.loads(out.stdout.strip().splitlines()[-1])
    assert r["rows_deleted"] == 1
    assert lake.table.lookup_keys(["https://p/8"]).num_rows == 0


def test_snapshot_cli_time_travel(lake):
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        out = subprocess.run(
            [sys.executable, "-m", "geomesa_nifi_ray", "--num-cpus", "2",
             "snapshot", "--lake", lake.lake_root, "--out",
             os.path.join(td, "s"), "--format", "jsonl", "--epoch", "0"],
            capture_output=True, text=True, cwd="/root/repo",
            env={**os.environ, "RAY_ADDRESS": "local"},
        )
        assert out.returncode == 0, out.stderr[-2000:]
        r = json.loads(out.stdout.strip().splitlines()[-1])
        assert r["rows"] == 20                    # the pre-update epoch-0 state
    bad = subprocess.run(
        [sys.executable, "-m", "geomesa_nifi_ray", "snapshot", "--lake",
         lake.lake_root, "--out", "/tmp/x", "--format", "jsonl",
         "--epoch", "9"],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert bad.returncode == 2 and "committed epochs" in bad.stderr


def test_views_see_delete_maintenance_epochs(lake, tmp_path):
    """Incremental views must not advance past a delete maintenance epoch
    (offset_min/max = -1) with an empty delta: the offset-windowed delta
    misses tombstones carrying original offsets, so refresh recomputes at
    the epoch (the rewrite-epoch rule generalized to all offset-less
    epochs)."""
    from geomesa_nifi_ray.derived import GroupCountView, KeyedGroupCountView

    def lang_counts(t):
        from collections import Counter
        return {k: v for k, v in
                Counter(t["lang"].to_pylist()).items() if k is not None}

    view = GroupCountView(lake.table, str(tmp_path / "v"), group_col="lang")
    view.refresh()
    kview = KeyedGroupCountView(lake.table, str(tmp_path / "kv"),
                                group_col="lang")
    kview.refresh()
    assert view.counts() == lang_counts(lake.table.snapshot_table())

    lake.delete_where(lambda b: pc.equal(b["lang"], "de"), columns=["lang"])
    expect = lang_counts(lake.table.snapshot_table())
    assert "de" not in expect
    view.refresh()
    assert view.counts() == expect
    kview.refresh()
    assert kview.counts() == expect
    # the documented post-maintenance repair also converges (no-op here)
    view.rebuild()
    assert view.counts() == expect


def test_delete_epoch_egress_changes(lake):
    """A delete maintenance epoch must surface in the change stream: its
    egress is exactly the tombstone winners with _op='delete' (round-5
    review fix — the [-1,-1] offset window used to match nothing, so a
    change-stream mirror silently missed bulk deletes)."""
    r = lake.delete_keys(["https://p/5", "https://p/11"])
    assert r.rows_deleted == 2
    ch = lake.table.epoch_changes_dataset(r.epoch, include_ops=True)
    rows = ch.to_pandas()
    assert sorted(rows["url"]) == ["https://p/11", "https://p/5"]
    assert set(rows["_op"]) == {"delete"}
    # delete_where epochs egress the same way
    r2 = lake.delete_where(lambda b: pc.equal(b["lang"], "de"),
                           columns=["lang"])
    assert r2.rows_deleted > 0
    rows2 = lake.table.epoch_changes_dataset(
        r2.epoch, include_ops=True).to_pandas()
    assert len(rows2) == r2.rows_deleted
    assert set(rows2["_op"]) == {"delete"}


def test_rewrite_epoch_egress_reemits_live_rows(lake):
    """A rewrite (kernel-migration / backfill) epoch egresses every live
    row as an upsert — the full re-broadcast a downstream mirror needs,
    since the rewrite may have re-derived any value column."""
    live = lake.table.snapshot_table()
    r = lake.rewrite_epoch(lambda b: b)
    rows = lake.table.epoch_changes_dataset(
        r.epoch, include_ops=True).to_pandas()
    assert sorted(rows["url"]) == sorted(live["url"].to_pylist())
    assert set(rows["_op"]) == {"upsert"}


def test_lookup_cli_unknown_column(lake):
    out = subprocess.run(
        [sys.executable, "-m", "geomesa_nifi_ray", "lookup", "--lake",
         lake.lake_root, "--key", "https://p/0", "--columns", "url,bogus"],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert out.returncode == 2 and "unknown column" in out.stderr


def test_change_stream_mirror_including_maintenance(lake, ray_session,
                                                    tmp_path):
    """The change stream is a COMPLETE replication feed: a mirror lake
    built only from epoch_changes_dataset(include_ops=True) — across
    normal epochs, a bulk-delete maintenance epoch, a value-rewriting
    rewrite epoch, a whole-table clear, and a post-clear reload —
    converges to the source's exact snapshot (including content hashes),
    at a different bucket count."""
    lake.delete_keys(["https://p/5", "https://p/11"])

    def relang(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        i = b.schema.get_field_index("lang")
        return b.set_column(i, "lang", _pc.utf8_upper(b["lang"]))

    lake.rewrite_epoch(relang)

    mirror = CDCEngine(str(tmp_path / "mirror"), num_buckets=3)
    applied1 = mirror.mirror_from(lake.table)
    assert len(applied1) == 4          # 2 normal + delete + rewrite
    assert mirror.table.snapshot_table().sort_by("url").equals(
        lake.table.snapshot_table().sort_by("url"))

    lake.truncate()
    _epoch(lake, lake.table.committed_epoch() + 1,
           {"url": [f"https://q/{i}" for i in range(6)],
            "ts": [9_000_000 + i for i in range(6)]}, 200)

    # resumable: the second call applies ONLY the new epochs
    applied2 = mirror.mirror_from(lake.table)
    assert len(applied2) == 2          # clear + reload
    assert mirror.mirror_from(lake.table) == []   # idempotent

    src = lake.table.snapshot_table().sort_by("url")
    dst = mirror.table.snapshot_table().sort_by("url")
    assert src.num_rows == 6  # only the post-clear reload survives
    assert src.equals(dst)


def test_change_stream_mirror_across_schema_evolution(ray_session,
                                                      tmp_path):
    """Egress + mirror compose with additive schema evolution: the source
    widens mid-stream, old-epoch egress projects to the CURRENT schema
    (null-filled), and a mirror in UPDATE mode converges to the exact
    evolved snapshot."""
    from geomesa_nifi_ray.schema import CompatibilityMode
    from geomesa_nifi_ray.synth import BinlogSpec, write_binlog

    spec = BinlogSpec(num_events=400, num_urls=80, num_epochs=3, seed=11,
                      extra_column_from_epoch=1)
    binlog = write_binlog(str(tmp_path / "evo"), spec)
    src = CDCEngine(str(tmp_path / "src"), num_buckets=8,
                    compatibility=CompatibilityMode.UPDATE)
    src.replay_binlog(binlog, catchup=False)   # one epoch per commit
    assert src.table.meta["schema_version"] == 1

    # an EXISTING-mode mirror would silently drop the evolved column:
    # mirror_from refuses instead
    bad = CDCEngine(str(tmp_path / "bad"), num_buckets=4)
    with pytest.raises(ValueError, match="evolved columns"):
        bad.mirror_from(src.table)

    mirror = CDCEngine(str(tmp_path / "mirror"), num_buckets=4,
                       compatibility=CompatibilityMode.UPDATE)
    mirror.mirror_from(src.table)
    assert src.table.snapshot_table().sort_by("url").equals(
        mirror.table.snapshot_table().sort_by("url"))


def test_mirror_from_catchup_source_and_identity_guards(ray_session,
                                                        tmp_path):
    """mirror_from forwards epochs_covered (a catch-up source commits ONE
    manifest spanning several epochs), refuses to resume into a lake that
    tracks a different source or was never a mirror, and refuses a source
    that fell behind its mirror (rebuilt from scratch)."""
    from geomesa_nifi_ray.synth import BinlogSpec, write_binlog

    spec = BinlogSpec(num_events=300, num_urls=60, num_epochs=3, seed=5)
    binlog = write_binlog(str(tmp_path / "b"), spec)
    src = CDCEngine(str(tmp_path / "src"), num_buckets=4)
    src.replay_binlog(binlog, catchup=True)   # one spanning manifest

    mirror = CDCEngine(str(tmp_path / "m"), num_buckets=2)
    applied = mirror.mirror_from(src.table)
    assert len(applied) == 1                  # one manifest covers the span
    assert mirror.table.snapshot_table().sort_by("url").equals(
        src.table.snapshot_table().sort_by("url"))
    assert mirror.table.meta["mirror_source"].endswith("::pages")

    # unrelated source -> identity mismatch
    other = CDCEngine(str(tmp_path / "other"), num_buckets=2)
    _epoch(other, 0, {"url": ["https://o/1"], "ts": [1]}, 0)
    with pytest.raises(ValueError, match="tracks"):
        mirror.mirror_from(other.table)
    # non-mirror target with its own epochs -> refuse to interleave
    with pytest.raises(ValueError, match="fresh lake"):
        other.mirror_from(src.table)
    # source behind the mirror (rebuilt from scratch at the same path)
    # -> loud, not a silent no-op
    import shutil

    shutil.rmtree(str(tmp_path / "src"))
    rebuilt = CDCEngine(str(tmp_path / "src"), num_buckets=4)
    with pytest.raises(ValueError, match="rebuilt"):
        mirror.mirror_from(rebuilt.table)


def test_clear_and_delete_tombstones_hash_identically(ray_session,
                                                      tmp_path):
    """Clear-epoch tombstones carry the SAME converter-computed
    content_hash as a delete-epoch tombstone for the same winner (both
    hash null payloads with the table's kernel) — a change-stream
    consumer that dedupes or digest-checks sees one rendering of
    'this key died', regardless of which maintenance op killed it."""
    rows = {"url": [f"https://h/{i}" for i in range(4)],
            "ts": [1_000_000 + i for i in range(4)]}
    a = CDCEngine(str(tmp_path / "a"), num_buckets=2)
    _epoch(a, 0, rows, 0)
    a.delete_keys(["https://h/1"])
    del_rows = a.table.epoch_changes_dataset(1, include_ops=True).to_pandas()
    h_del = del_rows.set_index("url")["content_hash"]["https://h/1"]
    assert h_del  # delete tombstones carry a hash, not null

    b = CDCEngine(str(tmp_path / "b"), num_buckets=2)
    _epoch(b, 0, rows, 0)
    b.truncate()
    clr_rows = b.table.epoch_changes_dataset(1, include_ops=True).to_pandas()
    assert set(clr_rows["_op"]) == {"delete"}
    assert sorted(clr_rows["url"]) == sorted(rows["url"])
    h_clear = clr_rows.set_index("url")["content_hash"]["https://h/1"]
    assert h_clear == h_del


def test_mirror_cli(lake, tmp_path):
    dst = str(tmp_path / "mcli")
    out = subprocess.run(
        [sys.executable, "-m", "geomesa_nifi_ray", "--num-cpus", "2",
         "mirror", "--src-lake", lake.lake_root, "--lake", dst,
         "--buckets", "3"],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    r = json.loads(out.stdout.strip().splitlines()[-1])
    assert r["epochs_applied"] == 2 and r["committed_epoch"] == 1
    from geomesa_nifi_ray.lake import LakeTable
    m = LakeTable.load(dst, "pages")
    assert m.snapshot_table().sort_by("url").equals(
        lake.table.snapshot_table().sort_by("url"))
