"""End-to-end CDC replay: engine vs DuckDB oracle, crash/resume bit-identity,
schema evolution, partial update — the pytest analog of the reference's
exact read-back assertions (PutGeoMesaAccumuloTest.scala:562-810)."""

import glob
import json
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from geomesa_nifi_ray.engine import CDCEngine, PAGE_SCHEMA
from geomesa_nifi_ray.schema import CompatibilityMode, SchemaError
from geomesa_nifi_ray.synth import BinlogSpec, write_binlog

SPEC = BinlogSpec(num_events=3000, num_urls=500, num_epochs=3, seed=42)

ORACLE_SQL = """
WITH ranked AS (
  SELECT url, warc_ts, text, lang, "offset",
         md5(url || chr(31) || CAST(epoch_us(warc_ts) AS VARCHAR)
                 || chr(31) || text || chr(31) || lang) AS content_hash,
         row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, "offset" DESC) AS rn
  FROM read_parquet('{glob}')
  WHERE html IS NOT NULL AND url IS NOT NULL AND warc_ts IS NOT NULL
)
SELECT url, warc_ts, text, lang, content_hash, "offset"
FROM ranked WHERE rn = 1 ORDER BY url
"""


@pytest.fixture(scope="module")
def binlog(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("binlog"))
    return write_binlog(d, SPEC)


def _oracle_snapshot(binlog_meta) -> pa.Table:
    root = os.path.dirname(binlog_meta["epochs"][0]["path"])
    pattern = os.path.join(root, "epoch-*", "*.parquet")
    con = duckdb.connect()
    out = con.execute(ORACLE_SQL.format(glob=pattern)).arrow()
    con.close()
    return out


def _engine_snapshot(engine: CDCEngine) -> pa.Table:
    t = engine.table.snapshot_table()
    return t.select(["url", "warc_ts", "text", "lang", "content_hash", "offset"])


def _assert_snapshots_equal(ours: pa.Table, oracle: pa.Table):
    assert ours.num_rows == oracle.num_rows
    od = ours.to_pydict()
    xd = oracle.to_pydict()
    assert od["url"] == xd["url"]
    for c in ("text", "lang", "content_hash", "offset"):
        assert od[c] == xd[c], f"column {c} mismatch"
    ots = [v.replace(tzinfo=None) if v.tzinfo else v for v in xd["warc_ts"]] if xd["warc_ts"] and hasattr(xd["warc_ts"][0], "tzinfo") else xd["warc_ts"]
    assert od["warc_ts"] == ots


def test_full_replay_matches_oracle(ray_session, tmp_lake, binlog):
    eng = CDCEngine(tmp_lake, num_buckets=16)
    results = eng.replay_binlog(binlog)
    assert len(results) == 3
    assert eng.table.committed_epoch() == 2
    ours = _engine_snapshot(eng)
    oracle = _oracle_snapshot(binlog)
    _assert_snapshots_equal(ours, oracle)
    # text byte-identity per url is implied by exact equality of the text
    # column against the oracle's (which carries synth-time kernel output)


def test_failure_accounting(ray_session, tmp_lake, binlog):
    eng = CDCEngine(os.path.join(tmp_lake, "acct"), num_buckets=8)
    results = eng.replay_binlog(binlog)
    total_in = sum(r.rows_in for r in results)
    total_failed = sum(r.rows_failed for r in results)
    total_collapsed = sum(r.rows_collapsed for r in results)
    total_applied = sum(r.rows_applied for r in results)
    assert total_in == SPEC.num_events
    # failed counts EXACTLY the dead-lettered rows (synth nulls only html);
    # LWW-collapsed duplicates are accounted separately
    null_html = sum(
        pq.read_table(e["path"], columns=["html"])["html"].null_count
        for e in binlog["epochs"]
    )
    assert total_failed == null_html > 0
    assert total_collapsed > 0
    assert total_in == total_applied + total_failed + total_collapsed


def test_crash_resume_bit_identical(ray_session, tmp_path, binlog):
    """Kill between data write and manifest commit; resume must reproduce the
    uninterrupted run's snapshot exactly (SURVEY.md §5 carry-over)."""
    lake_a = str(tmp_path / "lake_a")
    lake_b = str(tmp_path / "lake_b")

    # uninterrupted run
    eng_a = CDCEngine(lake_a, num_buckets=16)
    eng_a.replay_binlog(binlog)

    # interrupted run: apply epochs 0-1, then simulate a crash mid-epoch-2:
    # bucket files written but manifest missing
    eng_b = CDCEngine(lake_b, num_buckets=16)
    for e in binlog["epochs"][:2]:
        eng_b.apply_epoch(e["path"], e["epoch"], (e["offset_min"], e["offset_max"]))

    e2 = binlog["epochs"][2]
    eng_b.apply_epoch(e2["path"], e2["epoch"], (e2["offset_min"], e2["offset_max"]))
    # drop the commit record (as if we crashed before the manifest rename)
    os.remove(os.path.join(lake_b, "pages", "_log", "epoch-00002.json"))
    # stray uncommitted epoch-2 data files now litter the lake; readers must
    # not see them
    eng_b2 = CDCEngine(lake_b, num_buckets=16)
    assert eng_b2.table.committed_epoch() == 1

    # resume: replay_binlog skips committed epochs, re-runs epoch 2
    results = eng_b2.replay_binlog(binlog)
    assert [r.epoch for r in results] == [2]

    snap_a = eng_a.table.snapshot_table()
    snap_b = eng_b2.table.snapshot_table()
    assert snap_a.equals(snap_b)  # bit-identical table state

    # manifests identical too (modulo nothing — fully deterministic)
    ma = eng_a.table.manifest(2)
    mb = eng_b2.table.manifest(2)
    assert ma == mb


def test_catchup_batch_equals_sequential(ray_session, tmp_path, binlog):
    """Catch-up mode (all pending epochs in one pipeline + one commit) must
    produce the identical table: LWW under (warc_ts, offset) is associative."""
    seq = CDCEngine(str(tmp_path / "lk_seq"), num_buckets=16)
    seq.replay_binlog(binlog)
    bat = CDCEngine(str(tmp_path / "lk_bat"), num_buckets=16)
    results = bat.replay_binlog(binlog, catchup=True)
    assert len(results) == 1                       # single schema -> one batch
    assert bat.table.committed_epoch() == 2
    m = bat.table.manifest(2)
    assert m["epochs_covered"] == [0, 2]
    assert m["offset_min"] == binlog["epochs"][0]["offset_min"]
    assert m["offset_max"] == binlog["epochs"][2]["offset_max"]
    assert seq.table.snapshot_table().equals(bat.table.snapshot_table())
    # resume after a catch-up commit: nothing pending
    assert bat.replay_binlog(binlog, catchup=True) == []


def test_catchup_respects_schema_boundaries(ray_session, tmp_path):
    spec = BinlogSpec(num_events=600, num_urls=120, num_epochs=3, seed=7,
                      extra_column_from_epoch=2)
    bl = write_binlog(str(tmp_path / "evo_b"), spec)
    eng = CDCEngine(str(tmp_path / "lk_evo_b"), num_buckets=8,
                    compatibility=CompatibilityMode.UPDATE)
    results = eng.replay_binlog(bl, catchup=True)
    # epochs 0-1 share a schema (one batch); epoch 2 adds content_type
    assert [r.manifest["epochs_covered"] for r in results] == [[0, 1], [2, 2]]
    assert "content_type" in eng.table.schema.names


def test_replay_is_idempotent(ray_session, tmp_path, binlog):
    lake = str(tmp_path / "lake_i")
    eng = CDCEngine(lake, num_buckets=16)
    eng.replay_binlog(binlog)
    snap1 = eng.table.snapshot_table()
    again = eng.replay_binlog(binlog)  # all epochs already committed
    assert again == []
    assert eng.table.snapshot_table().equals(snap1)


def test_schema_evolution_update_mode(ray_session, tmp_path):
    spec = BinlogSpec(num_events=600, num_urls=120, num_epochs=3, seed=7,
                      extra_column_from_epoch=1)
    binlog = write_binlog(str(tmp_path / "evo"), spec)
    eng = CDCEngine(str(tmp_path / "lake_evo"), num_buckets=8,
                    compatibility=CompatibilityMode.UPDATE)
    eng.replay_binlog(binlog)
    schema = eng.table.schema
    assert "content_type" in schema.names          # widened at epoch 1
    assert eng.table.meta["schema_version"] == 1
    snap = eng.table.snapshot_table()
    # epoch-0 winners read back null-filled; later winners carry the value
    ct = snap["content_type"].to_pylist()
    assert any(v == "text/html" for v in ct)


def test_schema_evolution_existing_mode_projects(ray_session, tmp_path):
    spec = BinlogSpec(num_events=400, num_urls=80, num_epochs=2, seed=7,
                      extra_column_from_epoch=1)
    binlog = write_binlog(str(tmp_path / "evo2"), spec)
    eng = CDCEngine(str(tmp_path / "lake_evo2"), num_buckets=8,
                    compatibility=CompatibilityMode.EXISTING)
    eng.replay_binlog(binlog)
    assert "content_type" not in eng.table.schema.names  # projected away
    assert eng.table.meta["schema_version"] == 0


def test_schema_evolution_exact_mode_fails(ray_session, tmp_path):
    spec = BinlogSpec(num_events=400, num_urls=80, num_epochs=2, seed=7,
                      extra_column_from_epoch=1)
    binlog = write_binlog(str(tmp_path / "evo3"), spec)
    eng = CDCEngine(str(tmp_path / "lake_evo3"), num_buckets=8,
                    compatibility=CompatibilityMode.EXACT)
    e0 = binlog["epochs"][0]
    eng.apply_epoch(e0["path"], 0, (e0["offset_min"], e0["offset_max"]))
    e1 = binlog["epochs"][1]
    with pytest.raises(SchemaError):
        eng.apply_epoch(e1["path"], 1, (e1["offset_min"], e1["offset_max"]))


def test_partial_update_mode(ray_session, tmp_path, binlog):
    """UpdateGeoMesaRecord parity: updates only touch existing keys."""
    lake = str(tmp_path / "lake_u")
    eng = CDCEngine(lake, num_buckets=16)
    e0 = binlog["epochs"][0]
    eng.apply_epoch(e0["path"], 0, (e0["offset_min"], e0["offset_max"]))
    before = eng.table.snapshot_table()

    e1 = binlog["epochs"][1]
    r = eng.apply_epoch(e1["path"], 1, (e1["offset_min"], e1["offset_max"]), mode="update")
    after = eng.table.snapshot_table()
    # no inserts: key set unchanged
    assert set(after["url"].to_pylist()) == set(before["url"].to_pylist())
    assert r.rows_failed > 0  # new urls in epoch 1 counted as no-match failures


def test_lineage_manifest_contents(ray_session, tmp_path, binlog):
    eng = CDCEngine(str(tmp_path / "lake_m"), num_buckets=16)
    eng.replay_binlog(binlog)
    m = eng.table.manifest(1)
    assert m["offset_min"] == binlog["epochs"][1]["offset_min"]
    assert m["kernel_version"]
    assert m["schema_fingerprint"]
    entry = next(iter(m["buckets"].values()))
    assert {"file", "rows", "rows_changed", "digest"} <= set(entry)
    # manifest json durable and parseable off disk
    raw = json.load(open(glob.glob(os.path.join(str(tmp_path / "lake_m"), "pages", "_log", "*.json"))[0]))
    assert raw["epoch"] == 0
