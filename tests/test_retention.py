"""Retention/TTL maintenance (`CDCEngine.expire_before`): age-off as one
exactly-once tombstone epoch — equivalence with the raw delete_where
predicate, idempotence, change-stream egress, and the CLI surface."""

import json
import subprocess
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from geomesa_nifi_ray.engine import CDCEngine


def _events(rows):
    from geomesa_nifi_ray.text import extract_text_batch

    html = pa.array([r[2] for r in rows], pa.large_binary())
    return pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "html": html,
        "text": extract_text_batch(html).cast(pa.large_string()),
        "lang": pa.array([r[3] for r in rows], pa.string()),
        "offset": pa.array([r[4] for r in rows], pa.int64()),
    })


H = 3_600_000_000  # 1h in us
EV = [(f"https://h/{i}", i * H, b"<html><body>x</body></html>", "en", i)
      for i in range(8)]


def _lake(tmp_path, name):
    import ray.data

    eng = CDCEngine(str(tmp_path / name), num_buckets=4)
    eng.apply_epoch(ray.data.from_arrow(_events(EV)), 0, (0, 7))
    return eng


def test_expire_matches_delete_where_and_is_idempotent(tmp_path, ray_session):
    cutoff = 4 * H  # keeps offsets 4..7
    a = _lake(tmp_path, "a")
    r = a.expire_before(pa.scalar(cutoff, pa.timestamp("us")).as_py())
    assert r is not None and r.rows_deleted == 4
    b = _lake(tmp_path, "b")
    lit = pa.scalar(cutoff, pa.timestamp("us"))
    b.delete_where(lambda t: pc.less(t["warc_ts"], lit), columns=[])
    sa = a.table.snapshot_table().sort_by("url")
    sb = b.table.snapshot_table().sort_by("url")
    assert sa.to_pydict() == sb.to_pydict()
    assert sa.num_rows == 4
    # idempotent: same epoch number -> no-op on re-run
    assert a.expire_before(cutoff, epoch=r.epoch) is None
    # egress of the retention epoch = exactly the aged-off tombstones
    ch = a.table.epoch_changes_dataset(r.epoch, include_ops=True).take_all()
    assert sorted(c["url"] for c in ch) == [f"https://h/{i}" for i in range(4)]
    assert all(c["_op"] == "delete" for c in ch)


def test_expire_accepts_iso_string(tmp_path, ray_session):
    eng = _lake(tmp_path, "c")
    r = eng.expire_before("1970-01-01T02:30:00")  # keeps ts >= 2.5h -> 3..7
    assert r is not None and r.rows_deleted == 3
    assert eng.table.snapshot_table().num_rows == 5


def test_expire_cli(tmp_path, ray_session):
    _lake(tmp_path, "d")
    r = subprocess.run(
        [sys.executable, "-m", "geomesa_nifi_ray", "--num-cpus", "2",
         "expire", "--lake", str(tmp_path / "d"),
         "--before", "1970-01-01T06:00:00"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["rows_deleted"] == 6 and out["table_rows"] == 2


def test_expire_cli_missing_lake_is_loud_and_side_effect_free(tmp_path):
    target = tmp_path / "typo"
    r = subprocess.run(
        [sys.executable, "-m", "geomesa_nifi_ray", "expire",
         "--lake", str(target), "--before", "2020-01-01"],
        capture_output=True, text=True)
    assert r.returncode == 2 and "no lake at" in r.stderr
    assert not target.exists()  # must not create a default-config lake


def test_replay_cli_transform_mismatch_is_clean_error(tmp_path, ray_session):
    _lake(tmp_path, "f")  # created WITHOUT a transform
    (tmp_path / "bl").mkdir()
    (tmp_path / "bl" / "binlog.json").write_text('{"epochs": []}')
    r = subprocess.run(
        [sys.executable, "-m", "geomesa_nifi_ray", "replay",
         "--binlog", str(tmp_path / "bl"), "--lake", str(tmp_path / "f"),
         "--key-transform", "normalize_url"],
        capture_output=True, text=True)
    # must fail on the stamp mismatch, cleanly
    assert r.returncode == 2, (r.returncode, r.stderr[-500:])
    assert "error:" in r.stderr and "key_transform" in r.stderr
    assert "Traceback" not in r.stderr


def test_expire_empty_table_refused(tmp_path, ray_session):
    eng = CDCEngine(str(tmp_path / "e"), num_buckets=2)
    with pytest.raises(Exception, match="empty table"):
        eng.expire_before("2020-01-01")
