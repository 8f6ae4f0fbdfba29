"""Golden-fixture regression tests (SURVEY.md §5: golden Parquet fixture
comparisons + golden export bytes, the ConvertToGeoFileTest analog).

The committed fixture pins the ENTIRE deterministic chain — synth
generator, text kernel, content hash, LWW order, merge, snapshot — across
code changes and rounds. If a change legitimately alters semantics, the
kernel/spec version must be bumped and the fixture regenerated
consciously, never silently.
"""

import io
import os

import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.parquet as pq

from geomesa_nifi_ray.engine import CDCEngine
from geomesa_nifi_ray.synth import BinlogSpec, write_binlog

GOLDEN = os.path.join(os.path.dirname(__file__), "fixtures", "golden_snapshot.parquet")
SPEC = BinlogSpec(num_events=300, num_urls=60, num_epochs=2, seed=77)


def test_snapshot_matches_golden(ray_session, tmp_path):
    bl = write_binlog(str(tmp_path / "bl"), SPEC)
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=4)
    eng.replay_binlog(bl)
    snap = eng.table.snapshot_table()
    golden = pq.read_table(GOLDEN)
    assert snap.num_rows == golden.num_rows
    for col in golden.column_names:
        assert snap[col].to_pylist() == golden[col].to_pylist(), col


def test_golden_csv_export_bytes():
    """Golden export bytes for a fixed 3-row table (example.csv analog)."""
    t = pa.table(
        {
            "id": ["23623", "26236", "3233"],
            "name": ["Harry", "Hermione", "Severus"],
            "age": pa.array([20, 25, 30], type=pa.int32()),
        }
    )
    buf = io.BytesIO()
    pacsv.write_csv(t, buf)
    expected = (
        b'"id","name","age"\n'
        b'"23623","Harry",20\n'
        b'"26236","Hermione",25\n'
        b'"3233","Severus",30\n'
    )
    assert buf.getvalue() == expected
