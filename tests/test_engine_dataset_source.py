"""apply_epoch with a Dataset source (not a path) + schema-check on it."""

import pyarrow as pa
import pytest

from geomesa_nifi_ray.engine import CDCEngine
from geomesa_nifi_ray.schema import SchemaError
from geomesa_nifi_ray.synth import BinlogSpec, synth_change_events


def test_dataset_source_apply(ray_session, tmp_path):
    import ray.data

    t = synth_change_events(BinlogSpec(num_events=400, num_urls=80, num_epochs=1, seed=3))
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=4)
    r = eng.apply_epoch(ray.data.from_arrow(t), 0, (0, 399))
    assert r is not None and r.rows_in == 400
    snap = eng.table.snapshot_table()
    assert snap.num_rows == r.table_rows > 0


def test_dataset_source_out_of_order_epoch(ray_session, tmp_path):
    import ray.data

    t = synth_change_events(BinlogSpec(num_events=100, num_urls=30, num_epochs=1, seed=3))
    eng = CDCEngine(str(tmp_path / "lake2"), num_buckets=4)
    with pytest.raises(SchemaError):
        eng.apply_epoch(ray.data.from_arrow(t), 3, (0, 99))  # cursor at None, expect 0
