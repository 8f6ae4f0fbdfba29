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


def test_generic_table_cdc_end_to_end(ray_session, tmp_path):
    """The engine is table-agnostic: a user-events table (key=user_id,
    order=(ts, offset), no html payload) runs the same convert ->
    schema-check -> delta upsert -> exactly-once commit chain via
    make_generic_convert_fn, verified against a DuckDB LWW oracle."""
    import os

    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from geomesa_nifi_ray.engine import CDCEngine, make_generic_convert_fn

    rng = __import__("numpy").random.RandomState(7)
    schema = pa.schema(
        [
            pa.field("user_id", pa.int64()),
            pa.field("ts", pa.timestamp("us")),
            pa.field("event_type", pa.string()),
            pa.field("value", pa.float64()),
            pa.field("content_hash", pa.string()),
            pa.field("offset", pa.int64()),
        ]
    )
    off = 0
    for e in range(3):
        n = 400
        t = pa.table(
            {
                "user_id": pa.array(rng.randint(0, 80, n), type=pa.int64()),
                "ts": pa.array(
                    [pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=int(s))
                     for s in rng.randint(0, 100_000, n)],
                    type=pa.timestamp("us"),
                ),
                "event_type": pa.array(rng.choice(["a", "b", "c"], n)),
                "value": pa.array(rng.rand(n), type=pa.float64()),
                "offset": pa.array(range(off, off + n), type=pa.int64()),
            }
        )
        d = tmp_path / "bl" / f"epoch-{e:05d}"
        os.makedirs(d)
        pq.write_table(t, str(d / "part-0.parquet"))
        off += n

    eng = CDCEngine(str(tmp_path / "lake"), table_name="user_events", num_buckets=4,
                    schema=schema, key="user_id", order=("ts", "offset"),
                    convert_fn_factory=make_generic_convert_fn)
    for e in range(3):
        eng.apply_epoch(str(tmp_path / "bl" / f"epoch-{e:05d}"), e,
                        (e * 400, e * 400 + 399))

    snap = eng.table.snapshot_table().select(["user_id", "ts", "value", "offset"])
    con = duckdb.connect()
    ora = con.execute(f"""
        SELECT user_id, ts, value, "offset" FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, "offset" DESC) rn
          FROM read_parquet('{tmp_path}/bl/epoch-*/*.parquet')
        ) WHERE rn = 1 ORDER BY user_id
    """).arrow()
    assert snap.num_rows == ora.num_rows
    assert snap["user_id"].to_pylist() == ora["user_id"].to_pylist()
    assert snap["offset"].to_pylist() == ora["offset"].to_pylist()
    assert snap["value"].to_pylist() == ora["value"].to_pylist()
    # delta chains were used (steady-state path works for generic tables too)
    assert any(x.get("deltas") for x in eng.table.live_entries().values())
