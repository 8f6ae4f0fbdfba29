"""Schema merge semantics — parity with DataStoreIngestProcessor.scala:225-301."""

import pyarrow as pa
import pytest

from geomesa_nifi_ray.schema import (
    CompatibilityMode,
    SchemaError,
    merge_schemas,
    project_to_schema,
    schema_from_json,
    schema_to_json,
)

BASE = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("lang", pa.string()),
    ]
)


def test_exact_match_ok():
    r = merge_schemas(BASE, BASE, CompatibilityMode.EXACT)
    assert r.schema.equals(BASE) and not r.evolved


def test_exact_extra_column_errors():
    incoming = BASE.append(pa.field("content_type", pa.string()))
    with pytest.raises(SchemaError):
        merge_schemas(BASE, incoming, CompatibilityMode.EXACT)


def test_exact_missing_column_errors():
    incoming = pa.schema([f for f in BASE if f.name != "lang"])
    with pytest.raises(SchemaError):
        merge_schemas(BASE, incoming, CompatibilityMode.EXACT)


def test_existing_projects_extras_and_nullfills():
    incoming = pa.schema(
        [pa.field("url", pa.string()), pa.field("warc_ts", pa.timestamp("us")),
         pa.field("content_type", pa.string())]
    )
    r = merge_schemas(BASE, incoming, CompatibilityMode.EXISTING)
    assert r.schema.equals(BASE)
    assert r.projected_away == ["content_type"]
    assert r.null_filled == ["lang"]
    assert not r.evolved


def test_update_widens_additively():
    incoming = BASE.append(pa.field("content_type", pa.string()))
    r = merge_schemas(BASE, incoming, CompatibilityMode.UPDATE)
    assert r.evolved and r.added_columns == ["content_type"]
    assert r.schema.names == ["url", "warc_ts", "lang", "content_type"]


def test_update_never_removes():
    incoming = pa.schema([f for f in BASE if f.name != "lang"])
    r = merge_schemas(BASE, incoming, CompatibilityMode.UPDATE)
    assert "lang" in r.schema.names  # removal unsupported -> column kept
    assert r.null_filled == ["lang"]


def test_type_change_hard_error():
    incoming = pa.schema(
        [pa.field("url", pa.string()), pa.field("warc_ts", pa.timestamp("us")),
         pa.field("lang", pa.int32())]
    )
    for mode in (CompatibilityMode.EXACT, CompatibilityMode.EXISTING):
        with pytest.raises(SchemaError, match="lang"):
            merge_schemas(BASE, incoming, mode)


def test_widening_assignable_silently():
    stored = pa.schema([pa.field("url", pa.string()), pa.field("n", pa.int64())])
    incoming = pa.schema([pa.field("url", pa.string()), pa.field("n", pa.int32())])
    r = merge_schemas(stored, incoming, CompatibilityMode.EXACT)
    assert r.schema.equals(stored)


def test_update_widens_types():
    stored = pa.schema([pa.field("url", pa.string()), pa.field("n", pa.int32())])
    incoming = pa.schema([pa.field("url", pa.string()), pa.field("n", pa.int64())])
    r = merge_schemas(stored, incoming, CompatibilityMode.UPDATE)
    assert r.evolved and r.schema.field("n").type == pa.int64()


def test_project_to_schema_reorder_cast_nullfill():
    t = pa.table({"n": pa.array([1, 2], type=pa.int32()), "url": ["a", "b"]})
    target = pa.schema(
        [pa.field("url", pa.string()), pa.field("n", pa.int64()), pa.field("lang", pa.string())]
    )
    out = project_to_schema(t, target)
    assert out.schema.names == ["url", "n", "lang"]
    assert out["n"].type == pa.int64()
    assert out["lang"].null_count == 2


def test_schema_json_roundtrip():
    s = pa.schema(
        [pa.field("a", pa.large_binary()), pa.field("b", pa.timestamp("us")),
         pa.field("c", pa.float64())]
    )
    assert schema_from_json(schema_to_json(s)).equals(pa.schema(
        [pa.field("a", pa.large_binary(), nullable=True),
         pa.field("b", pa.timestamp("us"), nullable=True),
         pa.field("c", pa.float64(), nullable=True)]
    ))
