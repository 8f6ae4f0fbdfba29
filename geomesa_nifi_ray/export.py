"""Snapshot export to columnar/row file formats — ``ConvertToGeoFile`` parity
(``ConvertToGeoFile.scala:91-190``: parquet, arrow, csv/tsv, json, gzip).

Parquet is the native lake format (``ds.write_parquet``); the other formats
are per-block ``map_batches`` encoder stages writing shard files — each
task encodes and writes its own blocks (no driver funnel), returning one
lineage row per shard, exactly like the export processors' per-file
success counting (``ConvertToGeoFile.scala:166-181``).
"""

from __future__ import annotations

import gzip as _gzip
import hashlib
import io
import os

import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.ipc as paipc


class _HashSink:
    """Write-only file object that folds bytes into an md5 — lets us hash a
    batch's full Arrow IPC serialization without buffering it."""

    closed = False

    def __init__(self):
        self.h = hashlib.md5()

    def write(self, b) -> int:
        self.h.update(b)
        return len(b)

    def flush(self) -> None:
        pass


def _shard_key(batch: pa.Table) -> str:
    """Content-deterministic shard name covering the FULL batch content (a
    sampled hash can collide between distinct batches and silently drop one
    via the tmp+rename overwrite). A re-run of the same export writes the
    same shard files, so exports are resumable / idempotent. Two batches
    that are byte-identical in every row deduplicate to one shard — the
    lineage table still carries one row per input batch, so multiplicity
    remains observable."""
    sink = _HashSink()
    with paipc.new_stream(pa.PythonFile(sink, mode="w"), batch.schema) as w:
        w.write_table(batch)
    return sink.h.hexdigest()[:20]


def _digest_key(data: bytes) -> str:
    """Shard name from already-encoded payload bytes (free: no re-encode)."""
    return hashlib.md5(data).hexdigest()[:20]

FORMATS = ("parquet", "csv", "tsv", "jsonl", "geojsonl", "gml", "gml2",
           "leaflet", "bin", "arrow", "avro")

# geojsonl: newline-delimited GeoJSON Features — the most-used of
# ConvertToGeoFile's geometry formats (ConvertToGeoFile.scala:197-211,
# GeoJSON export). Under the web-page payload analog there is no geometry
# column, so each row becomes a Feature with ``geometry: null`` and all
# columns as properties; a row carrying ``lon``/``lat`` (or ``longitude``/
# ``latitude``) columns gets a Point geometry, matching how the reference
# derives the default geometry from converter fields.
_GEO_LON_COLS = ("lon", "longitude")
_GEO_LAT_COLS = ("lat", "latitude")


def _geojson_feature(row: dict) -> dict:
    lon = next((row[c] for c in _GEO_LON_COLS if c in row), None)
    lat = next((row[c] for c in _GEO_LAT_COLS if c in row), None)
    geom = (
        {"type": "Point", "coordinates": [lon, lat]}
        if lon is not None and lat is not None
        else None
    )
    props = {k: v for k, v in row.items()
             if k not in _GEO_LON_COLS + _GEO_LAT_COLS}
    feature = {"type": "Feature", "geometry": geom, "properties": props}
    if "id" in row:
        feature["id"] = row["id"]
    return feature


# gml / gml2 / leaflet / bin — the remaining ConvertToGeoFile formats
# (ConvertToGeoFile.scala:197-211), payload-analog semantics documented
# per encoder below. With geojsonl these bring format parity to the
# reference's list (its "avro"=GeoAvro ≈ our schema-embedding avro;
# "avro-native" ≈ the same container with plain schema; "json" ≈ jsonl).

_GML_NS = {
    "gml": ("http://www.opengis.net/gml/3.2", "gml32"),
    "gml2": ("http://www.opengis.net/gml", "gml2"),
}


def _xml_name_ok(ch: str, first: bool) -> bool:
    o = ord(ch)
    # XML 1.0 NameStartChar ranges (minus ':' — NCName), fifth edition
    start = (ch == "_" or 0x41 <= o <= 0x5A or 0x61 <= o <= 0x7A
             or 0xC0 <= o <= 0xD6 or 0xD8 <= o <= 0xF6
             or 0xF8 <= o <= 0x2FF or 0x370 <= o <= 0x37D
             or 0x37F <= o <= 0x1FFF or 0x200C <= o <= 0x200D
             or 0x2070 <= o <= 0x218F or 0x2C00 <= o <= 0x2FEF
             or 0x3001 <= o <= 0xD7FF or 0xF900 <= o <= 0xFDCF
             or 0xFDF0 <= o <= 0xFFFD or 0x10000 <= o <= 0xEFFFF)
    if first:
        return start
    return (start or ch in "-." or 0x30 <= o <= 0x39 or o == 0xB7
            or 0x300 <= o <= 0x36F or 0x203F <= o <= 0x2040)


def _ncname(name: str) -> str:
    """Sanitize a column name into a valid XML NCName using the actual
    XML 1.0 NameStartChar/NameChar ranges (a blanket high-unicode
    allowance admits forbidden chars like U+00D7 '×' or U+2014 '—').
    Invalid chars -> '_', invalid first char gets a '_' prefix,
    empty -> '_'."""
    s = "".join(c if _xml_name_ok(c, False) else "_" for c in name)
    if not s or not _xml_name_ok(s[0], True):
        s = "_" + s
    return s


def _encode_gml(batch: pa.Table, version: str) -> bytes:
    """GML FeatureCollection: one featureMember per row, each column an
    element (XML-escaped, names NCName-sanitized); lon/lat columns emit a
    gml:Point, otherwise the geometry element is omitted (no geometry in
    the payload analog)."""
    from xml.sax.saxutils import escape

    ns, _ = _GML_NS[version]
    tags = {c: _ncname(c) for c in batch.column_names}
    out = [
        '<?xml version="1.0" encoding="UTF-8"?>\n',
        f'<gml:FeatureCollection xmlns:gml="{ns}">\n',
    ]
    for row in batch.to_pylist():
        fid = row.get("id", "")
        out.append(f'  <gml:featureMember><feature fid="{escape(str(fid))}">\n')
        lon = next((row[c] for c in _GEO_LON_COLS if c in row), None)
        lat = next((row[c] for c in _GEO_LAT_COLS if c in row), None)
        if lon is not None and lat is not None:
            coords = (f"<gml:pos>{lat} {lon}</gml:pos>" if version == "gml"
                      else f"<gml:coordinates>{lon},{lat}</gml:coordinates>")
            out.append(f"    <geometry><gml:Point>{coords}</gml:Point></geometry>\n")
        for k, v in row.items():
            if k in _GEO_LON_COLS + _GEO_LAT_COLS:
                continue
            tag = tags.get(k) or _ncname(k)
            out.append(f"    <{tag}>{escape('' if v is None else str(v))}</{tag}>\n")
        out.append("  </feature></gml:featureMember>\n")
    out.append("</gml:FeatureCollection>\n")
    return "".join(out).encode("utf-8")


def _encode_leaflet(batch: pa.Table) -> bytes:
    """Self-contained Leaflet HTML viewer (the reference's `leaflet` export
    is an HTML map page embedding the features): the batch's rows as a
    GeoJSON FeatureCollection wired into a standard Leaflet page skeleton.
    Deterministic bytes for identical input."""
    import json

    features = [_geojson_feature(r) for r in batch.to_pylist()]
    fc = json.dumps({"type": "FeatureCollection", "features": features},
                    default=str)
    html = (
        "<!DOCTYPE html>\n<html><head><meta charset='utf-8'/>"
        "<title>features</title>\n"
        "<link rel='stylesheet' href='https://unpkg.com/leaflet@1.9.4/dist/leaflet.css'/>\n"
        "<script src='https://unpkg.com/leaflet@1.9.4/dist/leaflet.js'></script>\n"
        "<style>#map{height:100vh}</style></head><body><div id='map'></div>\n"
        "<script>\nvar data = " + fc + ";\n"
        "var map = L.map('map').setView([0, 0], 2);\n"
        "L.tileLayer('https://{s}.tile.openstreetmap.org/{z}/{x}/{y}.png')"
        ".addTo(map);\n"
        "var layer = L.geoJSON(data).addTo(map);\n"
        "try { map.fitBounds(layer.getBounds()); } catch (e) {}\n"
        "</script></body></html>\n"
    )
    return html.encode("utf-8")


def _encode_bin(batch: pa.Table) -> bytes:
    """GeoMesa `bin` format analog: fixed 16-byte little-endian records
    ``(track_id:int32, dtg_seconds:int32, lat:float32, lon:float32)`` —
    the compact binary point encoding ConvertToGeoFile exposes. Payload
    analog: track_id = crc32 of the first string/key column (or the `id`
    column), dtg from the first timestamp column, lat/lon from lat/lon
    columns when present else 0.0. Fully vectorized numpy encode."""
    import zlib

    import numpy as np
    import pyarrow.compute as pc

    n = batch.num_rows
    id_col = "id" if "id" in batch.column_names else next(
        (f.name for f in batch.schema if pa.types.is_string(f.type)
         or pa.types.is_large_string(f.type)),
        batch.column_names[0],
    )
    ids = batch[id_col].to_pylist()
    track = np.fromiter((zlib.crc32(str(v).encode()) & 0x7FFFFFFF for v in ids),
                        dtype=np.int32, count=n)
    ts_col = next((f.name for f in batch.schema if pa.types.is_timestamp(f.type)), None)
    if ts_col is not None:
        secs = (pc.cast(batch[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
                // 1_000_000).astype(np.int32)
    else:
        secs = np.zeros(n, dtype=np.int32)
    def _f32(colnames):
        c = next((c for c in colnames if c in batch.column_names), None)
        if c is None:
            return np.zeros(n, dtype=np.float32)
        return pc.cast(pc.fill_null(batch[c], 0.0), pa.float32()).to_numpy(
            zero_copy_only=False)
    lat = _f32(_GEO_LAT_COLS)
    lon = _f32(_GEO_LON_COLS)
    rec = np.empty((n, 4), dtype="<i4")
    rec[:, 0] = track
    rec[:, 1] = secs
    rec[:, 2] = lat.view(np.int32) if lat.dtype == np.float32 else lat.astype(np.float32).view(np.int32)
    rec[:, 3] = lon.view(np.int32) if lon.dtype == np.float32 else lon.astype(np.float32).view(np.int32)
    return rec.tobytes()


def egress_epoch(table, epoch: int, out_dir: str, format: str = "jsonl",
                 gzip: bool = False, columns: list[str] | None = None,
                 where=None):
    """Change-stream egress to files: the ``GetGeoMesaKafkaRecord`` ->
    record-writer path (tail change stream, batch, serialize with per-batch
    record counts) re-expressed as: epoch's net row changes (from
    manifests) -> per-block encoder shards with a lineage row (path, rows,
    bytes) per shard.

    ``where=[(col, op, literal), ...]`` keeps only change rows satisfying
    the conjunction (same spec as ``snapshot_dataset``), evaluated BEFORE
    any column projection so predicate columns need not be exported. SQL
    null semantics apply: a maintenance tombstone carries only key+order
    columns, so a conjunct on any other column drops it — filter on the
    key column to keep a keyed consumer's deletes flowing."""
    from geomesa_nifi_ray.lake import apply_where_dataset

    validate_egress_projection(table, columns)
    ds = table.epoch_changes_dataset(epoch)
    if where is not None:
        ds = apply_where_dataset(ds, table.schema, where)
    if columns:
        ds = ds.map_batches(lambda t, c=tuple(columns): t.select(list(c)),
                            batch_format="pyarrow")
    return export_dataset(ds, out_dir, format=format, gzip=gzip)


def validate_egress_projection(table, columns: list[str] | None) -> None:
    """Driver-side check for an egress column projection (fail here, not
    as a RayTaskError out of the select task). ONE implementation — the
    CLI calls it inside its user-error scope and ``egress_epoch`` calls
    it again (idempotent), so the wording/rules can never drift."""
    if columns:
        unknown = [c for c in columns if c not in table.schema.names]
        if unknown:
            raise KeyError(f"egress column(s) {unknown} not in the stored "
                           f"schema")


def export_dataset(ds, out_dir: str, format: str = "parquet", gzip: bool = False,
                   partition_cols: list[str] | None = None):
    """Write a Dataset to ``out_dir`` in the requested format; returns a
    small lineage table (shard path, rows, bytes) for non-parquet formats
    or the output dir for parquet. ``partition_cols`` (parquet only)
    writes a hive-partitioned directory per value combination (e.g. one
    directory per ``lang`` or per train/val/test ``split``) for
    training-data handoff. Parquet exports APPEND on re-run (Ray writes
    uuid-named files), so a non-empty ``out_dir`` is rejected — unlike
    the shard formats, whose content-hash filenames make re-runs
    idempotent."""
    if format == "avro-native":   # reference surface alias: our avro IS the
        format = "avro"           # plain (non-Geo) container
    if format not in FORMATS:
        raise ValueError(f"unknown export format {format!r}; supported: {FORMATS}")
    if partition_cols and format != "parquet":
        raise ValueError("partition_cols is parquet-only")
    os.makedirs(out_dir, exist_ok=True)
    if format == "parquet":
        if gzip:
            raise ValueError("parquet has internal compression; gzip unsupported "
                             "(reference also exempts avro, ConvertToGeoFile.scala:134-154)")
        if os.listdir(out_dir):
            raise ValueError(
                f"parquet export appends on re-run (duplicating rows); "
                f"refusing non-empty out_dir {out_dir!r}")
        if partition_cols:
            names = set(ds.schema().names)
            bad = [c for c in partition_cols if c not in names]
            if bad:
                raise ValueError(f"unknown partition column(s) {bad}; "
                                 f"dataset columns: {sorted(names)}")
        ds.write_parquet(out_dir, partition_cols=partition_cols or None)
        return out_dir

    ext = {"csv": "csv", "tsv": "tsv", "jsonl": "jsonl",
           "geojsonl": "geojsonl", "gml": "gml", "gml2": "gml",
           "leaflet": "html", "bin": "bin",
           "arrow": "arrow", "avro": "avro"}[format]
    if gzip and format == "arrow":
        raise ValueError("arrow IPC files should use internal compression, not gzip")
    if gzip and format == "avro":
        # the reference exempts avro from gzip too (ConvertToGeoFile.scala:134-154)
        raise ValueError("avro containers carry their own codec; gzip unsupported")

    if format == "avro":
        from geomesa_nifi_ray.avro_io import write_avro

        def write_avro_shard(batch: pa.Table) -> pa.Table:
            name = f"shard-{_shard_key(batch)}.avro"
            path = os.path.join(out_dir, name)
            write_avro(batch, path)
            return pa.table(
                {
                    "path": pa.array([path]),
                    "rows": pa.array([batch.num_rows], type=pa.int64()),
                    "bytes": pa.array([os.path.getsize(path)], type=pa.int64()),
                }
            )

        return ds.map_batches(write_avro_shard, batch_format="pyarrow")

    def encode_shard(batch: pa.Table) -> pa.Table:
        buf = io.BytesIO()
        if format in ("csv", "tsv"):
            opts = pacsv.WriteOptions(delimiter="\t" if format == "tsv" else ",")
            pacsv.write_csv(batch, buf, write_options=opts)
        elif format == "jsonl":
            for row in batch.to_pylist():
                import json

                buf.write(json.dumps(row, default=str).encode())
                buf.write(b"\n")
        elif format == "geojsonl":
            import json

            for row in batch.to_pylist():
                buf.write(json.dumps(_geojson_feature(row), default=str).encode())
                buf.write(b"\n")
        elif format in ("gml", "gml2"):
            buf.write(_encode_gml(batch, format))
        elif format == "leaflet":
            buf.write(_encode_leaflet(batch))
        elif format == "bin":
            buf.write(_encode_bin(batch))
        else:  # arrow IPC stream file
            with paipc.new_file(buf, batch.schema) as w:
                w.write_table(batch)
        data = buf.getvalue()
        if gzip:
            data = _gzip.compress(data, compresslevel=6, mtime=0)
        name = f"shard-{_digest_key(data)}.{ext}" + (".gz" if gzip else "")
        path = os.path.join(out_dir, name)
        # resume skip: the name IS the content hash, so an existing file of
        # the right size already holds these bytes (a half-written crash
        # leaves only .tmp files, never a short final file)
        if not (os.path.exists(path) and os.path.getsize(path) == len(data)):
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, path)
        return pa.table(
            {
                "path": pa.array([path]),
                "rows": pa.array([batch.num_rows], type=pa.int64()),
                "bytes": pa.array([len(data)], type=pa.int64()),
            }
        )

    return ds.map_batches(encode_shard, batch_format="pyarrow")
