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

FORMATS = ("parquet", "csv", "tsv", "jsonl", "geojsonl", "arrow", "avro")

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


def egress_epoch(table, epoch: int, out_dir: str, format: str = "jsonl",
                 gzip: bool = False, columns: list[str] | None = None):
    """Change-stream egress to files: the ``GetGeoMesaKafkaRecord`` ->
    record-writer path (tail change stream, batch, serialize with per-batch
    record counts) re-expressed as: epoch's net row changes (from
    manifests) -> per-block encoder shards with a lineage row (path, rows,
    bytes) per shard."""
    ds = table.epoch_changes_dataset(epoch)
    if columns:
        ds = ds.map_batches(lambda t, c=tuple(columns): t.select(list(c)),
                            batch_format="pyarrow")
    return export_dataset(ds, out_dir, format=format, gzip=gzip)


def export_dataset(ds, out_dir: str, format: str = "parquet", gzip: bool = False):
    """Write a Dataset to ``out_dir`` in the requested format; returns a
    small lineage table (shard path, rows, bytes) for non-parquet formats
    or the output dir for parquet."""
    if format not in FORMATS:
        raise ValueError(f"unknown export format {format!r}; supported: {FORMATS}")
    os.makedirs(out_dir, exist_ok=True)
    if format == "parquet":
        if gzip:
            raise ValueError("parquet has internal compression; gzip unsupported "
                             "(reference also exempts avro, ConvertToGeoFile.scala:134-154)")
        ds.write_parquet(out_dir)
        return out_dir

    ext = {"csv": "csv", "tsv": "tsv", "jsonl": "jsonl",
           "geojsonl": "geojsonl", "arrow": "arrow", "avro": "avro"}[format]
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
        else:  # arrow IPC stream file
            with paipc.new_file(buf, batch.schema) as w:
                w.write_table(batch)
        data = buf.getvalue()
        if gzip:
            data = _gzip.compress(data, compresslevel=6, mtime=0)
        name = f"shard-{_digest_key(data)}.{ext}" + (".gz" if gzip else "")
        path = os.path.join(out_dir, name)
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
