"""Sources: change-stream readers and lake snapshot reads.

The reference's source surface is: flow-file micro-batches of CSV/JSON/
Avro/XML records (``PutGeoMesaRecord.scala:77-131``), a Kafka change-stream
tail (``GetGeoMesaKafkaRecord.scala``), and GeoAvro files with embedded
schema (``AvroToPutGeoMesa.scala``). Here:

- the binlog/WAL (epoch-sliced Parquet) is the change stream —
  :func:`read_epoch` / :func:`geomesa_nifi_ray.synth.write_binlog`;
- CSV/JSON record streams are read with ``ray.data.read_csv/read_json``
  and converted by a :class:`geomesa_nifi_ray.convert.RecordConverter`
  plan — :func:`read_records`;
- Parquet is the lake's native schema-embedding format; Avro container
  files (the GeoAvro analog, embedded schema) read via the pure-Python
  codec in :mod:`geomesa_nifi_ray.avro_io` — one decode task per file;
- XML readers are gated (no parser dependency worth carrying).
"""

from __future__ import annotations

from geomesa_nifi_ray.convert import FieldSpec, RecordConverter


def read_epoch(paths, columns: list[str] | None = None):
    """Read one epoch slice of the change log as a lazy Dataset."""
    import ray.data

    return ray.data.read_parquet(paths, columns=columns)


def read_records(paths, format: str = "csv", converter: RecordConverter | None = None,
                 **reader_kwargs):
    """Record-reader analog: CSV/JSON/Parquet in, optionally pushed through
    a converter plan (``map_batches`` with an actor pool when the plan is
    non-trivial)."""
    import ray.data

    readers = {
        "csv": ray.data.read_csv,
        "json": ray.data.read_json,
        "parquet": ray.data.read_parquet,
    }
    if format == "avro":
        ds = read_avro_files(paths)
    elif format == "xml":
        ds = read_xml_files(paths, **reader_kwargs)
    elif format not in readers:
        raise ValueError(f"unknown record format {format!r}")
    else:
        ds = readers[format](paths, **reader_kwargs)
    if converter is not None:
        ds = ds.map_batches(converter, batch_format="pyarrow")
    return ds


def read_xml_files(paths, record_tag: str | None = None):
    """XML record reader (stdlib ``xml.etree``; the NiFi XMLReader analog,
    ``records/package.scala:44-51``): each direct child of the document
    root (or each ``record_tag`` element) is one record; its child
    elements become string columns (missing -> null). Typed conversion is
    the converter plan's job, exactly like the reference's record-reader ->
    converter split. One parse task per file."""
    import glob as _glob
    import os as _os

    import pyarrow as pa
    import ray.data

    if isinstance(paths, str):
        paths = [paths]
    files: list[str] = []
    for p in paths:
        if _os.path.isdir(p):
            files.extend(sorted(_glob.glob(_os.path.join(p, "*.xml"))))
        else:
            files.append(p)
    missing = [f for f in files if not _os.path.exists(f)]
    if not files or missing:
        raise FileNotFoundError(f"no xml files under {paths} (missing: {missing})")

    def decode(batch: pa.Table) -> pa.Table:
        import xml.etree.ElementTree as ET

        rows: list[dict] = []
        cols: list[str] = []
        for path in batch["path"].to_pylist():
            root = ET.parse(path).getroot()
            records = root.findall(record_tag) if record_tag else list(root)
            for rec in records:
                row = {}
                for child in rec:
                    row[child.tag] = child.text
                    if child.tag not in cols:
                        cols.append(child.tag)
                rows.append(row)
        return pa.table(
            {c: pa.array([r.get(c) for r in rows], type=pa.string()) for c in cols}
        )

    control = ray.data.from_arrow(pa.table({"path": pa.array(files)}))
    return control.repartition(len(files)).map_batches(decode, batch_format="pyarrow")


def read_avro_files(paths):
    """Avro container files -> lazy Dataset, one decode task per file
    (embedded schema; ``AvroToPutGeoMesa.scala:84-173`` ingest contract)."""
    import glob as _glob
    import os as _os

    import pyarrow as pa
    import ray.data

    from geomesa_nifi_ray.avro_io import read_avro

    if isinstance(paths, str):
        paths = [paths]
    files: list[str] = []
    for p in paths:
        if _os.path.isdir(p):
            files.extend(sorted(_glob.glob(_os.path.join(p, "*.avro"))))
        else:
            files.append(p)
    missing = [f for f in files if not _os.path.exists(f)]
    if not files or missing:
        raise FileNotFoundError(f"no avro files under {paths} (missing: {missing})")

    def decode(batch: pa.Table) -> pa.Table:
        return pa.concat_tables([read_avro(p) for p in batch["path"].to_pylist()])

    control = ray.data.from_arrow(pa.table({"path": pa.array(files)}))
    return control.repartition(len(files)).map_batches(decode, batch_format="pyarrow")


from geomesa_nifi_ray.sources.spi import (  # noqa: E402
    FilesystemEpochSource,
    Source,
    SqliteBinlogSource,
)

__all__ = ["read_epoch", "read_records", "read_avro_files", "read_xml_files",
           "RecordConverter", "FieldSpec", "Source", "FilesystemEpochSource",
           "SqliteBinlogSource"]
