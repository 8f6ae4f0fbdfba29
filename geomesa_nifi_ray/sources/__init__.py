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
- Parquet is the schema-embedding format (GeoAvro analog);
- Avro/XML readers are gated behind import-try (libs absent here).
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
    if format == "avro":  # pragma: no cover
        raise NotImplementedError(
            "avro reader requires fastavro (not in this container); "
            "convert to parquet upstream or install fastavro"
        )
    if format == "xml":  # pragma: no cover
        raise NotImplementedError("xml record reader not supported; use csv/json/parquet")
    if format not in readers:
        raise ValueError(f"unknown record format {format!r}")
    ds = readers[format](paths, **reader_kwargs)
    if converter is not None:
        ds = ds.map_batches(converter, batch_format="pyarrow")
    return ds


__all__ = ["read_epoch", "read_records", "RecordConverter", "FieldSpec"]
