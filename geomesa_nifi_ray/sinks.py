"""Sink protocol: the pluggable-backend surface (DataStoreService SPI analog,
``geomesa-datastore-bundle/…/services/DataStoreService.java:15-31``).

The reference ships one thin connector shim per backend (Accumulo, HBase,
Kafka, Redis, FS/Iceberg, JDBC, Lambda) over a common load/new/dispose
protocol. Here a ``Sink`` is anything implementing the three-method
protocol below; the engine's lake is one implementation
(:class:`ParquetLakeSink`), and a user can plug an object-store or
table-format sink without touching the engine. Writes happen inside the
per-bucket merge tasks (each task owns its partition's handle — the
store-per-writer isolation of ``JdbcDataStoreService.scala:27-30``);
``commit`` runs once on the driver per epoch.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

import pyarrow as pa

from geomesa_nifi_ray.lake import LakeTable


@runtime_checkable
class Sink(Protocol):
    """Minimal pluggable-sink protocol."""

    def write_partition(self, table: pa.Table, bucket: int, epoch: int) -> str:
        """Durably write one bucket's merged state; return an opaque file/
        object reference for the manifest. Must be idempotent (deterministic
        destination for (bucket, epoch))."""
        ...

    def commit(self, manifest: dict) -> None:
        """Atomically publish an epoch manifest (exactly-once point)."""
        ...

    def read_schema(self) -> pa.Schema:
        """Current stored schema (the ``store.getSchema`` lookup analog)."""
        ...


class ParquetLakeSink:
    """The built-in sink: bucketed Parquet lake + manifest commit log."""

    def __init__(self, table: LakeTable):
        self.table = table

    def write_partition(self, data: pa.Table, bucket: int, epoch: int) -> str:
        return self.table.write_bucket_file(data, bucket, epoch)

    def commit(self, manifest: dict) -> None:
        self.table.commit_epoch(manifest)

    def read_schema(self) -> pa.Schema:
        return self.table.schema
