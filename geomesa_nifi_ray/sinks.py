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
    """Pluggable data-plane protocol. The engine's metadata plane (schema,
    manifest commit log, epoch cursor) stays in :class:`LakeTable` — the
    sink owns only partition bytes, so any backend that can durably write
    and read a keyed partition participates in the same exactly-once
    protocol. Instances are pickled into the per-bucket merge tasks; keep
    them connection-free (open handles lazily per call)."""

    def write_partition(self, table: pa.Table, bucket: int, epoch: int,
                        kind: str = "base") -> str:
        """Durably write one bucket's state (``kind='base'``) or epoch delta
        (``kind='delta'``); return an opaque reference recorded in the
        manifest. Must be idempotent (deterministic destination for
        (bucket, epoch, kind))."""
        ...

    def read_partition(self, ref: str, columns: list[str] | None = None) -> pa.Table:
        """Read a previously written partition by its manifest reference,
        optionally column-pruned (the delta merge reads only key+order)."""
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

    def write_partition(self, data: pa.Table, bucket: int, epoch: int,
                        kind: str = "base") -> str:
        return self.table.write_bucket_file(data, bucket, epoch, kind)

    def read_partition(self, ref: str, columns: list[str] | None = None) -> pa.Table:
        path = self.table.abs_path(ref)
        if columns is not None:
            # lenient projection: requesting a column the partition lacks
            # (e.g. the optional _tomb marker) simply omits it
            avail = set(self.table.fs.read_parquet_schema(path).names)
            columns = [c for c in columns if c in avail]
        return self.table.fs.read_parquet(path, columns=columns)

    def read_partition_keyed(self, ref: str, columns: list[str] | None,
                             key: str, keys_sorted: list,
                             ) -> tuple[pa.Table, int, int]:
        """Key-pruned chain read (OPTIONAL protocol extension — the delta
        merge probes for it with ``getattr``): bucket files are key-sorted,
        so parquet row-group min/max statistics skip row groups that cannot
        contain any of the epoch's keys. Returns ``(table, row_groups_total,
        row_groups_kept)``; columns leniently projected like
        ``read_partition``. This is what bounds a small epoch's merge reads
        by the epoch's key span instead of the touched buckets' full chains
        (the reference's keyed-index point reads,
        ``FeatureWriters.scala:115-160``)."""
        return self.table.fs.read_parquet_pruned(
            self.table.abs_path(ref), columns, key, keys_sorted)

    def commit(self, manifest: dict) -> None:
        self.table.commit_epoch(manifest)

    def read_schema(self) -> pa.Schema:
        return self.table.schema


class SqliteSink:
    """Second concrete backend over the SPI: each bucket lives in its own
    sqlite database file, each (epoch, kind) as a table inside it — the
    store-per-writer isolation of the reference's JDBC shim
    (``JdbcDataStoreService.scala:27-30``: one store per writer to dodge
    the write lock; here one db per bucket, so parallel merge tasks never
    contend). Partition schema fidelity is kept in a ``_partitions`` side
    table (arrow schema JSON per ref). Scalar columns only (the engine's
    page schema); timestamps store as int64 microseconds.
    """

    def __init__(self, root: str, table: LakeTable | None = None):
        import os

        self.root = root
        self.table = table  # commit log delegate (metadata plane)
        os.makedirs(root, exist_ok=True)

    # -- helpers ------------------------------------------------------------

    @staticmethod
    def _sql_type(t: pa.DataType) -> str:
        if pa.types.is_integer(t) or pa.types.is_boolean(t) or pa.types.is_timestamp(t):
            return "INTEGER"
        if pa.types.is_floating(t):
            return "REAL"
        if pa.types.is_binary(t) or pa.types.is_large_binary(t):
            return "BLOB"
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return "TEXT"
        raise ValueError(f"SqliteSink supports scalar columns only, got {t}")

    def _db_path(self, bucket: int) -> str:
        import os

        return os.path.join(self.root, f"bucket={bucket:05d}.db")

    def _connect(self, bucket: int):
        import sqlite3

        con = sqlite3.connect(self._db_path(bucket), timeout=60)
        con.execute(
            "CREATE TABLE IF NOT EXISTS _partitions (ref TEXT PRIMARY KEY, "
            "tbl TEXT, schema_json TEXT)"
        )
        return con

    # -- Sink protocol ------------------------------------------------------

    def write_partition(self, data: pa.Table, bucket: int, epoch: int,
                        kind: str = "base") -> str:
        import json

        from geomesa_nifi_ray.schema import schema_to_json

        ref = f"bucket={bucket:05d}::{kind}-{epoch:05d}"
        tbl = f"{kind}_{epoch:05d}"
        import pyarrow.compute as pc

        cols = []
        for f in data.schema:
            col = data[f.name]
            if pa.types.is_timestamp(f.type):
                col = pc.cast(col, pa.int64())
            cols.append(col.to_pylist())
        con = self._connect(bucket)
        try:
            with con:  # one transaction: drop+create+insert is atomic
                con.execute(f'DROP TABLE IF EXISTS "{tbl}"')
                decl = ", ".join(
                    f'"{f.name}" {self._sql_type(f.type)}' for f in data.schema
                )
                con.execute(f'CREATE TABLE "{tbl}" ({decl})')
                placeholders = ", ".join("?" * len(data.schema))
                con.executemany(
                    f'INSERT INTO "{tbl}" VALUES ({placeholders})',
                    list(zip(*cols)) if cols else [],
                )
                con.execute(
                    "INSERT OR REPLACE INTO _partitions VALUES (?, ?, ?)",
                    (ref, tbl, json.dumps(schema_to_json(data.schema))),
                )
        finally:
            con.close()
        return ref

    def read_partition(self, ref: str, columns: list[str] | None = None) -> pa.Table:
        import json

        from geomesa_nifi_ray.schema import schema_from_json

        bucket = int(ref.split("::")[0].split("=")[1])
        con = self._connect(bucket)
        try:
            row = con.execute(
                "SELECT tbl, schema_json FROM _partitions WHERE ref = ?", (ref,)
            ).fetchone()
            if row is None:
                raise FileNotFoundError(f"no partition {ref!r} in {self._db_path(bucket)}")
            tbl, schema_json = row
            schema = schema_from_json(json.loads(schema_json))
            names = [f.name for f in schema if columns is None or f.name in columns]
            sel = ", ".join(f'"{n}"' for n in names)
            rows = con.execute(f'SELECT {sel} FROM "{tbl}"').fetchall()
        finally:
            con.close()
        arrays = {}
        for i, n in enumerate(names):
            t = schema.field(n).type
            vals = [r[i] for r in rows]
            if pa.types.is_timestamp(t):
                arrays[n] = pa.array(vals, type=pa.int64()).cast(t)
            elif pa.types.is_boolean(t):
                arrays[n] = pa.array(
                    [None if v is None else bool(v) for v in vals], type=t
                )
            else:
                arrays[n] = pa.array(vals, type=t)
        out_schema = pa.schema([schema.field(n) for n in names])
        if not arrays:
            return out_schema.empty_table()
        return pa.Table.from_arrays([arrays[n] for n in names], schema=out_schema)

    def commit(self, manifest: dict) -> None:
        if self.table is None:
            raise RuntimeError("SqliteSink needs a LakeTable commit-log delegate")
        self.table.commit_epoch(manifest)

    def read_schema(self) -> pa.Schema:
        if self.table is None:
            raise RuntimeError("SqliteSink needs a LakeTable commit-log delegate")
        return self.table.schema
