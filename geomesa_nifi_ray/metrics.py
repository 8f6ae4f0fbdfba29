"""Lineage and metrics: per-(epoch, partition) accounting as queryable data.

The reference exposes Micrometer counters through a Prometheus registry
service (``service/PrometheusRegistryService.scala:21-63``, consumed
counter ``GetGeoMesaKafkaRecord.scala:177-178,300``) and per-flow-file
attributes (``geomesa.ingest.successes/failures``). Here the primary
lineage channel is the manifest commit log itself — every epoch records
offset range, per-bucket row counts, change counts and content-hash
digests — plus optional ``ray.util.metrics`` counters for live dashboards
(gated: the metrics agent may be absent in sealed/local runs).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from geomesa_nifi_ray.lake import LakeTable


def lineage_table(table: LakeTable) -> pa.Table:
    """Flatten the manifest log into one row per (epoch, bucket):
    epoch, bucket, file, rows, rows_changed, digest, offset range, rows_in,
    rows_failed, schema/kernel versions. This is the north-star
    "per-partition lineage (epoch, offset range, row counts, content
    hashes)" as a queryable Arrow table.

    Only manifests that exist are read: catch-up batched commits write one
    manifest covering an epoch *range*, so the log can have numbering gaps;
    ``epoch_first``/``epoch_last`` expose each manifest's covered range."""
    rows = []
    for e in table.manifest_epochs():
        m = table.manifest(e)
        covered = m.get("epochs_covered", [e, e])
        for b, entry in m["buckets"].items():
            rows.append(
                {
                    "epoch": e,
                    "epoch_first": int(covered[0]),
                    "epoch_last": int(covered[1]),
                    "bucket": int(b),
                    "file": entry["file"],
                    "rows": int(entry["rows"]),
                    "rows_changed": int(entry["rows_changed"]),
                    "digest": entry["digest"],
                    "offset_min": int(m["offset_min"]),
                    "offset_max": int(m["offset_max"]),
                    "rows_in": int(m["rows_in"]),
                    "rows_failed": int(m["rows_failed"]),
                    "schema_version": int(m["schema_version"]),
                    "kernel_version": m["kernel_version"],
                }
            )
    if not rows:
        return pa.table(
            {
                "epoch": pa.array([], type=pa.int64()),
                "epoch_first": pa.array([], type=pa.int64()),
                "epoch_last": pa.array([], type=pa.int64()),
                "bucket": pa.array([], type=pa.int64()),
                "file": pa.array([], type=pa.string()),
                "rows": pa.array([], type=pa.int64()),
                "rows_changed": pa.array([], type=pa.int64()),
                "digest": pa.array([], type=pa.string()),
                "offset_min": pa.array([], type=pa.int64()),
                "offset_max": pa.array([], type=pa.int64()),
                "rows_in": pa.array([], type=pa.int64()),
                "rows_failed": pa.array([], type=pa.int64()),
                "schema_version": pa.array([], type=pa.int64()),
                "kernel_version": pa.array([], type=pa.string()),
            }
        )
    return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)


def skew_report(table: LakeTable, epoch: int | None = None) -> pd.DataFrame:
    """Per-bucket row-count distribution at an epoch — the monitoring hook
    for hot-prefix skew (SURVEY.md §4 'monitor per-partition row counts')."""
    entries = table.live_entries(epoch)
    df = pd.DataFrame(
        {"bucket": list(entries), "rows": [int(e["rows"]) for e in entries.values()]}
    )
    if len(df):
        df["share"] = df["rows"] / max(1, df["rows"].sum())
    return df.sort_values("rows", ascending=False).reset_index(drop=True)


class EpochCounters:
    """Optional live counters via ``ray.util.metrics`` (no-op if the metrics
    subsystem is unavailable, e.g. dashboardless local mode)."""

    def __init__(self, table_name: str):
        self._ok = False
        try:  # pragma: no cover - metrics agent not present in tests
            from ray.util import metrics

            self.events = metrics.Counter(
                "cdc_events_applied",
                description="change events applied",
                tag_keys=("table",),
            )
            self.failures = metrics.Counter(
                "cdc_events_failed",
                description="change events dead-lettered",
                tag_keys=("table",),
            )
            self._tags = {"table": table_name}
            self._ok = True
        except Exception:
            pass

    def record(self, applied: int, failed: int) -> None:
        if self._ok:  # pragma: no cover
            if applied > 0:  # ray Counter.inc rejects non-positive values
                self.events.inc(applied, self._tags)
            if failed > 0:
                self.failures.inc(failed, self._tags)
