"""Named pipelines (the ``queries()`` registry) with DuckDB oracle SQL.

Each entry is ``fn(sf_dir) -> ray.data.Dataset | pa.Table | pd.DataFrame``.
The CDC pipelines run over a deterministic synthesized binlog derived from
the sf directory name (no external data; BASELINE.json input_hint shape);
relational / text / embedding pipelines run over the driver's pre-registered
parquet views. Column names match the oracle SQL exactly (the driver's
compare hashes values under sorted column names).

Float-valued aggregates are rounded to 4 decimals on BOTH sides so
summation-order differences between Ray and DuckDB cannot flip the hash.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from geomesa_nifi_ray import dedup as dd
from geomesa_nifi_ray.convert import FieldSpec, RecordConverter
from geomesa_nifi_ray.engine import CDCEngine
from geomesa_nifi_ray.schema import project_to_schema
from geomesa_nifi_ray.similarity import fixed_dim_matrix
from geomesa_nifi_ray.synth import BinlogSpec, write_binlog
from geomesa_nifi_ray.textstats import LangIdStage, QualityStage
from geomesa_nifi_ray.upsert import lww_dedupe

CDC_ROOT = os.environ.get("GRAFT_CDC_ROOT", "/tmp/graft_cdc")

# binlog sizing per sf directory basename
_BINLOG_SPECS = {
    "sf0.001": BinlogSpec(num_events=4_000, num_urls=800, num_epochs=3),
    "sf0.01": BinlogSpec(num_events=20_000, num_urls=4_000, num_epochs=4),
    # bench tier: large enough that per-epoch compute dominates the fixed
    # pipeline/shuffle overhead at 32 CPUs (scaling-efficiency evidence)
    "sf0.1": BinlogSpec(num_events=3_000_000, num_urls=450_000, num_epochs=5),
    # scaling tier: sized so BOTH the 8-CPU and 32-CPU points sit above the
    # pipeline's efficient floor (a 3M binlog at 8 CPUs was starved, making
    # 8->32 superlinear and the efficiency number meaningless)
    "scaling": BinlogSpec(num_events=10_000_000, num_urls=1_500_000, num_epochs=5),
}


def _sf_name(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir))


def binlog_dir(sf_dir: str) -> str:
    return os.path.join(CDC_ROOT, _sf_name(sf_dir), "binlog")


def get_binlog(sf_dir: str) -> dict:
    """Deterministic change-event binlog for an sf tier (idempotent)."""
    name = _sf_name(sf_dir)
    spec = _BINLOG_SPECS.get(name, _BINLOG_SPECS["sf0.01"])
    return write_binlog(binlog_dir(sf_dir), spec)


SNAPSHOT_COLS = ["url", "warc_ts", "text", "lang", "content_hash", "offset"]


def _lake_key(meta: dict) -> str:
    """Key lake dirs by binlog spec + kernel version so a code change can't
    silently reuse a stale lake built by an older engine."""
    import hashlib
    import json

    from geomesa_nifi_ray.text import TEXT_KERNEL_VERSION

    # LAYOUT v2: delta-file chains + epoch_file manifest entries (round 2);
    # bumping the key rebuilds cached lakes instead of trusting forward-compat
    payload = json.dumps([meta["spec"], TEXT_KERNEL_VERSION, "layout-v2"], sort_keys=True)
    return hashlib.md5(payload.encode()).hexdigest()[:10]


def run_cdc_replay(sf_dir: str, lake_root: str | None = None, num_buckets: int = 32,
                   catchup: bool = False, exchange: str | None = None) -> CDCEngine:
    """Full exactly-once replay of the sf tier's binlog into a lake."""
    meta = get_binlog(sf_dir)
    if lake_root is None:
        lake_root = os.path.join(CDC_ROOT, _sf_name(sf_dir), f"lake-{_lake_key(meta)}")
    eng = CDCEngine(lake_root, num_buckets=num_buckets)
    eng.replay_binlog(meta, catchup=catchup, exchange=exchange)
    return eng


# ------------------------------------------------------------ CDC queries --


def q_cdc_replay_snapshot(sf_dir: str):
    eng = run_cdc_replay(sf_dir)
    return eng.table.snapshot_table().select(SNAPSHOT_COLS)


def q_cdc_url_normalized(sf_dir: str):
    """URL normalization over the lake winners (`text.normalize_urls`):
    fragment strip, bare-``?`` strip, lowercased scheme+authority — the
    canonical-key step before url-level dedup of a crawl. Vectorized
    RE2 passes per batch; returns (url, url_norm) so the SQL oracle
    value-checks the full normalization rule."""
    from geomesa_nifi_ray.text import normalize_urls

    eng = run_cdc_replay(sf_dir)
    ds = eng.table.snapshot_dataset(columns=["url"])

    def stage(t: pa.Table) -> pa.Table:
        return t.append_column("url_norm", normalize_urls(t["url"]))

    return ds.map_batches(stage, batch_format="pyarrow")


def q_cdc_replay_norm_keys(sf_dir: str):
    """Canonical-key ingest end to end: the sf binlog replayed into a
    lake created with ``key_transform="normalize_url"`` — the converter
    id-field expression analog (``SimpleFeatureRecordConverter.scala:
    79-116``): the key column is canonicalized by a table-stamped,
    fingerprint-verified vectorized kernel BEFORE LWW/bucketing, so
    distinct spellings of one page (fragment, bare ``?``, host case)
    dedupe to one lake row, and probe paths (point lookup, delete_keys)
    accept raw un-normalized URLs. The SQL oracle applies the identical
    normalization chain to the raw change stream before its LWW window,
    value-checking key transformation + dedup + content hashing in one
    query. (The sf binlog's URLs are already canonical, so this checks
    the transform is a faithful no-op there; the collapse behavior on
    messy URLs is covered by tests/test_key_transform.py.)"""
    from geomesa_nifi_ray.text import key_transform_fingerprint

    meta = get_binlog(sf_dir)
    # the cache key includes the transform's BEHAVIOR fingerprint: a rule
    # change rebuilds a fresh lake instead of tripping the load-time
    # fingerprint guard on the stale one forever
    kt_fp = key_transform_fingerprint("normalize_url")[:8]
    lake_root = os.path.join(CDC_ROOT, _sf_name(sf_dir),
                             f"lake_norm-{_lake_key(meta)}-{kt_fp}")
    eng = CDCEngine(lake_root, num_buckets=16, key_transform="normalize_url")
    eng.replay_binlog(meta)
    return eng.table.snapshot_table().select(SNAPSHOT_COLS)


# the one SQL rendering of text.normalize_urls (shared by BOTH url-norm
# oracles so the rule can never fork): U2_EXPR strips fragment + trailing
# bare-? runs; NORM_CASE lowercases scheme+authority when a scheme exists
_URL_NORM_U2_SQL = (
    "regexp_replace(regexp_replace(URLCOL, '#.*$', ''), '\\?+$', '')")
_URL_NORM_CASE_SQL = """CASE WHEN regexp_matches(u2, '^[A-Za-z][A-Za-z0-9+.\\-]*://')
       THEN lower(regexp_extract(u2, '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*'))
            || regexp_replace(u2, '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*', '')
       ELSE u2 END"""


_CDC_NORM_KEYS_SQL_T = """
WITH src AS (
  SELECT NORM_CASE AS url,
         warc_ts, text, lang, "offset"
  FROM (
    SELECT *, U2 AS u2
    FROM read_parquet('{glob}')
    WHERE html IS NOT NULL AND url IS NOT NULL AND warc_ts IS NOT NULL
  )
), ranked AS (
  SELECT url, warc_ts, text, lang, "offset",
         md5(url || chr(31) || CAST(epoch_us(warc_ts) AS VARCHAR)
                 || chr(31) || text || chr(31) || lang) AS content_hash,
         row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, "offset" DESC) AS rn
  FROM src
)
SELECT url, warc_ts, text, lang, content_hash, "offset" FROM ranked WHERE rn = 1
""".replace("NORM_CASE", _URL_NORM_CASE_SQL).replace(
    "U2", _URL_NORM_U2_SQL.replace("URLCOL", "url"))


_CDC_URL_NORM_SQL = """
SELECT url, NORM_CASE AS url_norm
FROM (
  SELECT url, U2 AS u2
  FROM (SNAPSHOT_SQL)
)
""".replace("NORM_CASE", _URL_NORM_CASE_SQL).replace(
    "U2", _URL_NORM_U2_SQL.replace("URLCOL", "url"))


def q_cdc_mirror_snapshot(sf_dir: str):
    """Cross-lake replication end-to-end: mirror the replayed lake into a
    SECOND lake (different bucket count) purely through its change stream
    (`CDCEngine.mirror_from`), then snapshot the MIRROR. The oracle is the
    same LWW-winners SQL as `cdc_replay_snapshot` — so source, mirror and
    SQL are value-checked three ways. Idempotent: the mirror's committed
    epoch is the cursor (a re-run applies nothing)."""
    eng = run_cdc_replay(sf_dir)
    meta = get_binlog(sf_dir)
    # 'mirror2': abandons pre-identity-stamp cached mirrors (mirror_from
    # now refuses to resume into an unstamped lake)
    mroot = os.path.join(CDC_ROOT, _sf_name(sf_dir),
                         f"lake_mirror2-{_lake_key(meta)}")
    mirror = CDCEngine(mroot, num_buckets=8)
    mirror.mirror_from(eng.table)
    return mirror.table.snapshot_table().select(SNAPSHOT_COLS)


def q_cdc_domain_stats(sf_dir: str):
    """Per-host page counts over the lake's LWW winners — the hot-host
    skew monitor for the salted exchange (the synth binlog concentrates
    traffic on a Zipf-hot ``host000``). Vectorized host extraction
    (one RE2 ``extract_regex`` per batch), per-batch partial counts, then
    one small groupby over hosts — the shuffle carries (host, n) pairs,
    never urls."""
    from ray.data.aggregate import Sum

    eng = run_cdc_replay(sf_dir)
    ds = eng.table.snapshot_dataset(columns=["url"])
    out = (ds.map_batches(_host_count_partial, batch_format="pyarrow")
             .groupby("host").aggregate(Sum("n", alias_name="n_pages")))
    return out


def _host_count_partial(t: pa.Table) -> pa.Table:
    """Per-batch partial (host, n) counts with vectorized host extraction.
    Unmatched urls count under '' (DuckDB's ``regexp_extract`` returns ''
    for no match; a null group would silently DROP those rows from the
    monitor)."""
    host = pc.extract_regex(t["url"], r"^https?://(?P<host>[^/]+)")
    host = pc.fill_null(pc.struct_field(host, "host"), "")
    gb = pa.table({"host": host}).group_by("host").aggregate(
        [("host", "count")])
    return pa.table({"host": gb["host"],
                     "n": pc.cast(gb["host_count"], pa.int64())})


def q_cdc_lww_dedup(sf_dir: str):
    """One-shot LWW dedup over the whole binlog (no lake): the standalone
    dedup operator path — combiner per batch + per-bucket final reduce."""
    import ray.data

    meta = get_binlog(sf_dir)
    from geomesa_nifi_ray.engine import PAGE_SCHEMA, make_convert_fn

    convert = make_convert_fn(PAGE_SCHEMA, 32, "url", ["warc_ts", "offset"])
    files = [f for e in meta["epochs"] for f in e["files"]]
    ds = ray.data.read_parquet(files)
    # drop the heavy html payload before the shuffle: the snapshot output
    # doesn't need it, so the exchange moves text+metadata only; dead-letter
    # skeletons are filtered here (this operator reports winners only)
    def prep(t: pa.Table) -> pa.Table:
        t = convert(t)
        t = t.filter(pc.equal(t["_dead"], pa.scalar(0, pa.int8())))
        return t.select(SNAPSHOT_COLS + ["bucket"])

    ds = ds.map_batches(prep, batch_format="pyarrow")

    def final(t: pa.Table) -> pa.Table:
        return lww_dedupe(t, "url", ["warc_ts", "offset"])

    out = ds.groupby("bucket").map_groups(final, batch_format="pyarrow")
    return out.select_columns(SNAPSHOT_COLS)


def q_cdc_update_partial(sf_dir: str):
    """Epoch 0 upserted, epoch 1 applied in partial-update mode
    (UpdateGeoMesaRecord semantics: no inserts, unmatched keys skipped)."""
    meta = get_binlog(sf_dir)
    lake_root = os.path.join(CDC_ROOT, _sf_name(sf_dir), f"lake_update-{_lake_key(meta)}")
    eng = CDCEngine(lake_root, num_buckets=16)
    e0, e1 = meta["epochs"][0], meta["epochs"][1]
    eng.apply_epoch(e0["path"], 0, (e0["offset_min"], e0["offset_max"]))
    eng.apply_epoch(e1["path"], 1, (e1["offset_min"], e1["offset_max"]), mode="update")
    return eng.table.snapshot_table().select(SNAPSHOT_COLS)


# ONE load-bearing LWW/content_hash oracle template. The bus-tail variant
# differs only in the offset projection (the bus re-assigns 1-based
# offsets, an order-preserving shift, so the LWW winners are identical) —
# substituting OFFSET_EXPR keeps the md5 recipe / window / filters in a
# single place instead of two hand-synced copies.
_CDC_SNAPSHOT_SQL_T = """
WITH ranked AS (
  SELECT url, warc_ts, text, lang, OFFSET_EXPR AS "offset",
         md5(url || chr(31) || CAST(epoch_us(warc_ts) AS VARCHAR)
                 || chr(31) || text || chr(31) || lang) AS content_hash,
         row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, "offset" DESC) AS rn
  FROM read_parquet('{glob}')
  WHERE html IS NOT NULL AND url IS NOT NULL AND warc_ts IS NOT NULL
)
SELECT url, warc_ts, text, lang, content_hash, "offset" FROM ranked WHERE rn = 1
"""

def q_cdc_point_lookup(sf_dir: str):
    """Keyed point lookup over the replayed lake (`LakeTable.lookup_keys`):
    probe keys hash to their buckets with the ingest partitioner, only the
    touched buckets' manifest shards + chain files open, and each file
    read skips row groups by parquet key min/max — O(probe), never
    O(lake). The probe set here is every binlog url ending in '7'
    (deterministic and SQL-expressible); production callers pass explicit
    keys. Reference analog: the modify-writer's keyed store reads
    (``FeatureWriters.scala:115-160``)."""
    import pyarrow.dataset as pads

    eng = run_cdc_replay(sf_dir)
    meta = get_binlog(sf_dir)
    files = [f for e in meta["epochs"] for f in e["files"]]
    u = pads.dataset(files).to_table(columns=["url"])["url"].combine_chunks()
    u = pc.unique(pc.drop_null(u))
    probe = pc.filter(u, pc.ends_with(u, "7")).to_pylist()
    return eng.table.lookup_keys(probe, columns=SNAPSHOT_COLS)


def q_cdc_delete_where(sf_dir: str):
    """Predicate bulk delete (`CDCEngine.delete_where`) over the replayed
    lake: all lang='de' winners tombstoned in one maintenance epoch, then
    the snapshot. The scan reads only (key, order, lang); the write side
    is O(matches) — only buckets with a matched row get a tombstone
    delta. Reference analog: filter-based ``removeFeatures``. Idempotent
    across calls: the delete commits at a fixed epoch number, so a replay
    skips it once committed."""
    eng, _ = _delete_where_lake(sf_dir)
    return eng.table.snapshot_table().select(SNAPSHOT_COLS)


def _maintenance_lake(sf_dir: str, tag: str, maintenance_fn):
    """Replay the sf binlog into a dedicated lake and commit ONE
    maintenance epoch via ``maintenance_fn(engine, epoch)``. Idempotent
    (fixed lake root + fixed epoch number); the committed-epoch guard
    skips the maintenance call's O(lake) scan when its epoch is already
    committed (apply_epoch's exactly-once guard would discard the commit,
    but only after the scan ran). Returns ``(engine, epoch)``."""
    meta = get_binlog(sf_dir)
    lake_root = os.path.join(CDC_ROOT, _sf_name(sf_dir),
                             f"lake_{tag}-{_lake_key(meta)}")
    eng = CDCEngine(lake_root, num_buckets=16)
    for e in meta["epochs"]:
        eng.apply_epoch(e["path"], e["epoch"],
                        (e["offset_min"], e["offset_max"]))
    m_epoch = len(meta["epochs"])
    committed = eng.table.committed_epoch()
    if committed is None or committed < m_epoch:
        maintenance_fn(eng, m_epoch)
    return eng, m_epoch


def _delete_where_lake(sf_dir: str):
    """lang='de' delete_where as the maintenance epoch; shared by the
    delete-where snapshot and delete-egress queries."""
    return _maintenance_lake(
        sf_dir, "delw",
        lambda eng, ep: eng.delete_where(
            lambda b: pc.equal(b["lang"], "de"), columns=["lang"], epoch=ep))


_RETENTION_CUTOFF = "2020-01-01 06:00:00"


def q_cdc_retention_snapshot(sf_dir: str):
    """TTL/retention maintenance (`CDCEngine.expire_before`): every live
    row whose winning warc_ts is older than the cutoff is tombstoned in
    one exactly-once epoch (scan reads only key+order columns; writes are
    O(matches); the epoch egresses as tombstones so mirrors age off in
    lockstep), then the snapshot. Idempotent: fixed epoch number, re-runs
    skip. Oracle = the LWW winners with the same age filter."""
    eng, _ = _maintenance_lake(
        sf_dir, "ret",
        lambda eng, ep: eng.expire_before(_RETENTION_CUTOFF, epoch=ep))
    return eng.table.snapshot_table().select(SNAPSHOT_COLS)


_WINDOW_SCAN_LO = "2020-01-10 00:00:00"
_WINDOW_SCAN_HI = "2020-02-01 00:00:00"


def q_cdc_window_scan(sf_dir: str):
    """Predicate scan with zone-map data skipping
    (`LakeTable.snapshot_dataset(where=…)`): the LWW winners whose winning
    warc_ts falls in a fixed window AND lang='en' — the time-window export
    a downstream trainer runs against a 100 TB lake. Parquet footer
    min/max stats prune every bucket chain that provably can't match
    (whole chains only — dropping one file of a kept chain would change
    which rows win), then an exact vectorized mask filters the merged
    winners, so a selective scan reads O(matching buckets), not O(lake).
    Reference analog: CQL filter push-down in the store's query planning
    (``GeoMesaDataStore`` query path). The conjunction is evaluated on
    the POST-merge winner rows, exactly matching the SQL oracle's filter
    over its LWW window."""
    eng = run_cdc_replay(sf_dir)
    return eng.table.snapshot_dataset(where=[
        ("warc_ts", ">=", _WINDOW_SCAN_LO),
        ("warc_ts", "<", _WINDOW_SCAN_HI),
        ("lang", "==", "en"),
    ]).select_columns(SNAPSHOT_COLS)


def q_cdc_delete_egress(sf_dir: str):
    """Change-stream egress of a bulk-delete maintenance epoch
    (`epoch_changes_dataset` on an offset-less epoch): exactly the
    tombstone winners — the keys that were live with lang='de' at delete
    time — each carrying its winner's (warc_ts, offset) and
    ``_op='delete'`` with every payload column null. This is what a
    downstream mirror consumes to stay in sync across bulk deletes;
    before round 5 the offset-windowed read silently returned nothing
    for these epochs."""
    eng, delete_epoch = _delete_where_lake(sf_dir)
    ch = eng.table.epoch_changes_dataset(delete_epoch, include_ops=True)
    return ch.select_columns(["url", "warc_ts", "offset", "_op"])


_CDC_SNAPSHOT_SQL = _CDC_SNAPSHOT_SQL_T.replace("OFFSET_EXPR", '"offset"')
_CDC_DOMAIN_SQL = ("SELECT regexp_extract(url, '^https?://([^/]+)', 1) "
                   "AS host, count(*) AS n_pages FROM ("
                   + _CDC_SNAPSHOT_SQL + ") GROUP BY host")
_CDC_POINT_LOOKUP_SQL = _CDC_SNAPSHOT_SQL + " AND url LIKE '%7'"
_CDC_RETENTION_SQL = (_CDC_SNAPSHOT_SQL
                      + f" AND warc_ts >= TIMESTAMP '{_RETENTION_CUTOFF}'")
_CDC_WINDOW_SCAN_SQL = (
    _CDC_SNAPSHOT_SQL
    + f" AND warc_ts >= TIMESTAMP '{_WINDOW_SCAN_LO}'"
    + f" AND warc_ts < TIMESTAMP '{_WINDOW_SCAN_HI}' AND lang = 'en'")
_CDC_DELETE_WHERE_SQL = _CDC_SNAPSHOT_SQL + " AND (lang IS DISTINCT FROM 'de')"
# the delete epoch's change stream = the winners the predicate matched,
# re-emitted as payload-less tombstones at the winner's exact (order) values
_CDC_DELETE_EGRESS_SQL = (
    "SELECT url, warc_ts, \"offset\", 'delete' AS _op FROM ("
    + _CDC_SNAPSHOT_SQL + ") WHERE lang = 'de'"
)
_CDC_BUS_SNAPSHOT_SQL = _CDC_SNAPSHOT_SQL_T.replace(
    "OFFSET_EXPR", '("offset" + 1)')

def q_cdc_bus_tail(sf_dir: str):
    """The record-granular message-bus ingest path end-to-end: the sf
    tier's binlog events are appended (in binlog-offset order) to an
    ``AppendLogBusSource`` — which assigns its OWN offsets — and
    ``CDCEngine.tail`` drains it under the min/max/latency batch envelope
    with the lake's committed offset_max as the cursor. Final snapshot
    must equal the file-based replay's LWW state with every offset
    shifted by +1 (bus offsets are 1-based); the SQL oracle applies the
    same shift, so the whole envelope/cursor machinery is value-checked,
    not just row-counted."""
    import glob as _glob

    import pyarrow.parquet as _pq

    from geomesa_nifi_ray.sources.spi import AppendLogBusSource

    meta = get_binlog(sf_dir)
    root = os.path.join(CDC_ROOT, _sf_name(sf_dir))
    key = _lake_key(meta)
    bus_db = os.path.join(root, f"bus-{key}.db")
    payload = pa.schema([
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.large_binary()),
        pa.field("lang", pa.string()),
        pa.field("offset", pa.int64()),  # stripped: the bus assigns it
    ])
    fresh = not os.path.exists(bus_db)
    bus = AppendLogBusSource(bus_db, schema=payload, min_records=1,
                             max_records=5000, max_latency_s=0.0)
    if fresh:
        files = sorted(_glob.glob(os.path.join(binlog_dir(sf_dir),
                                               "epoch-*", "*.parquet")))
        events = pa.concat_tables([_pq.read_table(f) for f in files],
                                  promote_options="permissive")
        events = events.take(pc.sort_indices(
            events, sort_keys=[("offset", "ascending")]))
        bus.append(events)
    eng = CDCEngine(os.path.join(root, f"lake_bus-{key}"), num_buckets=32)
    eng.tail(bus, poll_interval=0.05, max_idle_polls=1)
    return eng.table.snapshot_table().select(SNAPSHOT_COLS)


def q_cdc_egress_epoch(sf_dir: str):
    """CDC egress: net row-level changes produced by epoch 1 (the
    change-stream-to-records path), read from manifests + touched bucket
    files only."""
    eng = run_cdc_replay(sf_dir)
    return eng.table.epoch_changes_dataset(1).map_batches(
        lambda t: t.select(SNAPSHOT_COLS), batch_format="pyarrow"
    )


_CDC_EGRESS_SQL = """
WITH ranked AS (
  SELECT url, warc_ts, text, lang, "offset",
         md5(url || chr(31) || CAST(epoch_us(warc_ts) AS VARCHAR)
                 || chr(31) || text || chr(31) || lang) AS content_hash,
         row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, "offset" DESC) AS rn
  FROM read_parquet(['{epoch0}', '{epoch1}'])
  WHERE html IS NOT NULL AND url IS NOT NULL AND warc_ts IS NOT NULL
)
SELECT url, warc_ts, text, lang, content_hash, "offset"
FROM ranked WHERE rn = 1 AND "offset" BETWEEN {lo} AND {hi}
"""


def q_cdc_epoch_diff(sf_dir: str):
    """Time-travel diff: row-level changes between the table state at
    epoch 0 and the final committed state (added / changed per key; this
    lake has no deletes, removals are exercised by the deletes-lake unit
    test). Bucket-local — one task per changed bucket, no shuffle; see
    :meth:`~geomesa_nifi_ray.lake.LakeTable.epoch_diff_dataset`."""
    eng = run_cdc_replay(sf_dir)
    cols = SNAPSHOT_COLS + ["_change"]
    return eng.table.epoch_diff_dataset(
        0, eng.table.committed_epoch()).map_batches(
        lambda t: t.select(cols), batch_format="pyarrow")


# Precondition: valid for binlogs WITHOUT delete events (the synth replay
# binlog has none — deletes arrive only via the _op column, which these
# parquet epochs lack). With deletes, the html-IS-NOT-NULL pre-window
# filter would resurrect a key's older upsert where the engine tombstones
# it; the 'removed' branch below is kept for FULL OUTER JOIN symmetry and
# is exercised by the tombstone unit test
# (tests/test_round5b_fixes.py::test_epoch_diff_dataset_add_change_remove),
# not by this oracle.
_CDC_DIFF_SQL = """
WITH s0 AS (
  SELECT * FROM (
    SELECT url, warc_ts, text, lang, "offset",
           md5(url || chr(31) || CAST(epoch_us(warc_ts) AS VARCHAR)
                   || chr(31) || text || chr(31) || lang) AS content_hash,
           row_number() OVER (PARTITION BY url
                              ORDER BY warc_ts DESC, "offset" DESC) AS rn
    FROM read_parquet('{glob}')
    WHERE html IS NOT NULL AND url IS NOT NULL AND warc_ts IS NOT NULL
      AND "offset" <= {o0}
  ) WHERE rn = 1
), s1 AS (
  SELECT * FROM (
    SELECT url, warc_ts, text, lang, "offset",
           md5(url || chr(31) || CAST(epoch_us(warc_ts) AS VARCHAR)
                   || chr(31) || text || chr(31) || lang) AS content_hash,
           row_number() OVER (PARTITION BY url
                              ORDER BY warc_ts DESC, "offset" DESC) AS rn
    FROM read_parquet('{glob}')
    WHERE html IS NOT NULL AND url IS NOT NULL AND warc_ts IS NOT NULL
      AND "offset" <= {o1}
  ) WHERE rn = 1
)
SELECT COALESCE(s1.url, s0.url) AS url,
       COALESCE(s1.warc_ts, s0.warc_ts) AS warc_ts,
       COALESCE(s1.text, s0.text) AS text,
       COALESCE(s1.lang, s0.lang) AS lang,
       COALESCE(s1.content_hash, s0.content_hash) AS content_hash,
       COALESCE(s1."offset", s0."offset") AS "offset",
       CASE WHEN s0.url IS NULL THEN 'added'
            WHEN s1.url IS NULL THEN 'removed'
            ELSE 'changed' END AS _change
FROM s1 FULL OUTER JOIN s0 ON s1.url = s0.url
WHERE s0.url IS NULL OR s1.url IS NULL
   OR s0.content_hash <> s1.content_hash
"""


def _evo_spec(sf_dir: str) -> BinlogSpec:
    import dataclasses

    base = _BINLOG_SPECS.get(_sf_name(sf_dir), _BINLOG_SPECS["sf0.01"])
    return dataclasses.replace(base, extra_column_from_epoch=1)


def q_cdc_schema_evolution(sf_dir: str):
    """Additive schema evolution under Update mode (F4): epoch 1 adds
    ``content_type``; the lake widens at the epoch boundary and pre-evolution
    winners read back null-filled."""
    from geomesa_nifi_ray.schema import CompatibilityMode

    spec = _evo_spec(sf_dir)
    bdir = os.path.join(CDC_ROOT, _sf_name(sf_dir), "binlog_evo")
    meta = write_binlog(bdir, spec)
    lake_root = os.path.join(
        CDC_ROOT, _sf_name(sf_dir), f"lake_evo-{_lake_key(meta)}"
    )
    eng = CDCEngine(lake_root, num_buckets=16, compatibility=CompatibilityMode.UPDATE)
    eng.replay_binlog(meta)
    return eng.table.snapshot_table().select(SNAPSHOT_COLS + ["content_type"])


_CDC_EVOLUTION_SQL = """
WITH ranked AS (
  SELECT url, warc_ts, text, lang, "offset", content_type,
         md5(url || chr(31) || CAST(epoch_us(warc_ts) AS VARCHAR)
                 || chr(31) || text || chr(31) || lang) AS content_hash,
         row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, "offset" DESC) AS rn
  FROM read_parquet('{glob}', union_by_name=true)
  WHERE html IS NOT NULL AND url IS NOT NULL AND warc_ts IS NOT NULL
)
SELECT url, warc_ts, text, lang, content_hash, "offset", content_type
FROM ranked WHERE rn = 1
"""


def q_cdc_enrich_tokens(sf_dir: str):
    """Composition: CDC snapshot -> text-analysis enrichment (whitespace
    token + char counts per winning page) — lake read feeding a vectorized
    stats stage."""
    eng = run_cdc_replay(sf_dir)
    ds = eng.table.snapshot_dataset(columns=["url", "text"])

    def stage(t: pa.Table) -> pa.Table:
        ws = pc.cast(pc.count_substring_regex(t["text"], r"\S+"), pa.int64())
        nc = pc.cast(pc.utf8_length(t["text"]), pa.int64())
        return pa.table({"url": t["url"], "ws_tokens": ws, "n_chars": nc})

    return ds.map_batches(stage, batch_format="pyarrow")


_CDC_ENRICH_SQL = """
WITH ranked AS (
  SELECT url, text,
         row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, "offset" DESC) AS rn
  FROM read_parquet('{glob}')
  WHERE html IS NOT NULL AND url IS NOT NULL AND warc_ts IS NOT NULL
)
SELECT url,
       CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS ws_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM ranked WHERE rn = 1
"""


_CDC_UPDATE_SQL = """
WITH e0 AS (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, "offset" DESC) rn
  FROM read_parquet('{epoch0}') WHERE html IS NOT NULL
), base AS (SELECT url, warc_ts, text, lang, "offset" FROM e0 WHERE rn = 1),
e1 AS (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, "offset" DESC) rn
  FROM read_parquet('{epoch1}') WHERE html IS NOT NULL
), chg AS (SELECT url, warc_ts, text, lang, "offset" FROM e1 WHERE rn = 1)
SELECT b.url,
       coalesce(c.warc_ts, b.warc_ts) AS warc_ts,
       coalesce(c.text, b.text) AS text,
       coalesce(c.lang, b.lang) AS lang,
       md5(b.url || chr(31)
           || CAST(epoch_us(coalesce(c.warc_ts, b.warc_ts)) AS VARCHAR) || chr(31)
           || coalesce(c.text, b.text) || chr(31) || coalesce(c.lang, b.lang)) AS content_hash,
       coalesce(c."offset", b."offset") AS "offset"
FROM base b LEFT JOIN chg c USING (url)
"""


# ------------------------------------------------------ relational queries --


def q_pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped grouped aggregate: vectorized derived columns in
    map_batches, partial-friendly groupby aggregate."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                 "l_discount", "l_tax", "l_shipdate"],
    )

    def derive(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(pd.Timestamp("1998-09-02"))))
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        charge = pc.multiply(disc, pc.add(pa.scalar(1.0), t["l_tax"]))
        t = t.append_column("disc_price", disc)
        return t.append_column("charge", charge)

    out = (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Sum("charge", alias_name="sum_charge"),
            Count(alias_name="count_order"),
        )
        .to_pandas()
    )
    for c in ("sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"):
        out[c] = out[c].round(4)
    return out


_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_customer_orders(sf_dir: str):
    """Grouped revenue + top-10 with a broadcast name join. Scale shape
    (round-5 rewrite, ~2x): per-batch PARTIAL sums combine before the one
    keyed exchange (the shuffle carries <=|customers| pre-aggregated rows,
    int key only — no name strings); the global ``sort().limit(10)`` is
    replaced by per-block top-10 + a driver merge of <=10xblocks rows; the
    customer names join onto exactly 10 rows at the end."""
    import ray.data

    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("o_custkey").aggregate(
            [("o_totalprice", "sum"), ([], "count_all")])
        return pa.table({
            "o_custkey": g["o_custkey"],
            "rev": g["o_totalprice_sum"],
            "n": pc.cast(g["count_all"], pa.int64()),
        })

    agg = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("rev", alias_name="revenue"),
                   Sum("n", alias_name="n_orders"))
    )

    def local_top(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("revenue", "descending"),
                                            ("o_custkey", "ascending")])
        return t.take(idx.slice(0, 10))

    cand = pd.DataFrame(
        agg.map_batches(local_top, batch_format="pyarrow").take_all())
    top = (cand.sort_values(["revenue", "o_custkey"],
                            ascending=[False, True], kind="stable")
           .head(10).reset_index(drop=True))
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"]).combine_chunks()
    pos = pc.index_in(pa.array(top["o_custkey"]), value_set=cust["c_custkey"])
    top.insert(1, "c_name", cust["c_name"].take(pos).to_pylist())
    top["revenue"] = top["revenue"].round(4)
    top["n_orders"] = top["n_orders"].astype("int64")
    return top


_TOP_CUSTOMER_SQL = """
SELECT o_custkey, c_name, round(sum(o_totalprice), 4) AS revenue, count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY o_custkey, c_name
ORDER BY revenue DESC, o_custkey ASC
LIMIT 10
"""


def q_events_windowed(sf_dir: str):
    """Tumbling 1-hour window aggregate per event_type (streaming-window
    analog: GROUP BY key, floor(ts/size))."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])

    def window(t: pa.Table) -> pa.Table:
        w = pc.floor(pc.divide(pc.cast(pc.cast(t["ts"], pa.int64()), pa.float64()), 3.6e9))
        return t.append_column("hour_window", pc.cast(w, pa.int64()))

    out = (
        ds.map_batches(window, batch_format="pyarrow")
        .groupby(["event_type", "hour_window"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    out["sum_value"] = out["sum_value"].round(4)
    return out


_EVENTS_WINDOWED_SQL = """
SELECT event_type, CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) AS hour_window,
       count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_events_sliding_window(sf_dir: str):
    """SLIDING window aggregate (1 h window, 15 min slide): each event
    expands to the W/S windows containing it — a vectorized numpy
    repeat/tile flat-map inside ``map_batches`` — then one groupby. The
    third streaming-window shape next to tumbling (events_windowed) and
    session (events_sessionized) windows."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    W, S = 3_600_000_000, 900_000_000  # 1 h window, 15 min slide (us)
    k = W // S

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value"])

    def expand(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        last = (ts // S) * S
        starts = (last[:, None] - np.arange(k - 1, -1, -1)[None, :] * S).reshape(-1)
        idx = np.repeat(np.arange(len(ts)), k)
        return pa.table(
            {
                "event_type": t["event_type"].take(pa.array(idx)),
                "value": t["value"].take(pa.array(idx)),
                "window_start": pa.array(starts, type=pa.int64()),
            }
        )

    out = (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    out["sum_value"] = out["sum_value"].round(4)
    out["n_events"] = out["n_events"].astype("int64")
    return out


_EVENTS_SLIDING_SQL = """
WITH expanded AS (
  SELECT event_type, value,
         unnest(generate_series(
            CAST(floor(epoch_us(ts) / 900000000) AS BIGINT) * 900000000
              - 3600000000 + 900000000,
            CAST(floor(epoch_us(ts) / 900000000) AS BIGINT) * 900000000,
            900000000)) AS window_start
  FROM events
)
SELECT event_type, window_start, CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 4) AS sum_value
FROM expanded GROUP BY 1, 2
"""


def q_events_asof_join(sf_dir: str):
    """As-of join (an operator Ray Data lacks — composed per SURVEY §2.4's
    co-partition guidance): every event joined to the user's most recent
    'signup' event at-or-before it; one groupby(user_id) shuffle, sorted
    searchsorted merge inside the group. DuckDB ASOF JOIN is the oracle."""
    import ray.data

    from geomesa_nifi_ray.joins import asof_join

    left = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                 columns=["event_id", "user_id", "ts"])
    right = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                  columns=["user_id", "ts", "event_type"])
    right = right.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], pa.scalar("signup")))
                   .select(["user_id", "ts"]),
        batch_format="pyarrow",
    )
    out = asof_join(left, right, by="user_id", on="ts", value_cols=["ts"],
                    suffix="_signup")
    return out.map_batches(
        lambda t: pa.table({"event_id": t["event_id"], "user_id": t["user_id"],
                            "ts": t["ts"], "last_signup_ts": t["ts_signup"]}),
        batch_format="pyarrow",
    )


_EVENTS_ASOF_SQL = """
SELECT l.event_id, l.user_id, l.ts, r.ts AS last_signup_ts
FROM events l
ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'signup') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def q_lww_latest_events(sf_dir: str):
    """LWW operator parity on the events view: latest event per user by
    (ts, event_id) — per-batch combiner + per-key final reduce."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    ds = ds.map_batches(
        lambda t: lww_dedupe(t, "user_id", ["ts", "event_id"]), batch_format="pyarrow"
    )

    def final(t: pa.Table) -> pa.Table:
        return lww_dedupe(t, "user_id", ["ts", "event_id"])

    out = ds.groupby("user_id").map_groups(final, batch_format="pyarrow")
    return out.select_columns(["user_id", "event_id", "ts", "event_type", "value"])


_LWW_EVENTS_SQL = """
SELECT user_id, event_id, ts, event_type, value FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
  FROM events
) WHERE rn = 1
"""


def q_upsert_events(sf_dir: str):
    """Keyed partial-update over events: base = LWW of event_id < 500,
    changes = LWW of the rest; value/ts overwritten on matched users, no
    inserts (UpdateGeoMesaRecord semantics on the shared views)."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet")

    def mark(t: pa.Table) -> pa.Table:
        src = pc.if_else(pc.less(t["event_id"], pa.scalar(500)), pa.scalar("base"),
                         pa.scalar("chg"))
        return t.append_column("src", src)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        t = pa.Table.from_pandas(g, preserve_index=False)
        base = lww_dedupe(t.filter(pc.equal(t["src"], pa.scalar("base"))),
                          "user_id", ["ts", "event_id"])
        chg = lww_dedupe(t.filter(pc.equal(t["src"], pa.scalar("chg"))),
                         "user_id", ["ts", "event_id"])
        if base.num_rows == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "event_id": pd.Series([], dtype="int64"),
                    "event_type": pd.Series([], dtype="object"),
                    "value": pd.Series([], dtype="float64"),
                    "ts": pd.Series([], dtype="datetime64[us]"),
                    "updated": pd.Series([], dtype="bool"),
                }
            )
        b = base.to_pandas().set_index("user_id")
        c = chg.to_pandas().set_index("user_id")
        matched = b.index.intersection(c.index)
        b["updated"] = False
        b.loc[matched, "value"] = c.loc[matched, "value"]
        b.loc[matched, "ts"] = c.loc[matched, "ts"]
        b.loc[matched, "updated"] = True
        out = b.reset_index()[["user_id", "event_id", "event_type", "value", "ts", "updated"]]
        return out

    return ds.map_batches(mark, batch_format="pyarrow").groupby("user_id").map_groups(
        merge, batch_format="pandas"
    )


_UPSERT_EVENTS_SQL = """
WITH base AS (
  SELECT user_id, event_id, event_type, value, ts FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
    FROM events WHERE event_id < 500
  ) WHERE rn = 1
), chg AS (
  SELECT user_id, value, ts FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
    FROM events WHERE event_id >= 500
  ) WHERE rn = 1
)
SELECT b.user_id, b.event_id, b.event_type,
       coalesce(c.value, b.value) AS value,
       coalesce(c.ts, b.ts) AS ts,
       (c.user_id IS NOT NULL) AS updated
FROM base b LEFT JOIN chg c USING (user_id)
"""


def q_convert_events_typed(sf_dir: str):
    """Converter-DSL chain over the events view (cast/concat/upper/length)."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    fields = [
        FieldSpec("event_id", "$event_id"),
        FieldSpec("key", "concat($event_type, '_', tostring($user_id))"),
        FieldSpec("etype_upper", "upper($event_type)"),
        FieldSpec("props_len", "length($props)"),
    ]
    return ds.map_batches(
        RecordConverter,
        fn_constructor_kwargs={"fields": fields},
        batch_format="pyarrow",
        concurrency=2,
    )


_CONVERT_EVENTS_SQL = """
SELECT event_id,
       event_type || '_' || CAST(user_id AS VARCHAR) AS key,
       upper(event_type) AS etype_upper,
       length(props) AS props_len
FROM events
"""


def q_events_sessionized(sf_dir: str):
    """Session windows (30-min inactivity gap) per user — the
    streaming-session analog: sort within key group, gap-split, aggregate."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_id", "ts", "value"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        new_s = (g["ts"].diff() > pd.Timedelta(minutes=30)) | g["ts"].diff().isna()
        g["session_id"] = new_s.cumsum().astype("int64")
        out = (
            g.groupby("session_id")
            .agg(
                user_id=("user_id", "first"),
                session_start=("ts", "min"),
                session_end=("ts", "max"),
                n_events=("event_id", "count"),
                sum_value=("value", "sum"),
            )
            .reset_index()
        )
        out["sum_value"] = out["sum_value"].round(4)
        out["n_events"] = out["n_events"].astype("int64")
        return out[["user_id", "session_id", "session_start", "session_end",
                    "n_events", "sum_value"]]

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


_SESSIONIZE_SQL = """
WITH gaps AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, value, event_id,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_id
  FROM gaps
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       min(ts) AS session_start, max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events, round(sum(value), 4) AS sum_value
FROM sess GROUP BY user_id, session_id
"""


def q_events_distinct_users(sf_dir: str):
    """Distinct operator on the events key, fully distributed: per-batch
    combiner (pc.unique inside map_batches) collapses duplicates BEFORE the
    one groupby shuffle — at web scale the shuffle moves one row per
    distinct key per block, and only the (small) distinct result is ever
    materialized, never the raw key column (the round-2 ``ds.unique`` pulled
    the whole column's uniques through the driver path)."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def local_unique(t: pa.Table) -> pa.Table:
        u = pc.unique(t["user_id"].combine_chunks())
        return pa.table({"user_id": u})

    def one(g: pa.Table) -> pa.Table:
        return g.slice(0, 1)

    return (
        ds.map_batches(local_unique, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(one, batch_format="pyarrow")
    )


_DISTINCT_USERS_SQL = "SELECT DISTINCT user_id FROM events"


def q_orders_semi_join(sf_dir: str):
    """Broadcast semi-join: orders whose customer sits in region EUROPE.
    The small side (region⨝nation⨝customer key set) is built driver-side
    and broadcast once via ray.put; orders stream through a vectorized
    membership filter — no shuffle."""
    import pyarrow.parquet as pq
    import ray
    import ray.data

    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"]).to_pandas()
    rkeys = region.loc[region.r_name == "EUROPE", "r_regionkey"]
    nkeys = nation.loc[nation.n_regionkey.isin(rkeys), "n_nationkey"]
    custkeys = np.asarray(cust.loc[cust.c_nationkey.isin(nkeys), "c_custkey"])
    kref = ray.put(custkeys)

    def stage(t: pa.Table) -> pa.Table:
        keys = ray.get(kref)
        mask = pc.is_in(t["o_custkey"], value_set=pa.array(keys))
        return t.filter(mask)

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_orderkey", "o_custkey", "o_totalprice"])
    return ds.map_batches(stage, batch_format="pyarrow")


_SEMI_JOIN_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
WHERE o_custkey IN (
  SELECT c_custkey FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE')
"""


def q_cdc_backfill_rewrite(sf_dir: str):
    """Lake-wide rewrite epoch (UPDATE-WHERE / backfill): uppercase ``lang``
    across every bucket, content hashes recomputed, committed as one new
    epoch. Idempotent per sf tier."""
    import pyarrow.compute as _pc

    meta = get_binlog(sf_dir)
    lake_root = os.path.join(CDC_ROOT, _sf_name(sf_dir), f"lake_rw-{_lake_key(meta)}")
    eng = CDCEngine(lake_root, num_buckets=16)
    eng.replay_binlog(meta)
    last_binlog_epoch = meta["epochs"][-1]["epoch"]
    if eng.table.committed_epoch() == last_binlog_epoch:  # rewrite not yet applied
        def upper_lang(t: pa.Table) -> pa.Table:
            return t.set_column(
                t.schema.get_field_index("lang"), "lang", _pc.utf8_upper(t["lang"])
            )

        eng.rewrite_epoch(upper_lang)
    return eng.table.snapshot_table().select(["url", "warc_ts", "lang", "content_hash", "offset"])


_CDC_BACKFILL_SQL = """
WITH ranked AS (
  SELECT url, warc_ts, text, upper(lang) AS lang, "offset",
         row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, "offset" DESC) AS rn
  FROM read_parquet('{glob}')
  WHERE html IS NOT NULL AND url IS NOT NULL AND warc_ts IS NOT NULL
)
SELECT url, warc_ts, lang,
       md5(url || chr(31) || CAST(epoch_us(warc_ts) AS VARCHAR)
               || chr(31) || text || chr(31) || lang) AS content_hash,
       "offset"
FROM ranked WHERE rn = 1
"""


# ------------------------------------------------------------ text queries --


def q_exact_dedup_documents(sf_dir: str):
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    out = dd.exact_dedup(ds, ["text"], "doc_id")
    return out.select_columns(["doc_id", "text", "lang", "source", "n_chars"])


_EXACT_DEDUP_SQL = """
SELECT min(doc_id) AS doc_id, text,
       arg_min(lang, doc_id) AS lang,
       arg_min(source, doc_id) AS source,
       arg_min(n_chars, doc_id) AS n_chars
FROM documents GROUP BY text
"""


def q_content_hash_documents(sf_dir: str):
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = dd.add_content_hash(ds, ["text"])
    return out.select_columns(["doc_id", "content_hash"])


_CONTENT_HASH_SQL = "SELECT doc_id, md5(text) AS content_hash FROM documents"


def q_token_stats_documents(sf_dir: str):
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def stage(t: pa.Table) -> pa.Table:
        ws = pc.cast(pc.count_substring_regex(t["text"], r"\S+"), pa.int64())
        nc = pc.cast(pc.utf8_length(t["text"]), pa.int64())
        return pa.table({"doc_id": t["doc_id"], "ws_tokens": ws, "n_chars": nc})

    return ds.map_batches(stage, batch_format="pyarrow")


_TOKEN_STATS_SQL = """
SELECT doc_id,
       CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS ws_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
"""


def q_quality_documents(sf_dir: str):
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def stage(t: pa.Table) -> pa.Table:
        pc_ = pc.cast(pc.count_substring_regex(t["text"], r"[.!?,;:]"), pa.int64())
        nt = pc.cast(pc.count_substring_regex(t["text"], r"\S+"), pa.int64())
        return pa.table({"doc_id": t["doc_id"], "punct_count": pc_, "n_tokens": nt})

    return ds.map_batches(stage, batch_format="pyarrow")


_QUALITY_SQL = """
SELECT doc_id,
       CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS BIGINT) AS punct_count,
       CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
FROM documents
"""


def q_lang_distribution_documents(sf_dir: str):
    import ray.data
    from ray.data.aggregate import Count, Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"])
    return (
        ds.groupby("lang")
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="total_chars"))
    )


_LANG_DIST_SQL = """
SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang
"""


def _token_pairs(t: pa.Table, col: str) -> pa.Table:
    """(``col``, token) pairs under THE corpus tokenization rule —
    whitespace split (Arrow RE2 ``\\s+``), empty boundary tokens dropped,
    null ``col``/``text`` rows dropped. The single definition shared by
    ``q_vocab_topk_documents`` and ``q_doc_freq_documents`` so the two
    queries can never desynchronize on what a "token" is (matches the
    whitespace rule of ``q_token_stats_documents``)."""
    t = t.filter(pc.and_(pc.is_valid(t[col]), pc.is_valid(t["text"])))
    toks = pc.split_pattern_regex(t["text"], r"\s+")
    flat = pc.list_flatten(toks)
    keyv = t[col].take(pc.list_parent_indices(toks))
    pairs = pa.table({col: keyv, "token": flat})
    return pairs.filter(pc.not_equal(pairs["token"], ""))


def q_vocab_topk_documents(sf_dir: str, k: int = 20):
    """Per-language top-k token frequencies — the vocabulary-building step
    of a training-data pipeline. Scale shape: per-batch PARTIAL
    (lang, token) counts (Arrow RE2 split + list-flatten + in-batch
    group_by) combine BEFORE the one keyed exchange, so the shuffle
    carries unique (lang, token) rows, never token instances; the global
    sort is replaced by per-block top-k-per-lang + a driver merge of
    <= k x langs x blocks candidate rows (the reference analog is the
    converter pipeline's aggregate counters; tokenization matches the
    whitespace rule of ``q_token_stats_documents``)."""
    import numpy as np
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        pairs = _token_pairs(t, "lang")
        g = pairs.group_by(["lang", "token"]).aggregate([([], "count_all")])
        return pa.table({"lang": g["lang"], "token": g["token"],
                         "cnt": pc.cast(g["count_all"], pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["lang", "token"])
             .aggregate(Sum("cnt", alias_name="cnt")))

    def local_top(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        idx = pc.sort_indices(t, sort_keys=[("lang", "ascending"),
                                            ("cnt", "descending"),
                                            ("token", "ascending")])
        t = t.take(idx)
        langs = np.asarray(t["lang"])
        starts = np.r_[0, np.nonzero(langs[1:] != langs[:-1])[0] + 1]
        ends = np.r_[starts[1:], len(langs)]
        keep = np.concatenate([np.arange(s, min(s + k, e))
                               for s, e in zip(starts, ends)])
        return t.take(pa.array(keep, pa.int64()))

    cand = pd.DataFrame(
        agg.map_batches(local_top, batch_format="pyarrow").take_all())
    if cand.empty:  # all-null corpus: oracle returns 0 rows, same schema
        return pd.DataFrame({"lang": pd.Series([], dtype=object),
                             "token": pd.Series([], dtype=object),
                             "cnt": pd.Series([], dtype="int64"),
                             "rank": pd.Series([], dtype="int64")})
    cand = cand.sort_values(["lang", "cnt", "token"],
                            ascending=[True, False, True], kind="stable")
    cand["rank"] = cand.groupby("lang").cumcount() + 1
    top = cand[cand["rank"] <= k].reset_index(drop=True)
    top["rank"] = top["rank"].astype("int64")
    return top[["lang", "token", "cnt", "rank"]]


_VOCAB_TOPK_SQL = """
WITH toks AS (
  SELECT lang, unnest(string_split_regex(text, '\\s+')) AS token
  FROM documents WHERE lang IS NOT NULL AND text IS NOT NULL
), counts AS (
  SELECT lang, token, count(*) AS cnt FROM toks
  WHERE token <> '' GROUP BY lang, token
), ranked AS (
  SELECT lang, token, CAST(cnt AS BIGINT) AS cnt,
         row_number() OVER (PARTITION BY lang
                            ORDER BY cnt DESC, token ASC) AS rank
  FROM counts
)
SELECT lang, token, cnt, rank FROM ranked WHERE rank <= 20
"""


def q_doc_freq_documents(sf_dir: str, k: int = 50):
    """Corpus document frequency + IDF for the top-k tokens by document
    count — the inverse-document-frequency table a curation / relevance
    pipeline builds once per corpus. Differs from ``vocab_topk`` in the
    DISTINCT-per-document semantics: a token counts once per document it
    appears in, however often. Scale shape: the per-batch partial
    dedups (doc_id, token) pairs BEFORE counting (group_by inside the
    batch), the keyed exchange carries unique (token, df) partials, and
    the top-k is per-block + driver merge — no global sort. IDF =
    ln(N / df) with N the corpus document count, rounded to 6 places to
    match the oracle's float formatting."""
    import numpy as np
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        pairs = _token_pairs(t, "doc_id")
        # distinct (doc, token) within the batch; a doc never spans
        # batches (one row = one doc — ENFORCED below), so the per-batch
        # distinct is exact
        g = pairs.group_by(["doc_id", "token"]).aggregate([])
        d = g.group_by("token").aggregate([([], "count_all")])
        return pa.table({"token": d["token"],
                         "df": pc.cast(d["count_all"], pa.int64())})

    # precondition check over the key column ONLY (cheap single-int64
    # scan): a duplicated doc_id would make the per-batch distinct
    # under-dedup across batches and silently overcount df
    ids = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                columns=["doc_id"])
    n_docs = ids.count()
    # uniqueness is checked over NON-NULL ids only: null-id rows are
    # dropped by partial() (and by the oracle's doc_id IS NOT NULL), so
    # they can't cross-batch under-dedup — but n_docs for IDF stays the
    # full row count to match the oracle's `count(*) FROM documents`
    nn = ids.map_batches(
        lambda t: t.filter(pc.is_valid(t["doc_id"])),
        batch_format="pyarrow")
    # ONE pass: (distinct groups, non-null rows) both derive from the
    # grouped counts — per-block partials, driver sum — instead of two
    # separate executions of the same read+filter scan
    gc = nn.groupby("doc_id").count()

    def _acc(t: pa.Table) -> pa.Table:
        cnt_col = next(n for n in t.column_names if n != "doc_id")
        rows = pc.sum(t[cnt_col]).as_py() or 0
        return pa.table({"groups": pa.array([t.num_rows], pa.int64()),
                         "rows": pa.array([int(rows)], pa.int64())})

    tot = gc.map_batches(_acc, batch_format="pyarrow").sum(["groups", "rows"])
    n_distinct = int(tot["sum(groups)"]) if tot else 0
    n_nonnull = int(tot["sum(rows)"]) if tot else 0
    if n_distinct != n_nonnull:
        raise ValueError(
            f"doc_freq_documents requires unique doc_id per row "
            f"({n_nonnull - n_distinct} duplicate rows found)")
    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("token").aggregate(Sum("df", alias_name="df")))

    def local_top(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        idx = pc.sort_indices(t, sort_keys=[("df", "descending"),
                                            ("token", "ascending")])
        return t.take(idx.slice(0, k))

    cand = pd.DataFrame(
        agg.map_batches(local_top, batch_format="pyarrow").take_all())
    if cand.empty:  # all-null corpus: oracle returns 0 rows, same schema
        return pd.DataFrame({"token": pd.Series([], dtype=object),
                             "df": pd.Series([], dtype="int64"),
                             "idf": pd.Series([], dtype="float64")})
    top = (cand.sort_values(["df", "token"], ascending=[False, True],
                            kind="stable").head(k).reset_index(drop=True))
    top["idf"] = np.round(np.log(n_docs / top["df"].to_numpy()), 6)
    return top[["token", "df", "idf"]]


_DOC_FREQ_SQL = """
WITH pairs AS (
  SELECT DISTINCT doc_id,
         unnest(string_split_regex(text, '\\s+')) AS token
  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
), counts AS (
  SELECT token, CAST(count(*) AS BIGINT) AS df FROM pairs
  WHERE token <> '' GROUP BY token
), n AS (SELECT count(*) AS n_docs FROM documents)
SELECT token, df, round(ln(n.n_docs / df), 6) AS idf
FROM counts, n
ORDER BY df DESC, token ASC LIMIT 50
"""


def q_length_filter_documents(sf_dir: str, lo_q: float = 0.05,
                              hi_q: float = 0.95):
    """Length-window curation filter: keep documents inside the
    per-language [P5, P95] of ``n_chars`` (the standard too-short /
    too-long cut of a training-data pipeline). Scale shape: the EXACT
    per-lang quantile boundaries come from a compact distributed
    value-count histogram (one small keyed aggregate over (lang,
    n_chars) — cardinality is langs x distinct lengths, bounded and tiny
    relative to rows), never a global sort; the boundaries broadcast in
    the filter closure and the filter itself is one vectorized
    map_batches pass. percentile_disc semantics: the value at 1-based
    position ceil(q * n) of the sorted column — matches DuckDB/Postgres
    WITHIN GROUP (ORDER BY ...)."""
    import math

    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t["lang"]),
                             pc.is_valid(t["n_chars"])))
        g = t.group_by(["lang", "n_chars"]).aggregate([([], "count_all")])
        return pa.table({"lang": g["lang"], "n_chars": g["n_chars"],
                         "cnt": pc.cast(g["count_all"], pa.int64())})

    hist = pd.DataFrame(
        ds.map_batches(partial, batch_format="pyarrow")
          .groupby(["lang", "n_chars"])
          .aggregate(Sum("cnt", alias_name="cnt")).take_all())
    bounds: dict[str, tuple[int, int]] = {}
    for lang, grp in hist.groupby("lang"):
        grp = grp.sort_values("n_chars")
        cum = grp["cnt"].cumsum().to_numpy()
        vals = grp["n_chars"].to_numpy()
        n = int(cum[-1])

        def disc(q: float) -> int:
            import numpy as np

            target = math.ceil(q * n)
            return int(vals[int(np.searchsorted(cum, target, side="left"))])

        bounds[lang] = (disc(lo_q), disc(hi_q))

    langs_arr = pa.array(list(bounds), pa.string())
    lo_arr = pa.array([bounds[v][0] for v in bounds], pa.int64())
    hi_arr = pa.array([bounds[v][1] for v in bounds], pa.int64())

    def keep(t: pa.Table) -> pa.Table:
        # vectorized boundary lookup: index_in yields null for unknown /
        # null langs, take propagates it, and filter drops null masks
        idx = pc.index_in(t["lang"], value_set=langs_arr)
        m = pc.and_(pc.greater_equal(t["n_chars"], lo_arr.take(idx)),
                    pc.less_equal(t["n_chars"], hi_arr.take(idx)))
        return t.filter(m)

    return ds.map_batches(keep, batch_format="pyarrow")


_LENGTH_FILTER_SQL = """
WITH b AS (
  SELECT lang,
         percentile_disc(0.05) WITHIN GROUP (ORDER BY n_chars) AS lo,
         percentile_disc(0.95) WITHIN GROUP (ORDER BY n_chars) AS hi
  FROM documents WHERE lang IS NOT NULL GROUP BY lang
)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d JOIN b USING (lang)
WHERE d.n_chars BETWEEN b.lo AND b.hi
"""


def q_schema_project_documents(sf_dir: str):
    """Existing-mode schema-adapter stage: reorder, cast, null-fill, drop."""
    import ray.data

    target = pa.schema(
        [
            pa.field("doc_id", pa.int64()),
            pa.field("text", pa.string()),
            pa.field("lang", pa.string()),
            pa.field("content_type", pa.string()),   # null-filled (absent upstream)
            pa.field("n_chars", pa.int64()),
        ]
    )
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    return ds.map_batches(lambda t: project_to_schema(t, target), batch_format="pyarrow")


_SCHEMA_PROJECT_SQL = """
SELECT doc_id, text, lang, CAST(NULL AS VARCHAR) AS content_type, n_chars FROM documents
"""


def _nested_pages_path(sf_dir: str) -> str:
    from geomesa_nifi_ray.synth import write_nested_pages

    return write_nested_pages(
        os.path.join(CDC_ROOT, _sf_name(sf_dir), "nested_pages.parquet")
    )


def q_nested_pages_stats(sf_dir: str):
    """Nested column types end-to-end (List/Map/nested-record converters,
    ``SimpleFeatureRecordConverter.scala:467-528``): a converter-DSL chain
    over list<string> / map<string,string> / struct columns — list length
    and element access, map lookup, struct field — all pyarrow.compute
    kernels, verified against DuckDB's native nested readers."""
    import ray.data

    path = _nested_pages_path(sf_dir)
    ds = ray.data.read_parquet(path)
    fields = [
        FieldSpec("page_id", "$page_id"),
        FieldSpec("n_links", "list_len($links)"),
        FieldSpec("first_link", "list_get($links, 0)"),
        FieldSpec("content_type", "map_get($headers, 'content-type')"),
        FieldSpec("score", "struct_get($meta, 'score')"),
        FieldSpec("tags_n", "list_len(struct_get($meta, 'tags'))"),
    ]
    return ds.map_batches(
        RecordConverter,
        fn_constructor_kwargs={"fields": fields},
        batch_format="pyarrow",
        concurrency=2,
    )


_NESTED_PAGES_SQL = """
SELECT page_id,
       CAST(len(links) AS BIGINT) AS n_links,
       links[1] AS first_link,
       headers['content-type'][1] AS content_type,
       meta.score AS score,
       CAST(len(meta.tags) AS BIGINT) AS tags_n
FROM read_parquet('{path}')
"""


def q_training_data_prep(sf_dir: str):
    """End-to-end training-data prep composition: exact dedup -> vectorized
    quality stats -> filter (min tokens, bounded punctuation density) ->
    curated output. The whole pipeline streams; the only shuffle is the
    dedup groupby."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               override_num_blocks=_DOC_BLOCKS)
    ds = dd.exact_dedup(ds, ["text"], "doc_id")

    def stage(t: pa.Table) -> pa.Table:
        ws_a = pc.cast(pc.count_substring_regex(t["text"], r"\S+"), pa.int64())
        pn_a = pc.cast(pc.count_substring_regex(t["text"], r"[.!?,;:]"), pa.int64())
        t = t.append_column("ws_tokens", ws_a)
        t = t.append_column("punct_count", pn_a)
        ws = ws_a.fill_null(0).to_numpy(zero_copy_only=False)
        pn = pn_a.fill_null(0).to_numpy(zero_copy_only=False)
        keep = (ws >= 40) & (pn * 5 <= ws)  # >=40 tokens, punct density <= 20%
        return t.filter(pa.array(keep)).select(
            ["doc_id", "ws_tokens", "punct_count", "n_chars", "lang"]
        )

    return ds.map_batches(stage, batch_format="pyarrow")


_TRAINING_PREP_SQL = """
WITH dedup AS (
  SELECT min(doc_id) AS doc_id, text,
         arg_min(n_chars, doc_id) AS n_chars,
         arg_min(lang, doc_id) AS lang
  FROM documents GROUP BY text
), stats AS (
  SELECT doc_id,
         CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS ws_tokens,
         CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS BIGINT) AS punct_count,
         n_chars, lang
  FROM dedup
)
SELECT doc_id, ws_tokens, punct_count, n_chars, lang FROM stats
WHERE ws_tokens >= 40 AND punct_count * 5 <= ws_tokens
"""


# ----------------------------------------------------- embedding queries --


def _query_vectors(sf_dir: str, n: int = 5):
    """The n query vectors via a FILTERED parquet read — predicate + column
    pruning at the scan, never the whole embeddings table on the driver."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", n)],
    )
    qids = np.asarray(tbl["vec_id"].to_pylist())
    qmat = fixed_dim_matrix(tbl["embedding"], dtype=np.float64)
    order = np.argsort(qids)
    return qmat[order], qids[order]


def q_embedding_topk(sf_dir: str):
    """Brute-force cosine top-10 for the first 5 vectors as queries.
    float64 math to match DuckDB's list_cosine_similarity."""
    import ray.data

    qmat, qids = _query_vectors(sf_dir, 5)

    import ray

    def _norm(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return m / n

    qn = _norm(qmat)
    qref = ray.put(qn)

    def local_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(qref)
        vecs = _norm(fixed_dim_matrix(batch["embedding"], dtype=np.float64))
        vids = np.asarray(batch["vec_id"].to_pylist())
        scores = q @ vecs.T
        kk = min(10, scores.shape[1])
        top = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
        rows_q, rows_v, rows_s = [], [], []
        for r in range(scores.shape[0]):
            for c in top[r]:
                rows_q.append(int(qids[r]))
                rows_v.append(int(vids[c]))
                rows_s.append(float(scores[r, c]))
        return pa.table({"query_id": pa.array(rows_q, type=pa.int64()),
                         "vec_id": pa.array(rows_v, type=pa.int64()),
                         "cosine": pa.array(rows_s, type=pa.float64())})

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    cands = ds.map_batches(local_topk, batch_format="pyarrow")

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(10)
        return g[["query_id", "vec_id"]]

    return cands.groupby("query_id").map_groups(global_topk, batch_format="pandas")


_EMBEDDING_TOPK_SQL = """
SELECT query_id, vec_id FROM (
  SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         list_cosine_similarity(q.embedding, e.embedding) AS cosine,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC,
                                     e.vec_id ASC) AS rn
  FROM (SELECT * FROM embeddings WHERE vec_id < 5) q CROSS JOIN embeddings e
) WHERE rn <= 10
"""


# -------------------------------------------------- rows-only (no SQL) ----


def q_langid_documents(sf_dir: str):
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
                               override_num_blocks=_DOC_BLOCKS)
    # instance => task pool: the stage state is a few KB of stopword
    # arrays (pickled per task for free), and the vectorized kernel needs
    # no per-actor warmup — an actor pool pays ~1.2 s startup for nothing
    # at ANY scale (actor pools stay for heavy-state stages: multimodal
    # decoders, converter plans)
    out = ds.map_batches(LangIdStage(), batch_format="pyarrow")
    return out.select_columns(["doc_id", "lang_pred"])


def q_quality_score_documents(sf_dir: str):
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
                               override_num_blocks=_DOC_BLOCKS)
    # instance => task pool (see q_langid_documents); the per-codepoint
    # isalpha memo then lives per task, which stays exact — it is a pure
    # cache, not cross-batch state
    out = ds.map_batches(QualityStage(), batch_format="pyarrow")
    return out.select_columns(["doc_id", "quality_score", "stopword_ratio", "alpha_ratio"])


# The documents tables at test scales are small (500-5k rows); 16 blocks
# keeps the two sort exchanges from paying 64x64 tiny-task overhead. At
# real scale block count follows data volume and this override is dropped.
_DOC_BLOCKS = 16


def q_minhash_dedup_documents(sf_dir: str):
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
                               override_num_blocks=_DOC_BLOCKS)
    return dd.minhash_candidate_pairs(ds, threshold=0.8)


def q_simhash_documents(sf_dir: str):
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
                               override_num_blocks=_DOC_BLOCKS)
    return dd.simhash_candidate_pairs(ds, max_hamming=3)


def q_ngram_dedup_documents(sf_dir: str):
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
                               override_num_blocks=_DOC_BLOCKS)
    return dd.ngram_jaccard_pairs(ds, n=3, threshold=0.8)


def q_fingerprint_documents(sf_dir: str):
    import ray.data

    from geomesa_nifi_ray.textstats import add_fingerprint

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return add_fingerprint(ds).select_columns(["doc_id", "fingerprint"])


def q_embedding_neardup(sf_dir: str):
    """Registered neardup = the LSH scale path (no driver materialization,
    no all-pairs). testdata embeddings are near-orthogonal (max pairwise
    cosine ~0.51), so tau=0.4 selects the close tail; planes=4 × tables=32
    gives ≥99% recall at that low-tau regime (recall formula in the
    operator docstring). The broadcast baseline
    (dd.embedding_neardup_pairs) remains for small corpora."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               override_num_blocks=_DOC_BLOCKS)
    pairs = dd.embedding_lsh_neardup_pairs(ds, tau=0.4, planes=4, tables=32)
    # (doc_a, doc_b) only: the oracle recomputes exact cosine in float64;
    # emitting our float32-matmul cosine would hash-mismatch on rounding
    return pairs.select_columns(["doc_a", "doc_b"])


_EMBEDDING_NEARDUP_SQL = """
SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
"""


_NGRAM_DEDUP_SQL = """
WITH g AS (
  SELECT doc_id,
         list_distinct([l[i] || ' ' || l[i+1] || ' ' || l[i+2]
                        for i in range(1, len(l)-1)]) AS grams
  FROM (SELECT doc_id, regexp_extract_all(text, '\\S+') AS l FROM documents)
  WHERE len(l) >= 3
)
SELECT doc_a, doc_b, jaccard FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
           / len(list_distinct(a.grams || b.grams)) AS jaccard
  FROM g a JOIN g b ON a.doc_id < b.doc_id
) WHERE jaccard >= 0.8
"""


def q_minhash_clusters_documents(sf_dir: str):
    """Near-dup cluster assignment: MinHash-LSH pairs -> connected
    components via the Dataset-native alternating Large-Star/Small-Star
    algorithm. Returns the (doc_id, cluster) Dataset itself — NO label
    table ever materializes on the driver (round-4 verdict item #7), so
    the same query shape serves 10^9-node dup graphs."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
                               override_num_blocks=_DOC_BLOCKS)
    pairs = dd.minhash_candidate_pairs(ds, threshold=0.8)
    return dd.duplicate_clusters_dataset(pairs.select_columns(["doc_a", "doc_b"]))


def q_cdc_dynamic_mode(sf_dir: str):
    """Per-row dynamic write mode (``_mode`` directive — the sub-epoch
    analog of FeatureWriters.DynamicWriters:300-328): epoch 0 upserted;
    epoch 1 rows tagged by ``offset % 3`` — 0 -> 'update' (no insert,
    unmatched dropped+counted), 1 -> 'upsert', else NULL (epoch default).
    Oracle: full-outer merge of the two epochs' LWW winners in SQL."""
    import numpy as np
    import ray.data

    meta = get_binlog(sf_dir)
    lake_root = os.path.join(
        CDC_ROOT, _sf_name(sf_dir), f"lake_dynmode-{_lake_key(meta)}"
    )
    eng = CDCEngine(lake_root, num_buckets=16)
    if eng.table.committed_epoch() != 1:
        e0, e1 = meta["epochs"][0], meta["epochs"][1]
        eng.apply_epoch(e0["files"], epoch=0,
                        offset_range=(e0["offset_min"], e0["offset_max"]))

        def tag(t: pa.Table) -> pa.Table:
            off = pc.cast(t["offset"], pa.int64()).to_numpy(zero_copy_only=False)
            m3 = off % 3
            modes = np.where(m3 == 0, "update",
                             np.where(m3 == 1, "upsert", None))
            return t.append_column("_mode", pa.array(modes.tolist(), pa.string()))

        ds = ray.data.read_parquet(e1["files"]).map_batches(
            tag, batch_format="pyarrow"
        )
        eng.apply_epoch(ds, epoch=1,
                        offset_range=(e1["offset_min"], e1["offset_max"]))
    return eng.table.snapshot_table().select(SNAPSHOT_COLS)


_CDC_DYNAMIC_MODE_SQL = """
WITH base AS (
  SELECT url, warc_ts, text, lang, "offset" FROM (
    SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, "offset" DESC) AS rn
    FROM read_parquet('{epoch0}')
    WHERE html IS NOT NULL AND url IS NOT NULL AND warc_ts IS NOT NULL
  ) WHERE rn = 1
), chg AS (
  SELECT url, warc_ts, text, lang, "offset",
         CASE ("offset" % 3) WHEN 0 THEN 'update' WHEN 1 THEN 'upsert' ELSE NULL END AS mode
  FROM (
    SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, "offset" DESC) AS rn
    FROM read_parquet('{epoch1}')
    WHERE html IS NOT NULL AND url IS NOT NULL AND warc_ts IS NOT NULL
  ) WHERE rn = 1
), merged AS (
  SELECT COALESCE(b.url, c.url) AS url,
    CASE
      WHEN c.url IS NULL THEN 'b'
      WHEN c.mode = 'update' THEN (CASE WHEN b.url IS NULL THEN 'x' ELSE 'c' END)
      WHEN b.url IS NULL THEN 'c'
      WHEN c.warc_ts >= b.warc_ts THEN 'c'
      ELSE 'b'
    END AS pick,
    b.warc_ts AS b_ts, b.text AS b_text, b.lang AS b_lang, b."offset" AS b_off,
    c.warc_ts AS c_ts, c.text AS c_text, c.lang AS c_lang, c."offset" AS c_off
  FROM base b FULL OUTER JOIN chg c ON b.url = c.url
)
SELECT url,
  CASE pick WHEN 'c' THEN c_ts ELSE b_ts END AS warc_ts,
  CASE pick WHEN 'c' THEN c_text ELSE b_text END AS text,
  CASE pick WHEN 'c' THEN c_lang ELSE b_lang END AS lang,
  md5(url || chr(31)
      || CAST(epoch_us(CASE pick WHEN 'c' THEN c_ts ELSE b_ts END) AS VARCHAR)
      || chr(31) || (CASE pick WHEN 'c' THEN c_text ELSE b_text END)
      || chr(31) || (CASE pick WHEN 'c' THEN c_lang ELSE b_lang END)) AS content_hash,
  CASE pick WHEN 'c' THEN c_off ELSE b_off END AS "offset"
FROM merged WHERE pick <> 'x'
"""


def q_union_resolve_events(sf_dir: str):
    """Choice/union field ingestion (SimpleFeatureRecordConverter.scala:
    516-528 one-way toString analog): a dense union(int64, string) column
    built deterministically from events (even event_id -> int branch, odd
    -> event_type branch) resolved to its common type per batch."""
    import numpy as np
    import ray.data

    from geomesa_nifi_ray.schema import resolve_union_array

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "event_type"])

    def stage(t: pa.Table) -> pa.Table:
        eid = pc.cast(t["event_id"], pa.int64()).to_numpy(zero_copy_only=False)
        etype = t["event_type"].to_pylist()
        is_str = (eid % 2) != 0
        codes = is_str.astype(np.int8)
        offsets = np.empty(len(eid), dtype=np.int32)
        offsets[~is_str] = np.arange(int((~is_str).sum()), dtype=np.int32)
        offsets[is_str] = np.arange(int(is_str.sum()), dtype=np.int32)
        u = pa.UnionArray.from_dense(
            pa.array(codes), pa.array(offsets),
            [pa.array(eid[~is_str]),
             pa.array([etype[i] for i in np.flatnonzero(is_str)], pa.string())],
        )
        return pa.table({"event_id": t["event_id"],
                         "resolved": resolve_union_array(u)})

    return ds.map_batches(stage, batch_format="pyarrow")


_UNION_RESOLVE_SQL = """
SELECT event_id,
       CASE WHEN event_id % 2 = 0 THEN CAST(event_id AS VARCHAR)
            ELSE event_type END AS resolved
FROM events
"""


def q_cdc_lang_counts_view(sf_dir: str):
    """Incrementally-maintained materialized view (the downstream-consumer
    loop a CDC engine exists for): COUNT(*) GROUP BY lang over the lake's
    winners, maintained per epoch from change deltas (+new winner / -prior
    value of the same key), never rescanned. Oracle: full GROUP BY over
    the LWW winner set — incremental must equal recompute exactly."""
    from geomesa_nifi_ray.derived import GroupCountView

    eng = run_cdc_replay(sf_dir)
    view = GroupCountView(eng.table, os.path.join(eng.lake_root, "views"),
                          group_col="lang")
    view.refresh()
    return view.as_table()


def q_cdc_lang_text_chars_view(sf_dir: str):
    """Incrementally-maintained SUM view: extracted-text characters per
    language over the lake's LWW winners (the corpus-size-per-language
    curation metric), maintained per epoch by the same +new/-old delta
    math as the count view — never rescanned. Oracle: SUM(length(text))
    over the winner set."""
    from geomesa_nifi_ray.derived import GroupSumView

    eng = run_cdc_replay(sf_dir)
    view = GroupSumView(eng.table, os.path.join(eng.lake_root, "views"),
                        group_col="lang", value_col="text",
                        value_kernel="utf8_length")
    view.refresh()
    return view.as_table()


_CDC_LANG_TEXT_CHARS_SQL = """
WITH ranked AS (
  SELECT lang, text,
         row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, "offset" DESC) AS rn
  FROM read_parquet('{glob}')
  WHERE html IS NOT NULL AND url IS NOT NULL AND warc_ts IS NOT NULL
)
SELECT lang, CAST(sum(length(text)) AS BIGINT) AS n
FROM ranked WHERE rn = 1 GROUP BY lang
HAVING sum(length(text)) > 0
"""


def q_cdc_lang_counts_view_keyed(sf_dir: str):
    """High-cardinality variant of the incrementally-maintained view: the
    counts live in a second CDC lake table (key = group value) maintained
    through the generic engine — CDC-on-CDC, the keyed-parquet state the
    JSON view's envelope points to for >10^6 groups. Same oracle: the
    incremental lake state must equal a full GROUP BY recompute."""
    from geomesa_nifi_ray.derived import KeyedGroupCountView

    eng = run_cdc_replay(sf_dir)
    view = KeyedGroupCountView(
        eng.table, os.path.join(eng.lake_root, "views_keyed"),
        group_col="lang")
    view.refresh()
    return view.as_table()


_CDC_LANG_COUNTS_SQL = """
WITH ranked AS (
  SELECT lang,
         row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, "offset" DESC) AS rn
  FROM read_parquet('{glob}')
  WHERE html IS NOT NULL AND url IS NOT NULL AND warc_ts IS NOT NULL
)
SELECT lang, CAST(count(*) AS BIGINT) AS n FROM ranked WHERE rn = 1 GROUP BY lang
"""


def q_cdc_deletes(sf_dir: str):
    """Delete events (the reference's upstream GeoMessage.Delete, which
    GetGeoMesaKafkaRecord.scala:273 filters out): epoch 0 upserted, then
    epoch 1 replayed with rows at ``offset % 5 == 0`` turned into
    payload-less deletes (html nulled, ``_op='delete'``). A delete removes
    its key iff it wins the (warc_ts, offset) LWW against every other
    version. Oracle: rank ALL events per url (deletes included) and keep
    non-delete winners."""
    import ray.data

    meta = get_binlog(sf_dir)
    lake_root = os.path.join(
        CDC_ROOT, _sf_name(sf_dir), f"lake_del-{_lake_key(meta)}"
    )
    eng = CDCEngine(lake_root, num_buckets=16)
    if eng.table.committed_epoch() != 1:
        e0, e1 = meta["epochs"][0], meta["epochs"][1]
        eng.apply_epoch(e0["files"], epoch=0,
                        offset_range=(e0["offset_min"], e0["offset_max"]))

        def tag(t: pa.Table) -> pa.Table:
            import numpy as np

            off = pc.cast(t["offset"], pa.int64()).to_numpy(zero_copy_only=False)
            is_del = (off % 5) == 0
            ops = np.where(is_del, "delete", None)
            mask = pa.array(~is_del)
            html = pc.if_else(mask, t["html"],
                              pa.nulls(t.num_rows, t["html"].type))
            t = t.set_column(t.schema.get_field_index("html"), "html", html)
            return t.append_column("_op", pa.array(ops.tolist(), pa.string()))

        ds = ray.data.read_parquet(e1["files"]).map_batches(
            tag, batch_format="pyarrow"
        )
        eng.apply_epoch(ds, epoch=1,
                        offset_range=(e1["offset_min"], e1["offset_max"]))
    return eng.table.snapshot_table().select(SNAPSHOT_COLS)


_CDC_DELETES_SQL = """
WITH events AS (
  SELECT url, warc_ts, text, lang, "offset", 'row' AS op
  FROM read_parquet('{epoch0}')
  WHERE html IS NOT NULL AND url IS NOT NULL AND warc_ts IS NOT NULL
  UNION ALL
  SELECT url, warc_ts,
         CASE WHEN "offset" % 5 = 0 THEN NULL ELSE text END AS text,
         CASE WHEN "offset" % 5 = 0 THEN NULL ELSE lang END AS lang,
         "offset",
         CASE WHEN "offset" % 5 = 0 THEN 'delete' ELSE 'row' END AS op
  FROM read_parquet('{epoch1}')
  WHERE url IS NOT NULL AND warc_ts IS NOT NULL
    AND (html IS NOT NULL OR "offset" % 5 = 0)
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, "offset" DESC) AS rn
  FROM events
)
SELECT url, warc_ts, text, lang,
       md5(url || chr(31) || CAST(epoch_us(warc_ts) AS VARCHAR)
               || chr(31) || text || chr(31) || lang) AS content_hash,
       "offset"
FROM ranked WHERE rn = 1 AND op <> 'delete'
"""


def q_embedding_clusters(sf_dir: str):
    """Distributed connected components with a FULLY-SQL oracle: near-dup
    pairs from the exact-cosine criterion (same as embedding_neardup),
    clustered by the alternating Large-Star/Small-Star Dataset algorithm;
    the oracle computes the transitive closure with a recursive CTE and
    takes the per-component minimum — the CC math itself is SQL-checked,
    not golden-pinned."""
    import ray.data

    from geomesa_nifi_ray.dedup import duplicate_clusters_dataset

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               override_num_blocks=_DOC_BLOCKS)
    pairs = dd.embedding_lsh_neardup_pairs(ds, tau=0.4, planes=4, tables=32)
    out = duplicate_clusters_dataset(pairs.select_columns(["doc_a", "doc_b"]))

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"vec_id": t["doc_id"], "cluster": t["cluster"]})

    return out.map_batches(rename, batch_format="pyarrow")


_EMBEDDING_CLUSTERS_SQL = """
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS pa, b.vec_id AS pb
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
), edges AS (
  SELECT pa AS a, pb AS b FROM pairs
  UNION
  SELECT pb, pa FROM pairs
), reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b <> r.a
), nodes AS (
  SELECT DISTINCT a AS n FROM edges
)
SELECT n AS vec_id,
       LEAST(n, MIN(r.b)) AS cluster
FROM nodes JOIN reach r ON r.a = n
GROUP BY n
"""


def q_multimodal_video_frames(sf_dir: str):
    """Video path of the multimodal trio: deterministic media payloads ->
    FrameSampleStage (frame-sample expansion as a batch-wise flat_map over
    an actor pool; decoding stubbed per the container constraint, the Ray
    plumbing — schema, expansion, per-frame hashing — real)."""
    import ray.data

    from geomesa_nifi_ray.multimodal import FrameSampleStage, synth_media_table

    ds = ray.data.from_arrow(synth_media_table(64, seed=7))
    return ds.map_batches(FrameSampleStage, batch_format="pyarrow",
                          batch_size=16, concurrency=2,
                          fn_constructor_kwargs={"num_frames": 3})


def q_sample_documents(sf_dir: str):
    """Deterministic hash sample (SURVEY §2.6 gap: reproducible,
    cluster-size-independent sampling for training mixes): keep documents
    whose md5(doc_id) sorts below hex '28' (~15.6%)."""
    import ray.data

    from geomesa_nifi_ray.sampling import hash_sample

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang"])
    return hash_sample(ds, "doc_id", threshold="28")


_SAMPLE_DOCS_SQL = """
SELECT doc_id, lang FROM documents
WHERE md5(CAST(doc_id AS VARCHAR)) < '28'
"""


def q_split_documents(sf_dir: str):
    """Deterministic train/val/test split (90/5/5): each doc_id's label
    comes from its md5 position in the keyspace — no shuffle, no RNG
    state, the same assignment on any cluster size or resharding. The
    SQL renders the identical hex-edge CASE chain."""
    import ray.data

    from geomesa_nifi_ray.sampling import hash_split

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang"])
    return hash_split(ds, "doc_id",
                      {"train": 0.90, "val": 0.05, "test": 0.05},
                      seed="split0")


def _split_docs_sql() -> str:
    from geomesa_nifi_ray.sampling import split_edges_hex

    e_train, e_val = split_edges_hex(
        {"train": 0.90, "val": 0.05, "test": 0.05})
    return f"""
SELECT doc_id, lang,
       CASE WHEN substr(md5('split0' || CAST(doc_id AS VARCHAR)), 1, 4)
                 < '{e_train}' THEN 'train'
            WHEN substr(md5('split0' || CAST(doc_id AS VARCHAR)), 1, 4)
                 < '{e_val}' THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


def q_shuffle_documents(sf_dir: str):
    """Seeded deterministic global shuffle: the permutation is
    md5('s0' || doc_id) — identical on any cluster size (ds.random_shuffle
    is not reproducible across runs/parallelism; this is)."""
    import ray.data

    from geomesa_nifi_ray.sampling import deterministic_shuffle

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    return deterministic_shuffle(ds, "doc_id", seed="s0")


_SHUFFLE_DOCS_SQL = """
SELECT doc_id, md5('s0' || CAST(doc_id AS VARCHAR)) AS shuffle_key
FROM documents
"""


def q_stratified_cap_documents(sf_dir: str):
    """Per-group quota (the training-mix lever: cap rows per language/
    domain): at most 40 documents per lang, chosen by the stable seeded
    hash order so the selection survives resharding."""
    import ray.data

    from geomesa_nifi_ray.sampling import stratified_cap

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang"])
    return stratified_cap(ds, "lang", "doc_id", cap=40, seed="s0")


_STRATIFIED_CAP_SQL = """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5('s0' || CAST(doc_id AS VARCHAR))
         ) AS rn
  FROM documents
) WHERE rn <= 40
"""


def q_lang_token_budget_documents(sf_dir: str):
    """Per-language token-budget mix (the training-mix lever proper):
    each language keeps the documents whose tokens start inside ITS
    budget in the seeded hash order — en 3000 tokens, de 1500, every
    other language 800. One grouped prefix sum (driver state =
    O(langs × buckets) ints), deterministic at any cluster size."""
    import ray.data

    from geomesa_nifi_ray.packing import token_budget_head

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "text"])

    def toks(t: pa.Table) -> pa.Table:
        nt = pc.fill_null(pc.cast(
            pc.count_substring_regex(t["text"], r"\S+"), pa.int64()), 0)
        return pa.table({"doc_id": t["doc_id"], "lang": t["lang"],
                         "n_tokens": nt})

    return token_budget_head(ds.map_batches(toks, batch_format="pyarrow"),
                             "doc_id", "n_tokens",
                             {"en": 3000, "de": 1500}, group_col="lang",
                             default_budget=800, seed="mix0")


_LANG_TOKEN_BUDGET_SQL = """
WITH toks AS (
  SELECT doc_id, lang,
         COALESCE(CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT),
                  0) AS n_tokens,
         md5('mix0' || CAST(doc_id AS VARCHAR)) AS pack_key
  FROM documents
), cums AS (
  SELECT doc_id, lang, n_tokens, pack_key,
         CAST(sum(n_tokens) OVER (
                PARTITION BY lang
                ORDER BY pack_key, doc_id, n_tokens
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - n_tokens AS BIGINT) AS cum_before
  FROM toks
)
SELECT doc_id, lang, n_tokens, pack_key, cum_before
FROM cums
WHERE cum_before < CASE lang WHEN 'en' THEN 3000
                             WHEN 'de' THEN 1500
                             ELSE 800 END
"""


def q_duplicate_span_stats_documents(sf_dir: str):
    """Per-document duplicated-token footprint: distinct token positions
    covered by the union of flagged 8-token duplicate spans — the
    scrub-vs-drop decision number (``dedup.duplicate_span_stats``)."""
    import ray.data

    from geomesa_nifi_ray.dedup import duplicate_span_stats

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return duplicate_span_stats(ds, "doc_id", "text", k=8)


_DUP_SPAN_STATS_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS ts FROM documents
),
spans AS (
  SELECT doc_id, i AS pos,
         md5(array_to_string(ts[i:i+7], ' ')) AS shingle_hash
  FROM toks, unnest(generate_series(1, len(ts) - 7)) AS g(i)
),
dup AS (
  SELECT doc_id, pos FROM spans
  WHERE shingle_hash IN (
    SELECT shingle_hash FROM spans GROUP BY shingle_hash
    HAVING count(DISTINCT doc_id) >= 2)
)
SELECT doc_id, CAST(count(DISTINCT pos + j) AS BIGINT) AS dup_tokens
FROM dup, unnest(generate_series(0, 7)) AS u(j)
GROUP BY doc_id
"""


def q_token_quantiles_documents(sf_dir: str):
    """Exact p50/p90/p99 of the per-doc token-count distribution (batch
    sizing / corpus profiling) via histogram refinement — three streaming
    passes over one pruned column, O(bins) driver state, NO global sort
    (``stats.exact_quantiles``; DuckDB ``quantile_disc`` semantics)."""
    import ray.data

    from geomesa_nifi_ray.stats import exact_quantiles

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])

    def toks(t: pa.Table) -> pa.Table:
        nt = pc.fill_null(pc.cast(
            pc.count_substring_regex(t["text"], r"\S+"), pa.int64()), 0)
        return pa.table({"n_tokens": nt})

    qv = exact_quantiles(ds.map_batches(toks, batch_format="pyarrow"),
                         "n_tokens", [0.5, 0.9, 0.99], bins=256)
    return pa.table({"p50": pa.array([int(qv[0.5])], pa.int64()),
                     "p90": pa.array([int(qv[0.9])], pa.int64()),
                     "p99": pa.array([int(qv[0.99])], pa.int64())})


_TOKEN_QUANTILES_SQL = """
SELECT CAST(quantile_disc(n_tokens, 0.5) AS BIGINT) AS p50,
       CAST(quantile_disc(n_tokens, 0.9) AS BIGINT) AS p90,
       CAST(quantile_disc(n_tokens, 0.99) AS BIGINT) AS p99
FROM (SELECT COALESCE(CAST(length(regexp_extract_all(text, '\\S+'))
                           AS BIGINT), 0) AS n_tokens
      FROM documents)
"""


def q_top_docs_per_lang(sf_dir: str):
    """Value-ordered per-group selection (the quality-filter lever: keep
    the 25 longest documents per language): one groupby exchange, a
    vectorized sort-head per group, deterministic via the doc_id
    tie-break."""
    import ray.data

    from geomesa_nifi_ray.sampling import group_topk

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "text"])

    def toks(t: pa.Table) -> pa.Table:
        nt = pc.fill_null(pc.cast(
            pc.count_substring_regex(t["text"], r"\S+"), pa.int64()), 0)
        return pa.table({"doc_id": t["doc_id"], "lang": t["lang"],
                         "n_tokens": nt})

    return group_topk(ds.map_batches(toks, batch_format="pyarrow"),
                      "lang", "n_tokens", "doc_id", k=25)


_TOP_DOCS_PER_LANG_SQL = """
SELECT doc_id, lang, n_tokens FROM (
  SELECT doc_id, lang, n_tokens,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_tokens DESC, doc_id) AS rn
  FROM (SELECT doc_id, lang,
               COALESCE(CAST(length(regexp_extract_all(text, '\\S+'))
                             AS BIGINT), 0) AS n_tokens
        FROM documents)
) WHERE rn <= 25
"""


def q_duplicate_spans_documents(sf_dir: str):
    """Substring-level exact dedup (Lee et al. 2021): every 8-token window
    whose exact token sequence occurs in >= 2 distinct documents, with its
    1-based start position — the span list a scrubber would mask. The one
    shuffle carries (hash, id, pos) rows, never text; see
    ``dedup.duplicate_spans`` for the 100 TB cost envelope."""
    import ray.data

    from geomesa_nifi_ray.dedup import duplicate_spans

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return duplicate_spans(ds, "doc_id", "text", k=8)


_DUP_SPANS_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS ts FROM documents
),
spans AS (
  SELECT doc_id, i AS pos,
         md5(array_to_string(ts[i:i+7], ' ')) AS shingle_hash
  FROM toks, unnest(generate_series(1, len(ts) - 7)) AS g(i)
)
SELECT doc_id, CAST(pos AS BIGINT) AS pos, shingle_hash FROM spans
WHERE shingle_hash IN (
  SELECT shingle_hash FROM spans GROUP BY shingle_hash
  HAVING count(DISTINCT doc_id) >= 2)
"""


def q_pack_documents(sf_dir: str):
    """Sequence packing (concat-then-chunk layout for 512-token training
    sequences): a distributed two-pass prefix sum in the deterministic
    md5('pk0' || doc_id) order assigns every document its global token
    start offset, sequence id and offset — identical at any cluster size
    or resharding. Scale shape: pass 1 reduces to O(64) bucket totals
    (per-batch int64 combiner, one tiny groupby), pass 2 is one bucket
    exchange + per-bucket vectorized cumsum; the driver holds 64 ints."""
    import ray.data

    from geomesa_nifi_ray.packing import pack_sequences

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def toks(t: pa.Table) -> pa.Table:
        nt = pc.fill_null(pc.cast(
            pc.count_substring_regex(t["text"], r"\S+"), pa.int64()), 0)
        return pa.table({"doc_id": t["doc_id"], "n_tokens": nt})

    return pack_sequences(ds.map_batches(toks, batch_format="pyarrow"),
                          "doc_id", "n_tokens", 512, seed="pk0")


_PACK_DOCS_SQL = """
WITH toks AS (
  SELECT doc_id,
         COALESCE(CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT),
                  0) AS n_tokens,
         md5('pk0' || CAST(doc_id AS VARCHAR)) AS pack_key
  FROM documents
), cums AS (
  SELECT doc_id, n_tokens, pack_key,
         CAST(sum(n_tokens) OVER (
                ORDER BY pack_key, doc_id, n_tokens
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - n_tokens AS BIGINT) AS cum_before
  FROM toks
)
SELECT doc_id, n_tokens, pack_key, cum_before,
       cum_before // 512 AS seq_id,
       cum_before % 512 AS seq_off
FROM cums
"""


def q_token_budget_documents(sf_dir: str):
    """Deterministic token-budget head ("the first 8000 tokens of this
    source"): keep the documents whose tokens start inside the budget in
    the seeded hash order. Growing the budget only adds documents, so a
    training mix scales without reshuffling past selections. Same
    two-pass prefix-sum engine as ``pack_documents``."""
    import ray.data

    from geomesa_nifi_ray.packing import token_budget_head

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def toks(t: pa.Table) -> pa.Table:
        nt = pc.fill_null(pc.cast(
            pc.count_substring_regex(t["text"], r"\S+"), pa.int64()), 0)
        return pa.table({"doc_id": t["doc_id"], "n_tokens": nt})

    return token_budget_head(ds.map_batches(toks, batch_format="pyarrow"),
                             "doc_id", "n_tokens", budget=8000, seed="tb0")


_TOKEN_BUDGET_SQL = """
WITH toks AS (
  SELECT doc_id,
         COALESCE(CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT),
                  0) AS n_tokens,
         md5('tb0' || CAST(doc_id AS VARCHAR)) AS pack_key
  FROM documents
), cums AS (
  SELECT doc_id, n_tokens, pack_key,
         CAST(sum(n_tokens) OVER (
                ORDER BY pack_key, doc_id, n_tokens
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - n_tokens AS BIGINT) AS cum_before
  FROM toks
)
SELECT doc_id, n_tokens, pack_key, cum_before
FROM cums WHERE cum_before < 8000
"""


_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+?[0-9][0-9()\-\s]{7,}[0-9]"


def q_pii_scrub_documents(sf_dir: str):
    """PII scrubbing (training-data hygiene): emails and phone-like spans
    replaced with placeholder tokens, fully vectorized Arrow-RE2 passes.
    DuckDB's regexp_replace runs the same RE2 engine, so the oracle is
    byte-exact."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def scrub(t: pa.Table) -> pa.Table:
        x = pc.replace_substring_regex(t["text"], pattern=_PII_EMAIL,
                                       replacement="<EMAIL>")
        x = pc.replace_substring_regex(x, pattern=_PII_PHONE,
                                       replacement="<PHONE>")
        return pa.table({"doc_id": t["doc_id"], "text": x})

    return ds.map_batches(scrub, batch_format="pyarrow")


_PII_SCRUB_SQL = """
SELECT doc_id,
       regexp_replace(
         regexp_replace(text, '{email}', '<EMAIL>', 'g'),
         '{phone}', '<PHONE>', 'g') AS text
FROM documents
"""


def q_contamination_documents(sf_dir: str):
    """Benchmark-contamination screen: flag documents containing any
    snippet from a (deterministic) blocklist — the blocklist is broadcast
    once via ray.put and each batch runs vectorized substring matches (the
    small-side broadcast pattern; no join shuffle). Blocklist = the first
    40 chars of docs 0-2, so the oracle can derive the same set."""
    import ray
    import ray.data

    import pyarrow.parquet as pq_  # noqa: N813

    dt = pq_.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    bl = [v[:40] for v in
          dt.filter(pc.less(dt["doc_id"], pa.scalar(3)))["text"].to_pylist()
          if v and len(v) >= 40]
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    from geomesa_nifi_ray.textstats import ContaminationStage

    # one RE2 alternation (DFA over the whole blocklist) per batch —
    # O(rows), not O(snippets x rows); see ContaminationStage
    stage = ContaminationStage(bl)
    return (ds.map_batches(stage, batch_format="pyarrow")
            .select_columns(["doc_id", "contaminated"]))


_CONTAMINATION_SQL = """
WITH bl AS (
  SELECT substr(text, 1, 40) AS snip FROM documents
  WHERE doc_id < 3 AND length(text) >= 40
)
SELECT d.doc_id,
       EXISTS (SELECT 1 FROM bl WHERE contains(d.text, bl.snip)) AS contaminated
FROM documents d
"""


def q_repetition_documents(sf_dir: str):
    """Repetition stats (the Gopher-style dup-line signal): per doc, total
    and distinct line counts as exact integers (a high dup fraction flags
    boilerplate). Fully vectorized — Arrow split, then per-row distinct
    via dictionary-encode + one np.unique over (row, line-code) pairs; no
    Python objects per line (the former pandas ``set()`` map was the last
    per-row loop flagged in round 3)."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        lines = pc.split_pattern(pc.fill_null(t["text"], ""), "\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        n_lines = pc.cast(pc.list_value_length(lines), pa.int64())
        rows = pc.list_parent_indices(lines).to_numpy().astype(np.int64)
        codes = pc.dictionary_encode(pc.list_flatten(lines)).indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        n = t.num_rows
        if len(codes):
            # distinct (row, code) pairs, counted per row
            pairs = rows * (codes.max() + 1) + codes
            uniq_rows = np.unique(pairs) // (codes.max() + 1)
            nd = np.bincount(uniq_rows, minlength=n)
        else:
            nd = np.zeros(n, dtype=np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_lines": n_lines,
            "n_distinct_lines": pa.array(nd, type=pa.int64()),
        })

    return ds.map_batches(stats, batch_format="pyarrow")


_REPETITION_SQL = """
SELECT doc_id,
       CAST(len(split(text, chr(10))) AS BIGINT) AS n_lines,
       CAST(len(list_distinct(split(text, chr(10)))) AS BIGINT) AS n_distinct_lines
FROM documents
"""


def q_multimodal_features(sf_dir: str):
    """Multimodal actor-pool plumbing: deterministic synthetic media rows
    -> image-feature extraction (stub decoder; real Ray pipeline). The
    media table is seeded so results are stable across runs."""
    import ray.data

    from geomesa_nifi_ray.multimodal import ImageDecodeStage, synth_media_table

    ds = ray.data.from_arrow(synth_media_table(128, seed=3))
    out = ds.map_batches(ImageDecodeStage, batch_format="pyarrow", batch_size=32,
                         concurrency=2, fn_constructor_kwargs={"feature_dim": 16})

    def summarize(t: pa.Table) -> pa.Table:
        feats = t["image_features"].to_pylist()
        mean = pa.array([float(np.mean(f)) if f else None for f in feats],
                        type=pa.float64())
        return pa.table({"media_id": t["media_id"], "feature_mean": mean,
                         "feature_dim": pa.array([len(f) for f in feats], type=pa.int64())})

    return out.map_batches(summarize, batch_format="pyarrow")


def q_multimodal_audio_features(sf_dir: str):
    """Audio feature extraction over real PCM-16 WAV payloads (pure-numpy
    decode + windowed RMS energy) through the actor-pool stage."""
    import ray.data

    from geomesa_nifi_ray.multimodal import AudioFeatureStage, synth_audio_table

    ds = ray.data.from_arrow(synth_audio_table(64, seed=9))
    out = ds.map_batches(AudioFeatureStage, batch_format="pyarrow", batch_size=16,
                         concurrency=2, fn_constructor_kwargs={"feature_dim": 16})

    def summarize(t: pa.Table) -> pa.Table:
        feats = t["audio_features"].to_pylist()
        mean = pa.array([round(float(np.mean(f)), 8) if f else None for f in feats],
                        type=pa.float64())
        peak = pa.array([round(float(np.max(f)), 8) if f else None for f in feats],
                        type=pa.float64())
        return pa.table({"media_id": t["media_id"], "rms_mean": mean, "rms_peak": peak,
                         "duration_ms": t["duration_ms"]})

    return out.map_batches(summarize, batch_format="pyarrow")


def q_embedding_ivf_topk(sf_dir: str):
    """IVF fit on a RAY-SAMPLED subset (deterministic seed), query vectors
    via filtered read — the driver never holds the full embeddings table."""
    import ray.data

    from geomesa_nifi_ray.similarity import IVFIndex

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               override_num_blocks=_DOC_BLOCKS)
    n = ds.count()  # parquet metadata only, no scan
    step = max(1, n // 4096)  # deterministic systematic sample, streamed

    def systematic(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % step == 0))

    sample = (
        ds.map_batches(systematic, batch_format="pyarrow")
        .limit(4096)
        .take_batch(4096, batch_format="pyarrow")
    )
    idx = IVFIndex(num_centroids=16).fit(fixed_dim_matrix(sample["embedding"], dtype=np.float64))
    qmat, _ = _query_vectors(sf_dir, 5)
    return idx.search(idx.assign(ds), qmat.astype(np.float32), k=10, nprobe=4)


# ------------------------------------------------------------ geometry ----
# Point-geometry operators (the reference's WKT/WKB field converters,
# SimpleFeatureRecordConverter.scala:427-441, and the GeoMesa Z2-curve
# bbox-scan strategy). The events view carries no coordinates, so lon/lat
# are DERIVED deterministically from ids — one decimal digit each, integer
# mixing first, so the same doubles come out of numpy and DuckDB
# (user_id alone spans only ~[0, 150), so both ids feed the spread):
#   lon = ((event_id*7 + user_id) % 3600)/10.0 - 180.0   in [-180, 179.9]
#   lat = ((event_id*13) % 1800)/10.0 - 90.0             in [ -90,  89.9]

_GEO_BBOX = (-30.0, 20.0, 10.0, 60.0)
_GEO_PTS_SQL = """pts AS (
  SELECT event_id,
         ((event_id * 7 + user_id) % 3600) / 10.0 - 180.0 AS lon,
         ((event_id * 13) % 1800) / 10.0 - 90.0 AS lat
  FROM events
)"""


def _geo_lonlat(t: pa.Table) -> pa.Table:
    uid = t["user_id"].to_numpy(zero_copy_only=False)
    eid = t["event_id"].to_numpy(zero_copy_only=False)
    lon = ((eid * 7 + uid) % 3600) / 10.0 - 180.0
    lat = ((eid * 13) % 1800) / 10.0 - 90.0
    return pa.table({
        "event_id": t["event_id"],
        "lon": pa.array(lon, type=pa.float64()),
        "lat": pa.array(lat, type=pa.float64()),
    })


def q_geo_bbox_events(sf_dir: str):
    """Bbox query answered the GeoMesa way: coarse Z2 covering-range scan
    then exact refine (``geometry.z2_bbox_filter``); the oracle is the
    plain bbox predicate — the cover+refine composition must be lossless."""
    import ray.data

    from geomesa_nifi_ray.geometry import z2_bbox_filter, z2_covering_ranges

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id"])
    # plan once on the driver; tasks do only the searchsorted membership
    ranges = z2_covering_ranges(_GEO_BBOX, bits=16, max_ranges=64)

    def stage(t: pa.Table) -> pa.Table:
        return z2_bbox_filter(_geo_lonlat(t), "lon", "lat", _GEO_BBOX,
                              bits=16, max_ranges=64, ranges=ranges)

    return ds.map_batches(stage, batch_format="pyarrow")


_GEO_BBOX_SQL = f"""
WITH {_GEO_PTS_SQL}
SELECT event_id, lon, lat FROM pts
WHERE lon >= -30.0 AND lon < 10.0 AND lat >= 20.0 AND lat < 60.0
"""


def q_geo_z2_events(sf_dir: str):
    """Z2 (Morton) index key per point, 16 bits/dimension — the key the
    reference's datastore sorts its point index by."""
    import ray.data

    from geomesa_nifi_ray.geometry import z2_encode

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id"])

    def stage(t: pa.Table) -> pa.Table:
        p = _geo_lonlat(t)
        return pa.table({"event_id": p["event_id"],
                         "z2": z2_encode(p["lon"], p["lat"], bits=16)})

    return ds.map_batches(stage, batch_format="pyarrow")


def _z2_interleave_sql(var: str, offset: int, bits: int = 16) -> str:
    return " + ".join(
        f"((({var} >> {i}) & 1) << {2 * i + offset})" for i in range(bits)
    )


_GEO_Z2_SQL = f"""
WITH {_GEO_PTS_SQL}, q AS (
  SELECT event_id,
    GREATEST(0, LEAST(65535,
      CAST(floor(((lon - (-180.0)) / 360.0) * 65536.0) AS BIGINT))) AS ix,
    GREATEST(0, LEAST(65535,
      CAST(floor(((lat - (-90.0)) / 180.0) * 65536.0) AS BIGINT))) AS iy
  FROM pts
)
SELECT event_id,
       ({_z2_interleave_sql('ix', 0)}
        + {_z2_interleave_sql('iy', 1)}) AS z2
FROM q
"""


def q_geo_wkt_events(sf_dir: str):
    """WKT encode through the converter DSL's ``point()`` function, then
    parse back (``GeometryWktFieldConverter`` both directions,
    SimpleFeatureRecordConverter.scala:427-433). ``lon_rt``/``lat_rt`` are
    the values recovered FROM the string — both sides parse the identical
    printf bytes, so the roundtrip is oracle-checked."""
    import ray.data

    from geomesa_nifi_ray.geometry import parse_wkt_point

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id"])
    fields = [
        FieldSpec("event_id", "$event_id"),
        FieldSpec("wkt", "point($lon, $lat, 1)"),
    ]

    def stage(t: pa.Table, _cache={}) -> pa.Table:
        conv = _cache.get("c")  # compile the plan once per worker process
        if conv is None:
            conv = _cache["c"] = RecordConverter(fields=fields)
        out = conv(_geo_lonlat(t))
        x, y = parse_wkt_point(out["wkt"])
        return out.append_column("lon_rt", x).append_column("lat_rt", y)

    return ds.map_batches(stage, batch_format="pyarrow")


_GEO_WKT_SQL = f"""
WITH {_GEO_PTS_SQL}, w AS (
  SELECT event_id,
         'POINT (' || printf('%.1f', lon) || ' ' || printf('%.1f', lat)
           || ')' AS wkt,
         printf('%.1f', lon) AS sx, printf('%.1f', lat) AS sy
  FROM pts
)
SELECT event_id, wkt,
       CAST(sx AS DOUBLE) AS lon_rt, CAST(sy AS DOUBLE) AS lat_rt
FROM w
"""


_GEO_Z3_BBOX = (-120.0, -60.0, 120.0, 60.0)
_GEO_T0 = "2024-01-08 00:00:00"
_GEO_T1 = "2024-01-15 12:00:00"
_GEO_T0_US = 1_704_672_000_000_000
_GEO_T1_US = 1_705_320_000_000_000


def _geo_lonlat_ts(t: pa.Table) -> pa.Table:
    return _geo_lonlat(t).append_column("ts", t["ts"])


def q_geo_z3_keys_events(sf_dir: str):
    """Z3 (space + time) index key per event: week bin + 16-bit/dim Morton
    key over (lon, lat, time-within-bin) — the reference datastore's
    flagship index. Time quantization is pure integer arithmetic, so the
    DuckDB oracle reproduces the key bit-for-bit."""
    import ray.data

    from geomesa_nifi_ray.geometry import z3_encode

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id", "ts"])

    def stage(t: pa.Table) -> pa.Table:
        p = _geo_lonlat_ts(t)
        b, z = z3_encode(p["lon"], p["lat"], p["ts"], bits=16)
        return pa.table({"event_id": p["event_id"], "z3bin": b, "z3": z})

    return ds.map_batches(stage, batch_format="pyarrow")


def _z3_interleave_sql(var: str, offset: int, bits: int = 16) -> str:
    return " + ".join(
        f"((({var} >> {i}) & 1) << {3 * i + offset})" for i in range(bits)
    )


_GEO_Z3_KEYS_SQL = f"""
WITH {_GEO_PTS_SQL.replace("FROM events", ", ts FROM events")}, q AS (
  SELECT event_id,
    GREATEST(0, LEAST(65535,
      CAST(floor(((lon - (-180.0)) / 360.0) * 65536.0) AS BIGINT))) AS ix,
    GREATEST(0, LEAST(65535,
      CAST(floor(((lat - (-90.0)) / 180.0) * 65536.0) AS BIGINT))) AS iy,
    ((epoch_us(ts) % 604800000000) * 65536) // 604800000000 AS it,
    epoch_us(ts) // 604800000000 AS z3bin
  FROM pts
)
SELECT event_id, z3bin,
       ({_z3_interleave_sql('ix', 0)}
        + {_z3_interleave_sql('iy', 1)}
        + {_z3_interleave_sql('it', 2)}) AS z3
FROM q
"""


def q_geo_z3_bbox_events(sf_dir: str):
    """Spatio-temporal query the GeoMesa way: per-week-bin Z3 covering
    ranges + exact refine (``geometry.z3_bbox_time_filter``); oracle is
    the plain bbox AND time-interval predicate."""
    import ray.data

    from geomesa_nifi_ray.geometry import (z3_bbox_time_filter,
                                           z3_bbox_time_plans)

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id", "ts"])
    # plan once on the driver (per-bin octree walks); tasks do membership
    plans = z3_bbox_time_plans(_GEO_Z3_BBOX, _GEO_T0_US, _GEO_T1_US,
                               bits=16, max_ranges=64)

    def stage(t: pa.Table) -> pa.Table:
        out = z3_bbox_time_filter(_geo_lonlat_ts(t), "lon", "lat", "ts",
                                  _GEO_Z3_BBOX, _GEO_T0_US, _GEO_T1_US,
                                  bits=16, max_ranges=64, plans=plans)
        return out.set_column(out.schema.get_field_index("ts"), "ts",
                              out["ts"].cast(pa.timestamp("us")))

    return ds.map_batches(stage, batch_format="pyarrow")


_GEO_Z3_BBOX_SQL = f"""
WITH {_GEO_PTS_SQL.replace("FROM events", ", ts FROM events")}
SELECT event_id, lon, lat, ts FROM pts
WHERE lon >= -120.0 AND lon < 120.0 AND lat >= -60.0 AND lat < 60.0
  AND ts >= TIMESTAMP '{_GEO_T0}' AND ts < TIMESTAMP '{_GEO_T1}'
"""


def q_geo_wkb_events(sf_dir: str):
    """WKB encode (``GeometryWkbFieldConverter``, scala:435-441), hex for
    the golden fixture; exact roundtrip is pytest-gated (test_geometry)."""
    import binascii

    import ray.data

    from geomesa_nifi_ray.geometry import wkb_point

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id"])

    def stage(t: pa.Table) -> pa.Table:
        p = _geo_lonlat(t)
        wkb = wkb_point(p["lon"], p["lat"]).cast(pa.binary(21))
        n = len(wkb)
        hexb = binascii.hexlify(wkb.buffers()[1].to_pybytes()[
            wkb.offset * 21:(wkb.offset + n) * 21])
        hx = np.frombuffer(hexb, dtype="S42").astype("U42")
        return pa.table({"event_id": p["event_id"],
                         "wkb_hex": pa.array(hx, type=pa.string())})

    return ds.map_batches(stage, batch_format="pyarrow")


# ------------------------------------------------------------- registries --

QUERIES = {
    # CDC core (synth binlog, BASELINE.json input_hint shape)
    "cdc_replay_snapshot": q_cdc_replay_snapshot,
    "cdc_point_lookup": q_cdc_point_lookup,
    "cdc_delete_where": q_cdc_delete_where,
    "cdc_delete_egress": q_cdc_delete_egress,
    "cdc_domain_stats": q_cdc_domain_stats,
    "cdc_mirror_snapshot": q_cdc_mirror_snapshot,
    "cdc_url_normalized": q_cdc_url_normalized,
    "cdc_replay_norm_keys": q_cdc_replay_norm_keys,
    "cdc_retention_snapshot": q_cdc_retention_snapshot,
    "cdc_window_scan": q_cdc_window_scan,
    "cdc_bus_tail": q_cdc_bus_tail,
    "cdc_lww_dedup": q_cdc_lww_dedup,
    "cdc_update_partial": q_cdc_update_partial,
    "cdc_egress_epoch": q_cdc_egress_epoch,
    "cdc_epoch_diff": q_cdc_epoch_diff,
    "cdc_enrich_tokens": q_cdc_enrich_tokens,
    "cdc_schema_evolution": q_cdc_schema_evolution,
    # relational / streaming-window / converter parity (registered views)
    "pricing_summary": q_pricing_summary,
    "top_customer_orders": q_top_customer_orders,
    "events_windowed": q_events_windowed,
    "events_sliding_window": q_events_sliding_window,
    "events_asof_join": q_events_asof_join,
    "lww_latest_events": q_lww_latest_events,
    "upsert_events": q_upsert_events,
    "convert_events_typed": q_convert_events_typed,
    "events_sessionized": q_events_sessionized,
    "events_distinct_users": q_events_distinct_users,
    "nested_pages_stats": q_nested_pages_stats,
    "orders_semi_join": q_orders_semi_join,
    "cdc_backfill_rewrite": q_cdc_backfill_rewrite,
    "cdc_dynamic_mode": q_cdc_dynamic_mode,
    "union_resolve_events": q_union_resolve_events,
    "cdc_lang_counts_view": q_cdc_lang_counts_view,
    "cdc_lang_counts_view_keyed": q_cdc_lang_counts_view_keyed,
    "cdc_lang_text_chars_view": q_cdc_lang_text_chars_view,
    "cdc_deletes": q_cdc_deletes,
    "embedding_clusters": q_embedding_clusters,
    "multimodal_video_frames": q_multimodal_video_frames,
    "sample_documents": q_sample_documents,
    "split_documents": q_split_documents,
    "shuffle_documents": q_shuffle_documents,
    "stratified_cap_documents": q_stratified_cap_documents,
    "pack_documents": q_pack_documents,
    "duplicate_spans_documents": q_duplicate_spans_documents,
    "top_docs_per_lang": q_top_docs_per_lang,
    "token_quantiles_documents": q_token_quantiles_documents,
    "duplicate_span_stats_documents": q_duplicate_span_stats_documents,
    "lang_token_budget_documents": q_lang_token_budget_documents,
    "token_budget_documents": q_token_budget_documents,
    "pii_scrub_documents": q_pii_scrub_documents,
    "contamination_documents": q_contamination_documents,
    "repetition_documents": q_repetition_documents,
    # geometry (WKT/WKB converters + Z2 index scan)
    "geo_bbox_events": q_geo_bbox_events,
    "geo_z2_events": q_geo_z2_events,
    "geo_z3_keys_events": q_geo_z3_keys_events,
    "geo_z3_bbox_events": q_geo_z3_bbox_events,
    "geo_wkt_events": q_geo_wkt_events,
    "geo_wkb_events": q_geo_wkb_events,
    # training-data ops with SQL oracles
    "exact_dedup_documents": q_exact_dedup_documents,
    "content_hash_documents": q_content_hash_documents,
    "token_stats_documents": q_token_stats_documents,
    "quality_documents": q_quality_documents,
    "lang_distribution_documents": q_lang_distribution_documents,
    "vocab_topk_documents": q_vocab_topk_documents,
    "doc_freq_documents": q_doc_freq_documents,
    "length_filter_documents": q_length_filter_documents,
    "schema_project_documents": q_schema_project_documents,
    "training_data_prep": q_training_data_prep,
    "embedding_topk": q_embedding_topk,
    # rows-only (non-SQL-expressible: heuristic / sketch / index ops)
    "langid_documents": q_langid_documents,
    "quality_score_documents": q_quality_score_documents,
    "minhash_dedup_documents": q_minhash_dedup_documents,
    "simhash_documents": q_simhash_documents,
    "ngram_dedup_documents": q_ngram_dedup_documents,
    "fingerprint_documents": q_fingerprint_documents,
    "embedding_neardup": q_embedding_neardup,
    "embedding_ivf_topk": q_embedding_ivf_topk,
    "minhash_clusters_documents": q_minhash_clusters_documents,
    "multimodal_features": q_multimodal_features,
    "multimodal_audio_features": q_multimodal_audio_features,
}


# Queries whose output DuckDB cannot recompute (heuristic / sketch / index
# ops): their oracle is a golden-snapshot fixture pinned by
# tools/make_golden.py — a determinism / batch-layout-independence gate;
# semantic correctness is covered by pytest (planted near-dups, recall vs
# exact SQL, known-language docs).
_GOLDEN_QUERIES = [
    "langid_documents",
    "quality_score_documents",
    "minhash_dedup_documents",
    "simhash_documents",
    "minhash_clusters_documents",
    "fingerprint_documents",
    "multimodal_features",
    "multimodal_audio_features",
    "multimodal_video_frames",
    "embedding_ivf_topk",
    "geo_wkb_events",  # hex of IEEE-754 bits — not SQL-recomputable
]

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests", "fixtures", "golden",
)


def _golden_oracles(sf_dir: str) -> dict[str, str]:
    out = {}
    name = _sf_name(sf_dir)
    for q in _GOLDEN_QUERIES:
        p = os.path.join(GOLDEN_DIR, f"{q}__{name}.parquet")
        if os.path.exists(p):
            out[q] = f"SELECT * FROM read_parquet('{p}')"
    return out


def oracle_sql_for(sf_dir: str) -> dict[str, str]:
    """Oracle SQL strings; CDC oracles reference the synthesized binlog
    parquet for the given sf tier by absolute path."""
    bdir = binlog_dir(sf_dir)
    meta = get_binlog(sf_dir)
    return _golden_oracles(sf_dir) | {
        "cdc_replay_snapshot": _CDC_SNAPSHOT_SQL.format(glob=f"{bdir}/epoch-*/*.parquet"),
        "cdc_point_lookup": _CDC_POINT_LOOKUP_SQL.format(
            glob=f"{bdir}/epoch-*/*.parquet"),
        "cdc_delete_where": _CDC_DELETE_WHERE_SQL.format(
            glob=f"{bdir}/epoch-*/*.parquet"),
        "cdc_delete_egress": _CDC_DELETE_EGRESS_SQL.format(
            glob=f"{bdir}/epoch-*/*.parquet"),
        "cdc_domain_stats": _CDC_DOMAIN_SQL.format(
            glob=f"{bdir}/epoch-*/*.parquet"),
        "cdc_mirror_snapshot": _CDC_SNAPSHOT_SQL.format(
            glob=f"{bdir}/epoch-*/*.parquet"),
        "cdc_url_normalized": _CDC_URL_NORM_SQL.replace(
            "SNAPSHOT_SQL", _CDC_SNAPSHOT_SQL.format(
                glob=f"{bdir}/epoch-*/*.parquet")),
        "cdc_replay_norm_keys": _CDC_NORM_KEYS_SQL_T.format(
            glob=f"{bdir}/epoch-*/*.parquet"),
        "cdc_retention_snapshot": _CDC_RETENTION_SQL.format(
            glob=f"{bdir}/epoch-*/*.parquet"),
        "cdc_window_scan": _CDC_WINDOW_SCAN_SQL.format(
            glob=f"{bdir}/epoch-*/*.parquet"),
        "cdc_lww_dedup": _CDC_SNAPSHOT_SQL.format(glob=f"{bdir}/epoch-*/*.parquet"),
        # bus offsets are 1-based append order == binlog offset + 1 (the
        # synth binlog's offsets are contiguous from 0); the +1 shift is
        # order-preserving so the LWW winners are identical
        "cdc_bus_tail": _CDC_BUS_SNAPSHOT_SQL.format(
            glob=f"{bdir}/epoch-*/*.parquet"),
        "cdc_update_partial": _CDC_UPDATE_SQL.format(
            epoch0=os.path.join(meta["epochs"][0]["path"], "*.parquet"),
            epoch1=os.path.join(meta["epochs"][1]["path"], "*.parquet"),
        ),
        "cdc_enrich_tokens": _CDC_ENRICH_SQL.format(glob=f"{bdir}/epoch-*/*.parquet"),
        "cdc_schema_evolution": _CDC_EVOLUTION_SQL.format(
            glob=os.path.join(CDC_ROOT, _sf_name(sf_dir), "binlog_evo", "epoch-*", "*.parquet")
        ),
        "cdc_egress_epoch": _CDC_EGRESS_SQL.format(
            epoch0=os.path.join(meta["epochs"][0]["path"], "*.parquet"),
            epoch1=os.path.join(meta["epochs"][1]["path"], "*.parquet"),
            lo=meta["epochs"][1]["offset_min"],
            hi=meta["epochs"][1]["offset_max"],
        ),
        "cdc_epoch_diff": _CDC_DIFF_SQL.format(
            glob=f"{bdir}/epoch-*/*.parquet",
            o0=meta["epochs"][0]["offset_max"],
            o1=meta["epochs"][-1]["offset_max"],
        ),
        "pricing_summary": _PRICING_SQL,
        "top_customer_orders": _TOP_CUSTOMER_SQL,
        "events_windowed": _EVENTS_WINDOWED_SQL,
        "events_sliding_window": _EVENTS_SLIDING_SQL,
        "events_asof_join": _EVENTS_ASOF_SQL,
        "lww_latest_events": _LWW_EVENTS_SQL,
        "upsert_events": _UPSERT_EVENTS_SQL,
        "convert_events_typed": _CONVERT_EVENTS_SQL,
        "events_sessionized": _SESSIONIZE_SQL,
        "events_distinct_users": _DISTINCT_USERS_SQL,
        "orders_semi_join": _SEMI_JOIN_SQL,
        "cdc_backfill_rewrite": _CDC_BACKFILL_SQL.format(glob=f"{bdir}/epoch-*/*.parquet"),
        "cdc_dynamic_mode": _CDC_DYNAMIC_MODE_SQL.format(
            epoch0=os.path.join(meta["epochs"][0]["path"], "*.parquet"),
            epoch1=os.path.join(meta["epochs"][1]["path"], "*.parquet"),
        ),
        "union_resolve_events": _UNION_RESOLVE_SQL,
        "cdc_lang_counts_view": _CDC_LANG_COUNTS_SQL.format(glob=f"{bdir}/epoch-*/*.parquet"),
        "cdc_lang_counts_view_keyed": _CDC_LANG_COUNTS_SQL.format(glob=f"{bdir}/epoch-*/*.parquet"),
        "cdc_lang_text_chars_view": _CDC_LANG_TEXT_CHARS_SQL.format(glob=f"{bdir}/epoch-*/*.parquet"),
        "cdc_deletes": _CDC_DELETES_SQL.format(
            epoch0=os.path.join(meta["epochs"][0]["path"], "*.parquet"),
            epoch1=os.path.join(meta["epochs"][1]["path"], "*.parquet"),
        ),
        "exact_dedup_documents": _EXACT_DEDUP_SQL,
        "content_hash_documents": _CONTENT_HASH_SQL,
        "token_stats_documents": _TOKEN_STATS_SQL,
        "quality_documents": _QUALITY_SQL,
        "lang_distribution_documents": _LANG_DIST_SQL,
        "vocab_topk_documents": _VOCAB_TOPK_SQL,
        "doc_freq_documents": _DOC_FREQ_SQL,
        "length_filter_documents": _LENGTH_FILTER_SQL,
        "schema_project_documents": _SCHEMA_PROJECT_SQL,
        "embedding_topk": _EMBEDDING_TOPK_SQL,
        "embedding_neardup": _EMBEDDING_NEARDUP_SQL,
        "embedding_clusters": _EMBEDDING_CLUSTERS_SQL,
        "sample_documents": _SAMPLE_DOCS_SQL,
        "split_documents": _split_docs_sql(),
        "shuffle_documents": _SHUFFLE_DOCS_SQL,
        "stratified_cap_documents": _STRATIFIED_CAP_SQL,
        "pack_documents": _PACK_DOCS_SQL,
        "duplicate_spans_documents": _DUP_SPANS_SQL,
        "top_docs_per_lang": _TOP_DOCS_PER_LANG_SQL,
        "token_quantiles_documents": _TOKEN_QUANTILES_SQL,
        "duplicate_span_stats_documents": _DUP_SPAN_STATS_SQL,
        "lang_token_budget_documents": _LANG_TOKEN_BUDGET_SQL,
        "token_budget_documents": _TOKEN_BUDGET_SQL,
        "pii_scrub_documents": _PII_SCRUB_SQL.format(
            email=_PII_EMAIL, phone=_PII_PHONE,
        ),
        "contamination_documents": _CONTAMINATION_SQL,
        "repetition_documents": _REPETITION_SQL,
        "geo_bbox_events": _GEO_BBOX_SQL,
        "geo_z2_events": _GEO_Z2_SQL,
        "geo_z3_keys_events": _GEO_Z3_KEYS_SQL,
        "geo_z3_bbox_events": _GEO_Z3_BBOX_SQL,
        "geo_wkt_events": _GEO_WKT_SQL,
        "ngram_dedup_documents": _NGRAM_DEDUP_SQL,
        "nested_pages_stats": _NESTED_PAGES_SQL.format(path=_nested_pages_path(sf_dir)),
        "training_data_prep": _TRAINING_PREP_SQL,
    }


ORACLE_SQL = None  # resolved lazily per sf in __ray_entry__
