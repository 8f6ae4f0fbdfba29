"""CLI entry point — the ``ray job submit`` surface.

Usage (each command owns its Ray session; ``--num-cpus`` maps to the
cluster-size knob of the two-cluster-size scaling protocol)::

    python -m geomesa_nifi_ray synth  --out /tmp/binlog --events 100000 --urls 20000 --epochs 5
    python -m geomesa_nifi_ray replay --binlog /tmp/binlog --lake /tmp/lake [--catchup] [--update]
    python -m geomesa_nifi_ray status --lake /tmp/lake
    python -m geomesa_nifi_ray snapshot --lake /tmp/lake --out /tmp/snap --format csv
    python -m geomesa_nifi_ray egress --lake /tmp/lake --epoch 2 --out /tmp/changes --format jsonl
    python -m geomesa_nifi_ray diff --lake /tmp/lake --from 1 --to 3 --out /tmp/diff --format jsonl
    python -m geomesa_nifi_ray lookup --lake /tmp/lake --key https://ex.com/a [--epoch 2]
    python -m geomesa_nifi_ray delete --lake /tmp/lake --key https://ex.com/a
    python -m geomesa_nifi_ray vacuum --lake /tmp/lake --retain 2
    python -m geomesa_nifi_ray truncate --lake /tmp/lake
    python -m geomesa_nifi_ray metrics --lake /tmp/lake [--serve --port 9464]
    python -m geomesa_nifi_ray view --lake /tmp/lake --group lang [--state keyed]
                                    [--sum-col text] [--rebuild] [--show]
"""

from __future__ import annotations

import argparse
import json
import sys


def _print_export_summary(result, out_dir: str, fmt: str,
                          extra: dict | None = None) -> None:
    """One JSON summary shape for every export-producing subcommand
    (snapshot / egress / diff): parquet returns the out dir; the shard
    writers return a lineage table (path, rows, bytes). ``extra`` fields
    merge into the one JSON line (consumers parse the LAST stdout line)."""
    if isinstance(result, str):
        print(json.dumps({"out_dir": result, "format": fmt,
                          "shards": None, "rows": None, **(extra or {})}))
        return
    lineage = result.to_pandas()
    rows = int(lineage["rows"].sum()) if len(lineage) else 0
    print(json.dumps({"out_dir": out_dir, "format": fmt,
                      "shards": len(lineage), "rows": rows,
                      **(extra or {})}))


def _parse_where(exprs: list[str]) -> list[tuple]:
    """Parse repeated ``--where COL<OP>VALUE`` flags into the conjunct
    list ``LakeTable.snapshot_dataset(where=…)`` takes. The LEFTMOST
    operator occurrence splits the expression (a comparison substring
    inside the VALUE, e.g. ``url==https://a?x>=1``, must not win), with
    the longer op preferred at a tie so ``>=`` never parses as ``>``;
    literals stay strings — ``validate_where`` casts them to the
    column's type. Ops come from the validator's own set, so the parser
    can never accept or miss an op the scan layer doesn't."""
    from geomesa_nifi_ray.lake import _WHERE_OPS

    ops = sorted(_WHERE_OPS, key=len, reverse=True)
    out = []
    for expr in exprs:
        best = None
        for op in ops:
            i = expr.find(op)
            if i != -1 and (best is None or i < best[0]):
                # strict < keeps the earlier-listed (longer) op on ties
                best = (i, op)
        if best is None:
            raise ValueError(f"--where {expr!r}: expected COL<OP>VALUE "
                             f"with OP one of {tuple(_WHERE_OPS)}")
        i, op = best
        out.append((expr[:i].strip(), op, expr[i + len(op):].strip()))
    return out


def _parse_columns(arg: str | None) -> list[str] | None:
    """Parse a ``--columns a,b,c`` flag; None when absent. A flag that
    yields NO names (``--columns ','``) is a user error, never a silent
    empty projection (which would export a 0-column dataset with exit 0)."""
    if arg is None:
        return None
    cols = [c.strip() for c in arg.split(",") if c.strip()]
    if not cols:
        raise ValueError(f"--columns {arg!r}: no column names given")
    return cols


def _ray_session(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False, logging_level="ERROR")
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="geomesa_nifi_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("synth")
    sp.add_argument("--out", required=True)
    sp.add_argument("--events", type=int, default=100_000)
    sp.add_argument("--urls", type=int, default=20_000)
    sp.add_argument("--epochs", type=int, default=5)
    sp.add_argument("--seed", type=int, default=42)

    rp = sub.add_parser("replay")
    rp.add_argument("--binlog", required=True)
    rp.add_argument("--lake", required=True)
    rp.add_argument("--buckets", type=int, default=64)
    rp.add_argument("--catchup", action="store_true")
    rp.add_argument("--update", action="store_true", help="partial-update mode")
    rp.add_argument("--compat", choices=["exact", "existing", "update"], default="existing")
    rp.add_argument("--key-transform", default=None, metavar="NAME",
                    help="canonical-key ingest: named transform (e.g. "
                         "normalize_url) stamped into a NEW lake and "
                         "applied to the key column before LWW/bucketing; "
                         "on an existing lake the stamp wins (a different "
                         "explicit value is refused)")

    tl = sub.add_parser(
        "tail",
        description="Tail a growing binlog directory. Producers MUST publish "
        "each epoch-NNNNN dir atomically (write parts to a tmp dir, then one "
        "rename), or write a _SUCCESS marker last and pass --require-marker: "
        "an epoch is committed as soon as it is discovered, and parts landing "
        "later in a committed epoch dir are skipped forever.",
    )
    tl.add_argument("--binlog", required=True, help="directory of epoch-NNNNN/ dirs")
    tl.add_argument("--lake", required=True)
    tl.add_argument("--buckets", type=int, default=64)
    tl.add_argument("--poll", type=float, default=1.0)
    tl.add_argument("--max-idle", type=int, default=3)
    tl.add_argument("--require-marker", action="store_true",
                    help="only ingest epoch dirs containing a _SUCCESS marker")

    st = sub.add_parser("status")
    st.add_argument("--lake", required=True)

    sn = sub.add_parser("snapshot")
    sn.add_argument("--lake", required=True)
    sn.add_argument("--out", required=True)
    sn.add_argument("--format", default="parquet")
    sn.add_argument("--epoch", type=int, default=None,
                    help="time-travel: export the state at this committed "
                    "epoch instead of the latest")
    sn.add_argument("--partition-by", default=None,
                    help="parquet only: comma-separated columns for a "
                    "hive-partitioned layout (one directory per value, "
                    "e.g. --partition-by lang)")
    sn.add_argument("--where", action="append", default=None,
                    metavar="COL<OP>VALUE",
                    help="predicate conjunct (repeatable, ANDed), e.g. "
                    "--where 'warc_ts>=2020-01-10' --where 'lang==en'; "
                    "parquet footer stats prune non-matching bucket chains "
                    "before any data is read")
    sn.add_argument("--columns", default=None,
                    help="comma-separated column projection — only these "
                    "columns are read and exported (predicate columns are "
                    "still read when --where needs them)")

    eg = sub.add_parser("egress")
    eg.add_argument("--lake", required=True)
    eg.add_argument("--epoch", type=int, required=True)
    eg.add_argument("--out", required=True)
    eg.add_argument("--format", default="jsonl")
    eg.add_argument("--where", action="append", default=None,
                    metavar="COL<OP>VALUE",
                    help="keep only change rows matching every conjunct "
                    "(SQL null semantics: tombstones carry only key+order "
                    "columns, so non-key conjuncts drop them)")
    eg.add_argument("--columns", default=None,
                    help="comma-separated column projection for the "
                    "exported change rows")

    df = sub.add_parser(
        "diff",
        description="Row-level diff between the table states at two "
        "committed epochs (added / changed / removed); bucket-local, "
        "no shuffle.",
    )
    df.add_argument("--lake", required=True)
    df.add_argument("--from", dest="epoch_a", type=int, required=True)
    df.add_argument("--to", dest="epoch_b", type=int, required=True)
    df.add_argument("--out", required=True)
    df.add_argument("--format", default="jsonl")
    df.add_argument("--where", action="append", default=None,
                    metavar="COL<OP>VALUE",
                    help="keep only diff rows matching every conjunct "
                    "(evaluated on the diff row's payload columns)")

    lk = sub.add_parser(
        "lookup",
        description="Keyed point lookup: print the live row (if any) for "
        "each --key as a JSON line. Driver-side — hashes keys to their "
        "buckets and opens only the matching row groups; no Ray session.",
    )
    lk.add_argument("--lake", required=True)
    lk.add_argument("--key", action="append", required=True,
                    help="key value (repeatable)")
    lk.add_argument("--epoch", type=int, default=None,
                    help="time-travel to this committed epoch")
    lk.add_argument("--columns", default=None,
                    help="comma-separated projection")

    de = sub.add_parser(
        "delete",
        description="Delete keys as one exactly-once maintenance epoch "
        "(tombstone delta per touched bucket; absent keys are no-ops; "
        "the tail cursor skips the epoch).",
    )
    de.add_argument("--lake", required=True)
    de.add_argument("--key", action="append", required=True,
                    help="key value to delete (repeatable)")

    ex = sub.add_parser(
        "expire",
        description="Retention/TTL maintenance: tombstone every live row "
        "whose winning event time is older than --before, as one "
        "exactly-once epoch (scan reads key+order columns only; writes "
        "are O(matches); mirrors age off via the change stream).",
    )
    ex.add_argument("--lake", required=True)
    ex.add_argument("--before", required=True, metavar="TIMESTAMP",
                    help="ISO timestamp cutoff, e.g. 2020-06-01T00:00:00")

    mi = sub.add_parser(
        "mirror",
        description="Replicate a source lake's committed epochs into "
        "--lake via its change stream (resumable: the mirror's committed "
        "epoch is the cursor; deletes/rewrites/clears replicate too).",
    )
    mi.add_argument("--src-lake", required=True)
    mi.add_argument("--lake", required=True)
    mi.add_argument("--buckets", type=int, default=64,
                    help="bucket count for a NEW mirror lake (a mirror may "
                    "use a different partitioning than its source)")

    vc = sub.add_parser("vacuum")
    vc.add_argument("--lake", required=True)
    vc.add_argument("--retain", type=int, default=2)

    cp = sub.add_parser(
        "compact",
        description="Fold every bucket's delta chain into a fresh url-sorted "
        "base file (one new epoch); combine with vacuum to reclaim space.",
    )
    cp.add_argument("--lake", required=True)
    cp.add_argument("--buckets", type=int, default=64)

    tr = sub.add_parser(
        "truncate",
        description="Whole-table clear as an exactly-once epoch "
        "(GeoMessage.Clear analog); pre-clear epochs stay readable via "
        "time travel until vacuumed.",
    )
    tr.add_argument("--lake", required=True)
    tr.add_argument("--buckets", type=int, default=64)

    mx = sub.add_parser(
        "metrics",
        description="Prometheus text exposition for a lake table; --serve "
        "starts a scrape endpoint (GET /metrics) until interrupted.",
    )
    mx.add_argument("--lake", required=True)
    mx.add_argument("--serve", action="store_true")
    mx.add_argument("--port", type=int, default=9464)

    vw = sub.add_parser(
        "view",
        description="Maintain an incremental materialized view over the "
        "lake (COUNT or SUM GROUP BY): refresh applies only committed "
        "epochs newer than the view cursor. --state keyed stores the view "
        "in its own CDC lake table (high cardinality); json keeps the "
        "compact counts-map state. --sum-col switches COUNT(*) to "
        "SUM(utf8_length(col)).",
    )
    vw.add_argument("--lake", required=True)
    vw.add_argument("--group", default="lang")
    vw.add_argument("--state", choices=["json", "keyed"], default="json")
    vw.add_argument("--sum-col", default=None,
                    help="value column: view becomes SUM(utf8_length(col))")
    vw.add_argument("--views-root", default=None,
                    help="state directory (default <lake>/views)")
    vw.add_argument("--rebuild", action="store_true",
                    help="full recompute instead of incremental refresh")
    vw.add_argument("--show", action="store_true",
                    help="print the counts table after maintenance")
    vw.add_argument("--distributed", action="store_true",
                    help="keyed state only: refresh with no driver delta "
                    "dict (backfill-scale epochs)")

    args = p.parse_args(argv)

    if args.cmd == "synth":
        from geomesa_nifi_ray.synth import BinlogSpec, write_binlog

        try:
            _ray_session(args.num_cpus)  # enables parallel generation
        except ImportError:
            pass
        meta = write_binlog(
            args.out,
            BinlogSpec(num_events=args.events, num_urls=args.urls,
                       num_epochs=args.epochs, seed=args.seed),
        )
        print(json.dumps({"binlog": args.out, "total_rows": meta["total_rows"],
                          "epochs": len(meta["epochs"])}))
        return 0

    if args.cmd == "replay":
        _ray_session(args.num_cpus)
        from geomesa_nifi_ray.engine import CDCEngine
        from geomesa_nifi_ray.schema import CompatibilityMode

        with open(f"{args.binlog}/binlog.json") as f:
            meta = json.load(f)
        try:
            eng = CDCEngine(args.lake, num_buckets=args.buckets,
                            compatibility=CompatibilityMode(args.compat),
                            key_transform=args.key_transform)
        except ValueError as e:  # e.g. key_transform mismatch with the stamp
            print(f"error: {e}", file=sys.stderr)
            return 2
        results = eng.replay_binlog(
            meta, mode="update" if args.update else "upsert", catchup=args.catchup
        )
        print(json.dumps({
            "epochs_applied": [r.epoch for r in results],
            "rows_in": sum(r.rows_in for r in results),
            "rows_failed": sum(r.rows_failed for r in results),
            "table_rows": results[-1].table_rows if results else None,
            "committed_epoch": eng.table.committed_epoch(),
        }))
        return 0

    if args.cmd == "tail":
        _ray_session(args.num_cpus)
        from geomesa_nifi_ray.engine import CDCEngine

        eng = CDCEngine(args.lake, num_buckets=args.buckets)
        results = eng.tail(args.binlog, poll_interval=args.poll,
                           max_idle_polls=args.max_idle,
                           require_marker=args.require_marker)
        print(json.dumps({
            "epochs_applied": [r.epoch for r in results],
            "committed_epoch": eng.table.committed_epoch(),
        }))
        return 0

    if args.cmd == "status":
        from geomesa_nifi_ray.lake import LakeTable
        from geomesa_nifi_ray.metrics import skew_report

        t = LakeTable.load(args.lake, "pages")
        committed = t.committed_epoch()
        sk = skew_report(t)
        print(json.dumps({
            "committed_epoch": committed,
            "schema_version": t.meta["schema_version"],
            "num_buckets": t.num_buckets,
            "table_rows": int(sk.rows.sum()) if len(sk) else 0,
            "hottest_bucket_share": round(float(sk.share.iloc[0]), 4) if len(sk) else 0,
        }))
        return 0

    if args.cmd == "snapshot":
        _ray_session(args.num_cpus)
        from geomesa_nifi_ray.export import export_dataset
        from geomesa_nifi_ray.lake import LakeTable

        t = LakeTable.load(args.lake, "pages")
        if args.epoch is not None and args.epoch not in t.manifest_epochs():
            print(f"error: no manifest for epoch {args.epoch}; committed "
                  f"epochs are {t.manifest_epochs()}", file=sys.stderr)
            return 2
        pcols = ([c.strip() for c in args.partition_by.split(",") if c.strip()]
                 if args.partition_by else None)
        try:
            # KeyError (unknown --where/--columns name) is a user error
            # only in THIS step; a KeyError out of the export path below
            # would be an internal bug and must keep its traceback
            cols = _parse_columns(args.columns)
            where = _parse_where(args.where) if args.where else None
            ds = t.snapshot_dataset(epoch=args.epoch, where=where,
                                    columns=cols)
        except KeyError as e:
            print(f"error: {e.args[0]}", file=sys.stderr)
            return 2
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        try:
            out = export_dataset(ds, args.out, format=args.format,
                                 partition_cols=pcols)
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        extra = None
        if where is not None and t.last_prune_report:
            extra = {"prune": t.last_prune_report}
        _print_export_summary(out, args.out, args.format, extra=extra)
        return 0

    if args.cmd == "egress":
        _ray_session(args.num_cpus)
        from geomesa_nifi_ray.export import egress_epoch
        from geomesa_nifi_ray.lake import LakeTable

        t = LakeTable.load(args.lake, "pages")
        if args.epoch not in t.manifest_epochs():
            print(f"error: no manifest for epoch {args.epoch}; committed "
                  f"epochs are {t.manifest_epochs()}", file=sys.stderr)
            return 2
        try:
            # validate user input HERE with the same callables
            # egress_epoch re-runs (both idempotent — one implementation,
            # no drift); export errors below keep their tracebacks
            from geomesa_nifi_ray.export import validate_egress_projection
            from geomesa_nifi_ray.lake import validate_where

            cols = _parse_columns(args.columns)
            where = _parse_where(args.where) if args.where else None
            if where is not None:
                where = validate_where(t.schema, where)
            validate_egress_projection(t, cols)
        except KeyError as e:
            print(f"error: {e.args[0]}", file=sys.stderr)
            return 2
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        try:
            out = egress_epoch(t, args.epoch, args.out, format=args.format,
                               columns=cols, where=where)
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        _print_export_summary(out, args.out, args.format)
        return 0

    if args.cmd == "diff":
        _ray_session(args.num_cpus)
        from geomesa_nifi_ray.export import export_dataset
        from geomesa_nifi_ray.lake import LakeTable

        t = LakeTable.load(args.lake, "pages")
        try:
            # user-input validation ONLY (KeyError here = unknown --where
            # column); the dataset build + export below keep tracebacks
            # for internal KeyErrors (same split as snapshot/egress)
            where = _parse_where(args.where) if args.where else None
            if where is not None:
                from geomesa_nifi_ray.lake import validate_where

                where = validate_where(t.schema, where)
        except KeyError as e:
            print(f"error: {e.args[0]}", file=sys.stderr)
            return 2
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        try:
            ds = t.epoch_diff_dataset(args.epoch_a, args.epoch_b)
            if where is not None:
                from geomesa_nifi_ray.lake import apply_where_dataset

                ds = apply_where_dataset(ds, t.schema, where)
            out = export_dataset(ds, args.out, format=args.format)
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        _print_export_summary(out, args.out, args.format)
        return 0

    if args.cmd == "lookup":
        from geomesa_nifi_ray.lake import LakeTable

        t = LakeTable.load(args.lake, "pages")
        try:
            cols = _parse_columns(args.columns)
            hit = t.lookup_keys(args.key, columns=cols, epoch=args.epoch)
        except KeyError as e:
            # schema.field on an unknown --columns name raises KeyError
            print(f"error: unknown column {e.args[0]!r}", file=sys.stderr)
            return 2
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        for row in hit.to_pylist():
            print(json.dumps(row, default=str))
        return 0

    if args.cmd == "mirror":
        _ray_session(args.num_cpus)
        from geomesa_nifi_ray.engine import CDCEngine
        from geomesa_nifi_ray.lake import LakeTable

        from geomesa_nifi_ray.schema import CompatibilityMode

        src = LakeTable.load(args.src_lake, "pages")
        # a mirror follows its source, including additive evolution
        eng = CDCEngine(args.lake, num_buckets=args.buckets,
                        compatibility=CompatibilityMode.UPDATE)
        try:
            applied = eng.mirror_from(src)
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        print(json.dumps({
            "epochs_applied": len(applied),
            "committed_epoch": eng.table.committed_epoch(),
            "table_rows": applied[-1].table_rows if applied else None,
        }))
        return 0

    if args.cmd == "delete":
        _ray_session(args.num_cpus)
        from geomesa_nifi_ray.engine import CDCEngine
        from geomesa_nifi_ray.lake import LakeTable

        if not LakeTable.exists(args.lake, "pages"):
            # load-only commands must not side-effect a default-config
            # empty lake into a typo'd path
            print(f"error: no lake at {args.lake}", file=sys.stderr)
            return 2
        eng = CDCEngine(args.lake)
        try:
            r = eng.delete_keys(args.key)
        except ValueError as e:  # SchemaError: empty table
            print(f"error: {e}", file=sys.stderr)
            return 2
        print(json.dumps({
            "epoch": None if r is None else r.epoch,
            "rows_deleted": 0 if r is None else r.rows_deleted,
            "table_rows": 0 if r is None else r.table_rows,
        }))
        return 0

    if args.cmd == "expire":
        _ray_session(args.num_cpus)
        from geomesa_nifi_ray.engine import CDCEngine
        from geomesa_nifi_ray.lake import LakeTable

        if not LakeTable.exists(args.lake, "pages"):
            print(f"error: no lake at {args.lake}", file=sys.stderr)
            return 2
        eng = CDCEngine(args.lake)
        try:
            r = eng.expire_before(args.before)
        except ValueError as e:  # SchemaError: empty table / bad timestamp
            print(f"error: {e}", file=sys.stderr)
            return 2
        print(json.dumps({
            "epoch": None if r is None else r.epoch,
            "rows_deleted": 0 if r is None else r.rows_deleted,
            "table_rows": 0 if r is None else r.table_rows,
        }))
        return 0

    if args.cmd == "vacuum":
        from geomesa_nifi_ray.lake import LakeTable

        t = LakeTable.load(args.lake, "pages")
        deleted = t.vacuum(retain_epochs=args.retain)
        print(json.dumps({"deleted_files": len(deleted)}))
        return 0

    if args.cmd == "truncate":
        _ray_session(args.num_cpus)
        from geomesa_nifi_ray.engine import CDCEngine

        eng = CDCEngine(args.lake, num_buckets=args.buckets)
        r = eng.truncate()
        print(json.dumps({
            "epoch": None if r is None else r.epoch,
            "rows_deleted": 0 if r is None else r.rows_deleted,
        }))
        return 0

    if args.cmd == "metrics":
        from geomesa_nifi_ray.lake import LakeTable
        from geomesa_nifi_ray.metrics import prometheus_text, serve_metrics

        t = LakeTable.load(args.lake, "pages")
        if not args.serve:
            sys.stdout.write(prometheus_text(t))
            return 0
        server, port = serve_metrics(t, port=args.port)
        print(f"# serving on http://127.0.0.1:{port}/metrics", file=sys.stderr)
        try:
            import time as _time

            while True:
                _time.sleep(3600)
        except KeyboardInterrupt:
            server.shutdown()
        return 0

    if args.cmd == "view":
        import os as _os

        _ray_session(args.num_cpus)
        from geomesa_nifi_ray.derived import (GroupCountView,
                                              GroupSumView,
                                              KeyedGroupCountView)
        from geomesa_nifi_ray.lake import LakeTable

        t = LakeTable.load(args.lake, "pages")
        root = args.views_root or _os.path.join(args.lake, "views")
        if args.state == "keyed":
            if args.sum_col:
                p.error("--sum-col is json-state only (keyed SUM views: "
                        "use the library API)")
            view = KeyedGroupCountView(t, root, group_col=args.group)
            refresh_kwargs = {"distributed": args.distributed}
        elif args.sum_col:
            view = GroupSumView(t, root, group_col=args.group,
                                value_col=args.sum_col,
                                value_kernel="utf8_length")
            refresh_kwargs = {}
        else:
            view = GroupCountView(t, root, group_col=args.group)
            refresh_kwargs = {}
        if args.rebuild:
            view.rebuild()
            applied = "rebuild"
        else:
            applied = view.refresh(**refresh_kwargs)
        if args.state == "keyed" and not args.show:
            # keyed state exists precisely so group counts never
            # materialize on the driver: count distributed
            vt = view.engine.table
            groups = (int(vt.snapshot_dataset(columns=["k"]).count())
                      if vt.committed_epoch() is not None else 0)
        else:
            groups = len(view.counts())
        out = {"state": args.state, "group": args.group,
               "epochs_applied": applied,
               "groups": groups}
        if args.show:
            out["counts"] = view.counts()
        print(json.dumps(out, sort_keys=True))
        return 0

    if args.cmd == "compact":
        _ray_session(args.num_cpus)
        from geomesa_nifi_ray.engine import CDCEngine

        eng = CDCEngine(args.lake, num_buckets=args.buckets)
        r = eng.rewrite_epoch(lambda t: t)  # identity rewrite folds chains
        print(json.dumps({
            "epoch": r.epoch,
            "buckets_compacted": r.buckets_touched,
            "table_rows": r.table_rows,
        }))
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
