"""Round-5 regression tests for the round-5 diff review findings.

1. read_parquet_pruned must handle BINARY key columns: parquet stats come
   back as bytes for both string and binary columns; decoding is only
   legal for string keys (non-UTF8 binary keys crashed, and decoded stats
   mis-compared str vs bytes).
2. AppendLogBusSource.append with a zero-row table is a documented no-op
   (trickle producers flush empty batches); it must not crash on a fresh
   bus and must return the documented empty range (last + 1, last).
3. CDCEngine.committed_offset reads only the manifest HEAD (one JSON per
   epoch probed) — never the shard files of a sharded manifest; the tail
   cursor probe runs on every idle poll.
4. BotoS3Handler.put_if_absent treats S3's documented 409
   ConditionalRequestConflict as contention (re-probe + retry), not a
   fatal error — real S3 can 409 a racing conditional PUT where moto
   always 412s.
5. The bus-tail SQL oracle derives from the SAME template as the file
   replay oracle (offset projection is the only difference) so the LWW /
   content-hash recipe can never silently diverge between the two.
6. The xx64 kernel fingerprint probes BOTH polars hash code paths (Utf8
   and Binary) so binary-keyed lakes are guarded against a polars
   upgrade that changes only the Binary dtype hashing; legacy v1 stamps
   (utf8 probe only) keep loading while that part reproduces.
"""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from geomesa_nifi_ray.engine import CDCEngine
from geomesa_nifi_ray.lake import LakeFS


# -- 1: binary-key row-group pruning ----------------------------------------

def _write_sorted(path: str, keys, vals, rows_per_group: int):
    t = pa.table({"k": keys, "v": pa.array(vals, pa.int64())})
    pq.write_table(t, path, row_group_size=rows_per_group)


def test_read_parquet_pruned_binary_key(tmp_path):
    fs = LakeFS()
    path = str(tmp_path / "bin.parquet")
    # sorted binary keys including non-UTF8 bytes (0x80/0xff are invalid
    # UTF-8 lead/continuation bytes) spread over 4 row groups
    keys = pa.array(
        [bytes([b, i]) for b in (0x10, 0x41, 0x80, 0xFF) for i in range(4)],
        pa.binary())
    _write_sorted(path, keys, list(range(16)), rows_per_group=4)

    got, total, kept = fs.read_parquet_pruned(
        path, None, "k", [bytes([0x80, 2])])
    assert total == 4
    assert kept <= 2  # only the group(s) whose range covers 0x80..
    assert bytes([0x80, 2]) in got["k"].to_pylist()

    # keep-none path: a probe key beyond every max prunes everything
    got, total, kept = fs.read_parquet_pruned(
        path, None, "k", [b"\xff\xff\xff"])
    assert (total, kept, got.num_rows) == (4, 0, 0)

    # large_binary keys go through the same non-decoding path
    path2 = str(tmp_path / "lbin.parquet")
    _write_sorted(path2, keys.cast(pa.large_binary()), list(range(16)), 4)
    got, total, kept = fs.read_parquet_pruned(
        path2, ["k"], "k", [bytes([0x41, 0])])
    assert bytes([0x41, 0]) in got["k"].to_pylist()


def test_read_parquet_pruned_binary_key_end_to_end(ray_session, tmp_path):
    """A generic CDC table keyed on a BINARY column must survive the
    second upsert epoch (the delta path takes read_partition_keyed ->
    read_parquet_pruned)."""
    import ray.data

    from geomesa_nifi_ray.engine import make_generic_convert_fn

    schema = pa.schema([
        pa.field("kid", pa.binary()),
        pa.field("val", pa.int64()),
        pa.field("ts", pa.int64()),
        pa.field("seq", pa.int64()),
        pa.field("content_hash", pa.string()),
    ])
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=4, schema=schema,
                    key="kid", order=("ts", "seq"),
                    convert_fn_factory=make_generic_convert_fn)

    def ep(epoch, n, off0, bump=0):
        t = pa.table({
            "kid": pa.array([bytes([0x80 + (i % 64), i // 64])
                             for i in range(n)], pa.binary()),
            "val": pa.array([i + bump for i in range(n)], pa.int64()),
            "ts": pa.array([off0 + i for i in range(n)], pa.int64()),
            "seq": pa.array([off0 + i for i in range(n)], pa.int64()),
        })
        eng.apply_epoch(ray.data.from_arrow(t), epoch=epoch,
                        offset_range=(off0, off0 + n - 1))

    ep(0, 120, 0)
    ep(1, 30, 1000, bump=5000)  # second epoch: the pruned-merge path
    snap = eng.table.snapshot_table()
    assert snap.num_rows == 120
    by_key = dict(zip(snap["kid"].to_pylist(), snap["val"].to_pylist()))
    assert by_key[bytes([0x80, 0])] == 5000  # epoch-1 winner


# -- 2: empty bus append ------------------------------------------------------

def test_bus_append_empty_table(tmp_path):
    from geomesa_nifi_ray.sources.spi import AppendLogBusSource

    schema = pa.schema([
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("offset", pa.int64()),
    ])
    bus = AppendLogBusSource(str(tmp_path / "bus.db"), schema=schema)
    empty = schema.empty_table()

    # fresh bus (sqlite_sequence does not even exist yet): no crash, the
    # documented empty range (first > last means "nothing appended")
    first, last = bus.append(empty)
    assert (first, last) == (1, 0)

    rows = pa.table({
        "url": pa.array(["https://a", "https://b"]),
        "warc_ts": pa.array([1, 2], pa.int64()).cast(pa.timestamp("us")),
        "offset": pa.array([0, 0], pa.int64()),
    })
    assert bus.append(rows) == (1, 2)
    assert bus.append(empty) == (3, 2)   # still an empty range
    assert bus.append(rows) == (3, 4)    # offsets resume unharmed


# -- 3: committed_offset reads manifest heads only ---------------------------

def test_committed_offset_skips_shard_files(ray_session, tmp_path,
                                            monkeypatch):
    import ray.data

    import geomesa_nifi_ray.lake as lake_mod

    monkeypatch.setattr(lake_mod, "MANIFEST_SHARD_THRESHOLD", 4)
    monkeypatch.setattr(lake_mod, "MANIFEST_SHARD_SIZE", 3)
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=16)
    n = 200
    t = pa.table({
        "url": pa.array([f"https://s/{i:03d}" for i in range(n)]),
        "warc_ts": pa.array([1_000_000 + i for i in range(n)],
                            pa.int64()).cast(pa.timestamp("us")),
        "html": pa.array([b"<p>x</p>"] * n, pa.large_binary()),
        "lang": pa.array(["en"] * n, pa.string()),
        "offset": pa.array(list(range(n)), pa.int64()),
    })
    eng.apply_epoch(ray.data.from_arrow(t), epoch=0, offset_range=(0, n - 1))
    raw = eng.table.fs.read_json(eng.table._log_path(0))
    assert "buckets_sharded" in raw  # the epoch really is sharded

    calls: list[str] = []
    real = eng.table.fs.read_json
    monkeypatch.setattr(eng.table.fs, "read_json",
                        lambda p: (calls.append(p), real(p))[1])
    assert eng.committed_offset() == n - 1
    assert calls, "committed_offset read no manifests at all?"
    assert not [p for p in calls if "shards-" in os.path.basename(p)]

    # the counters loop in the Prometheus scrape is head-only too: only
    # live_entries() (which genuinely needs the bucket map) reassembles,
    # so the shard files are each read ONCE, not once per manifest pass
    from geomesa_nifi_ray.metrics import prometheus_text

    calls.clear()
    text = prometheus_text(eng.table)
    assert str(n) in text
    n_shards = eng.table.fs.read_json(
        eng.table._log_path(0))["buckets_sharded"]["shards"]
    shard_reads = [p for p in calls if "shards-" in os.path.basename(p)]
    assert len(shard_reads) == n_shards


# -- 4: put_if_absent under S3's 409 conditional-request conflict -------------

class _FakeClient:
    def __init__(self, codes, store):
        self.codes = list(codes)   # error codes to raise, in order
        self.store = store         # dict key -> bytes ("the bucket")

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
        from botocore.exceptions import ClientError

        if self.codes:
            raise ClientError({"Error": {"Code": self.codes.pop(0)}},
                              "PutObject")
        self.store[Key] = Body


def _handler_with(monkeypatch, codes, exists_after: bool):
    import pyarrow.fs as pafs

    from geomesa_nifi_ray.s3boto import BotoS3Handler

    pytest.importorskip("botocore")
    h = BotoS3Handler("http://127.0.0.1:1")  # never actually dialed
    store: dict = {}
    fake = _FakeClient(codes, store)
    monkeypatch.setattr(h, "_client", lambda: fake)
    ftype = pafs.FileType.File if exists_after else pafs.FileType.NotFound
    monkeypatch.setattr(h, "_info",
                        lambda path: pafs.FileInfo("x", ftype))
    return h, store


def test_put_if_absent_retries_through_409(monkeypatch):
    # two conflicts, then the PUT lands: contention, not an error
    h, store = _handler_with(
        monkeypatch, ["ConditionalRequestConflict", "409"],
        exists_after=False)
    assert h.put_if_absent("lake/k", b"v") is True
    assert store == {"k": b"v"}


def test_put_if_absent_409_lost_race_returns_false(monkeypatch):
    # conflict, and the rival's object is there on re-probe: lost the race
    h, store = _handler_with(
        monkeypatch, ["ConditionalRequestConflict"], exists_after=True)
    assert h.put_if_absent("lake/k", b"v") is False
    assert store == {}


def test_put_if_absent_412_still_returns_false(monkeypatch):
    h, store = _handler_with(monkeypatch, ["PreconditionFailed"],
                             exists_after=False)
    assert h.put_if_absent("lake/k", b"v") is False


# -- 5: one SQL template for both snapshot oracles ----------------------------

def test_bus_snapshot_sql_derives_from_file_template():
    from geomesa_nifi_ray.pipelines.queries import (
        _CDC_BUS_SNAPSHOT_SQL, _CDC_SNAPSHOT_SQL)

    # the bus oracle is the file oracle with ONLY the offset projection
    # swapped — byte-for-byte otherwise
    assert _CDC_BUS_SNAPSHOT_SQL.replace('("offset" + 1)', '"offset"') \
        == _CDC_SNAPSHOT_SQL


# -- 6: xx64 fingerprint covers the binary hash path --------------------------

def test_xx64_fingerprint_probes_binary_path_and_accepts_legacy(tmp_path):
    from geomesa_nifi_ray.hashing import kernel_fingerprint
    from geomesa_nifi_ray.lake import LakeTable

    fp = kernel_fingerprint("xx64")
    assert fp is not None and ":" in fp  # utf8 probe + binary probe

    schema = pa.schema([pa.field("k", pa.string()),
                        pa.field("content_hash", pa.string())])
    t = LakeTable.create(str(tmp_path), "t", schema, num_buckets=2,
                         content_hash_kernel="xx64")
    assert t.meta["content_hash_fingerprint"] == fp
    LakeTable.load(str(tmp_path), "t")  # round-trips

    # a legacy v1 stamp (utf8 probe only) still loads while that part
    # reproduces
    meta_path = None
    import glob as _glob
    import json as _json
    for p in _glob.glob(str(tmp_path / "t" / "*.json")):
        meta_path = p
    meta = _json.load(open(meta_path))
    meta["content_hash_fingerprint"] = fp.split(":")[0]
    _json.dump(meta, open(meta_path, "w"))
    t2 = LakeTable.load(str(tmp_path), "t")
    # load() is READ-ONLY: the legacy stamp is accepted but not rewritten
    # (a reader must not need write credentials)
    assert _json.load(open(meta_path))["content_hash_fingerprint"] \
        == fp.split(":")[0]
    # the WRITER upgrades the stamp so a future Binary-path-only polars
    # change still fails loudly
    assert t2.upgrade_fingerprint_if_legacy() is True
    assert t2.meta["content_hash_fingerprint"] == fp
    assert _json.load(open(meta_path))["content_hash_fingerprint"] == fp
    assert t2.upgrade_fingerprint_if_legacy() is False  # idempotent
    meta = _json.load(open(meta_path))

    # a stamp that matches neither form fails loudly
    meta["content_hash_fingerprint"] = "0123456789abcdef"
    _json.dump(meta, open(meta_path, "w"))
    with pytest.raises(RuntimeError, match="fingerprint"):
        LakeTable.load(str(tmp_path), "t")


# -- 7: content-addressed shards, locally (no object store needed) -----------

def test_sharded_reformed_replay_and_orphan_vacuum(ray_session, tmp_path,
                                                   monkeypatch):
    """A crashed sharded commit leaves orphan shard files; a legal replay
    that RE-FORMED the epoch with different content (bus sources grow
    trailing batches) must commit under new content-addressed names, and
    vacuum() must sweep the unreferenced orphans."""
    import glob

    import ray.data

    import geomesa_nifi_ray.lake as lake_mod

    monkeypatch.setattr(lake_mod, "MANIFEST_SHARD_THRESHOLD", 4)
    monkeypatch.setattr(lake_mod, "MANIFEST_SHARD_SIZE", 3)
    lake = str(tmp_path / "lake")

    def ep_table(n, off0):
        return pa.table({
            "url": pa.array([f"https://s/{i:03d}" for i in range(n)]),
            "warc_ts": pa.array([1_000_000 + off0 + i for i in range(n)],
                                pa.int64()).cast(pa.timestamp("us")),
            "html": pa.array([b"<p>x</p>"] * n, pa.large_binary()),
            "lang": pa.array(["en"] * n, pa.string()),
            "offset": pa.array([off0 + i for i in range(n)], pa.int64()),
        })

    # crashed attempt: epoch 0 formed with 150 rows, shards land, the
    # manifest does not (simulated by committing on a scratch table and
    # copying its shard files over as orphans)
    eng0 = CDCEngine(str(tmp_path / "scratch"), num_buckets=16)
    eng0.apply_epoch(ray.data.from_arrow(ep_table(150, 0)), epoch=0,
                     offset_range=(0, 149))
    orphan_srcs = glob.glob(str(tmp_path / "scratch" / "pages" / "_log" /
                                "shards-00000-*.json"))
    assert orphan_srcs  # the scratch epoch really sharded

    eng = CDCEngine(lake, num_buckets=16)
    import shutil
    for p in orphan_srcs:
        shutil.copy(p, os.path.join(lake, "pages", "_log",
                                    os.path.basename(p)))

    # the replay re-formed epoch 0 with MORE rows: must commit cleanly
    eng.apply_epoch(ray.data.from_arrow(ep_table(200, 0)), epoch=0,
                    offset_range=(0, 199))
    assert eng.table.snapshot_table().num_rows == 200
    assert len(eng.table.manifest(0)["buckets"]) == 16

    # vacuum sweeps the orphans; the committed shards survive
    removed = eng.table.vacuum(retain_epochs=2)
    orphan_names = {os.path.basename(p) for p in orphan_srcs}
    committed_names = set(eng.table.manifest_head(0)
                          ["buckets_sharded"]["files"])
    swept = {os.path.basename(p) for p in removed if "shards-" in p}
    assert swept == orphan_names - committed_names
    assert eng.table.snapshot_table().num_rows == 200  # reads intact


# -- 8: epoch-diff dataset (time-travel diff, bucket-local) -------------------

def test_epoch_diff_dataset_add_change_remove(ray_session, tmp_path,
                                              monkeypatch):
    """epoch_diff_dataset(a, b) classifies added / changed / removed rows
    between two committed states, skips buckets whose manifest entries
    are identical, and removals surface the epoch-a payload (keys whose
    LWW winner became a tombstone)."""
    import ray.data

    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=4)

    def ep(epoch, urls, langs, ts0, off0, ops=None):
        n = len(urls)
        cols = {
            "url": pa.array(urls),
            "warc_ts": pa.array([ts0 + i for i in range(n)],
                                pa.int64()).cast(pa.timestamp("us")),
            "html": pa.array(
                [None if (ops and ops[i] == "delete") else b"<p>x</p>"
                 for i in range(n)], pa.large_binary()),
            "lang": pa.array(langs, pa.string()),
            "offset": pa.array([off0 + i for i in range(n)], pa.int64()),
        }
        if ops:
            cols["_op"] = pa.array(ops, pa.string())
        eng.apply_epoch(ray.data.from_arrow(pa.table(cols)), epoch=epoch,
                        offset_range=(off0, off0 + n - 1))

    base = [f"https://d/{i:02d}" for i in range(12)]
    ep(0, base, ["en"] * 12, 1_000_000, 0)
    # epoch 1: change 2 keys, add 2, delete 2
    ep(1, [base[0], base[1], "https://d/new-a", "https://d/new-b",
           base[2], base[3]],
       ["de", "de", "fr", "fr", "en", "en"], 2_000_000, 100,
       ops=["upsert", "upsert", "upsert", "upsert", "delete", "delete"])

    diff = eng.table.epoch_diff_dataset(0, 1)
    rows = pa.Table.from_pylist(diff.take_all())
    tags = dict(zip(rows["url"].to_pylist(), rows["_change"].to_pylist()))
    assert tags[base[0]] == "changed" and tags[base[1]] == "changed"
    assert tags["https://d/new-a"] == "added"
    assert tags[base[2]] == "removed" and tags[base[3]] == "removed"
    assert len(tags) == 6
    # removed rows carry the epoch-0 payload
    removed = rows.filter(pc.equal(rows["_change"], "removed"))
    assert set(removed["lang"].to_pylist()) == {"en"}
    assert all(o < 100 for o in removed["offset"].to_pylist())

    # identical-state diff is empty and reads nothing
    assert eng.table.epoch_diff_dataset(1, 1).count() == 0
    # self-consistency: diff(0,1) added+changed keys all live at epoch 1
    live = set(eng.table.snapshot_table()["url"].to_pylist())
    for u, t in tags.items():
        assert (u in live) == (t != "removed")


def test_epoch_diff_reconstructs_target_state(ray_session, tmp_path):
    """Invariant: applying diff(a, b) to snapshot(a) — drop 'removed'
    keys, upsert 'added'/'changed' rows — reproduces snapshot(b)
    bit-for-bit, across several epochs of a randomized lake."""
    import numpy as np
    import ray.data

    rng = np.random.RandomState(11)
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=8)
    urls = [f"https://r/{i:03d}" for i in range(60)]
    off = 0
    for epoch in range(4):
        n = 30
        pick = rng.choice(len(urls), size=n, replace=False)
        ops = ["delete" if (epoch > 0 and rng.rand() < 0.2) else "upsert"
               for _ in range(n)]
        cols = {
            "url": pa.array([urls[i] for i in pick]),
            "warc_ts": pa.array([1_000_000 * (epoch + 1) + i
                                 for i in range(n)],
                                pa.int64()).cast(pa.timestamp("us")),
            "html": pa.array([None if ops[i] == "delete"
                              else f"<p>{epoch}-{i}</p>".encode()
                              for i in range(n)], pa.large_binary()),
            "lang": pa.array(["en"] * n, pa.string()),
            "offset": pa.array([off + i for i in range(n)], pa.int64()),
            "_op": pa.array(ops, pa.string()),
        }
        eng.apply_epoch(ray.data.from_arrow(pa.table(cols)), epoch=epoch,
                        offset_range=(off, off + n - 1))
        off += n

    def state(epoch):
        t = eng.table.snapshot_table(epoch=epoch)
        return {u: h for u, h in zip(t["url"].to_pylist(),
                                     t["content_hash"].to_pylist())}

    for a, b in [(0, 1), (0, 3), (1, 3), (2, 2)]:
        sa, sb = state(a), state(b)
        rows = pa.Table.from_pylist(
            eng.table.epoch_diff_dataset(a, b).take_all())
        rebuilt = dict(sa)
        if rows.num_rows:
            for u, h, ch in zip(rows["url"].to_pylist(),
                                rows["content_hash"].to_pylist(),
                                rows["_change"].to_pylist()):
                if ch == "removed":
                    assert rebuilt.pop(u, None) is not None
                else:
                    if ch == "added":
                        assert u not in rebuilt
                    else:
                        assert u in rebuilt and rebuilt[u] != h
                    rebuilt[u] = h
        assert rebuilt == sb, f"diff({a},{b}) does not reconstruct"


# -- review: doc_freq null-id precondition + empty-corpus shapes -------------

def _write_docs(path, rows):
    pq.write_table(pa.Table.from_pylist(rows, schema=pa.schema(
        [("doc_id", pa.string()), ("lang", pa.string()),
         ("text", pa.string())])), os.path.join(path, "documents.parquet"))


def test_doc_freq_allows_null_doc_ids(ray_session, tmp_path):
    """NULL doc_ids are filtered by partial() and the oracle alike — they
    must not trip the uniqueness precondition (review finding r5c #1)."""
    from geomesa_nifi_ray.pipelines.queries import q_doc_freq_documents
    d = str(tmp_path)
    _write_docs(d, [
        {"doc_id": "a", "lang": "en", "text": "x y"},
        {"doc_id": "b", "lang": "en", "text": "x"},
        {"doc_id": None, "lang": "en", "text": "x z"},
        {"doc_id": None, "lang": "en", "text": "z"},
    ])
    top = q_doc_freq_documents(d)
    got = dict(zip(top["token"], top["df"]))
    assert got == {"x": 2, "y": 1}  # null-id rows contribute nothing
    # but N for IDF is the full row count (matches the SQL oracle)
    import numpy as np
    x = top[top["token"] == "x"].iloc[0]
    assert x["idf"] == np.round(np.log(4 / 2), 6)


def test_doc_freq_still_rejects_real_duplicates(ray_session, tmp_path):
    from geomesa_nifi_ray.pipelines.queries import q_doc_freq_documents
    d = str(tmp_path)
    _write_docs(d, [
        {"doc_id": "a", "lang": "en", "text": "x"},
        {"doc_id": "a", "lang": "en", "text": "y"},
    ])
    with pytest.raises(ValueError, match="unique doc_id"):
        q_doc_freq_documents(d)


def test_doc_freq_and_vocab_topk_empty_corpus(ray_session, tmp_path):
    """All-NULL text: both queries return 0 rows with the full oracle
    schema instead of KeyError on the missing agg column (r5c #2)."""
    from geomesa_nifi_ray.pipelines.queries import (
        q_doc_freq_documents, q_vocab_topk_documents)
    d = str(tmp_path)
    _write_docs(d, [{"doc_id": "a", "lang": "en", "text": None},
                    {"doc_id": "b", "lang": None, "text": None}])
    df = q_doc_freq_documents(d)
    assert len(df) == 0 and list(df.columns) == ["token", "df", "idf"]
    vt = q_vocab_topk_documents(d)
    assert len(vt) == 0 and list(vt.columns) == ["lang", "token", "cnt",
                                                 "rank"]


def test_engine_init_upgrades_legacy_fingerprint(ray_session, tmp_path):
    """The WRITER-side legacy-fingerprint upgrade is wired through
    CDCEngine.__init__ (engine.py:1039), not only reachable by calling
    LakeTable.upgrade_fingerprint_if_legacy() by hand (r5d review #2):
    opening an actively-written legacy lake with the engine must rewrite
    the utf8-only stamp to the two-part probe on disk."""
    import glob
    import json

    from geomesa_nifi_ray.hashing import kernel_fingerprint

    fp = kernel_fingerprint("xx64")
    root = str(tmp_path / "lake")
    CDCEngine(root, num_buckets=2, content_hash_kernel="xx64")
    (meta_path,) = glob.glob(os.path.join(root, "pages", "*.json"))
    meta = json.load(open(meta_path))
    assert meta["content_hash_fingerprint"] == fp
    meta["content_hash_fingerprint"] = fp.split(":")[0]  # legacy v1 stamp
    json.dump(meta, open(meta_path, "w"))

    eng = CDCEngine(root, num_buckets=2, content_hash_kernel="xx64")
    assert json.load(open(meta_path))["content_hash_fingerprint"] == fp
    assert eng.table.meta["content_hash_fingerprint"] == fp


def test_cli_diff_rejects_unknown_epoch(ray_session, tmp_path):
    """epoch_diff_dataset names the diffable epochs instead of crashing
    with a raw FileNotFoundError when asked for an epoch that has no
    manifest — the catch-up range-manifest / vacuumed / typo'd cases
    (r5d review #1)."""
    from geomesa_nifi_ray.lake import LakeTable

    CDCEngine(str(tmp_path / "lake"), num_buckets=2)
    t = LakeTable.load(str(tmp_path / "lake"), "pages")
    with pytest.raises(ValueError, match="diffable epochs"):
        t.epoch_diff_dataset(0, 7)
