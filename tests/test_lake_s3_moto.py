"""The object-store commit mode against a REAL S3 API (round-4 verdict
item #5): a moto S3 server through the same ``LakeFS`` seam the simulated
no-rename filesystem exercises. This is the reference's MinIO/S3
integration tier (``PutGeoMesaFsTest.scala:60-103``) — skipped
automatically when moto/boto3 are absent.

The LakeFS backend is :mod:`geomesa_nifi_ray.s3boto` (botocore speaking
the S3 REST API behind a ``pyarrow.fs`` handler) rather than arrow's C++
S3FileSystem, because the C++ client rejects moto's
``CompleteMultipartUpload`` response ("error embedded in a 200 OK") —
see the module docstring. What this adds over
``testing.object_store_sim_fs``: real HTTP PUT/GET/LIST/DELETE wire
semantics (no rename primitive at all, virtual directories, single-PUT
publish as the linearization point) from BOTH the driver and Ray worker
processes — the pickled handler must reconnect to the endpoint inside
merge/read tasks.
"""

import glob
import os

import pytest

boto3 = pytest.importorskip("boto3")
pytest.importorskip("moto")

from geomesa_nifi_ray.engine import CDCEngine  # noqa: E402
from geomesa_nifi_ray.lake import LakeFS, LakeTable  # noqa: E402
from geomesa_nifi_ray.s3boto import boto_s3_lakefs  # noqa: E402
from geomesa_nifi_ray.synth import BinlogSpec, write_binlog  # noqa: E402

SPEC = BinlogSpec(num_events=1200, num_urls=240, num_epochs=3, seed=77)


@pytest.fixture(scope="module")
def s3_server():
    from moto.server import ThreadedMotoServer

    server = ThreadedMotoServer(ip_address="127.0.0.1", port=0, verbose=False)
    server.start()
    host, port = server.get_host_and_port()
    endpoint = f"http://{host}:{port}"
    client = boto3.client(
        "s3", endpoint_url=endpoint, region_name="us-east-1",
        aws_access_key_id="testing", aws_secret_access_key="testing")
    client.create_bucket(Bucket="lake")
    yield endpoint
    server.stop()


def _s3_lakefs(endpoint: str) -> LakeFS:
    # S3 has no rename: LakeFS must take the single-PUT publish path
    return boto_s3_lakefs(endpoint)


@pytest.fixture()
def binlog(tmp_path):
    return write_binlog(str(tmp_path / "binlog"), SPEC)


def test_s3_replay_matches_local_and_no_tmp_objects(
        ray_session, s3_server, binlog, tmp_path):
    fs = _s3_lakefs(s3_server)
    eng = CDCEngine("lake/t1", num_buckets=8, lake_fs=fs)
    eng.replay_binlog(binlog)
    assert eng.table.committed_epoch() == 2

    ref = CDCEngine(str(tmp_path / "lake_ref"), num_buckets=8)
    ref.replay_binlog(binlog)
    assert eng.table.snapshot_table().equals(ref.table.snapshot_table())

    # distributed snapshot: worker tasks re-open the S3 filesystem
    assert eng.snapshot().count() == ref.table.snapshot_table().num_rows

    # the no-rename publish never writes tmp objects (PUT is the publish)
    client = boto3.client(
        "s3", endpoint_url=s3_server, region_name="us-east-1",
        aws_access_key_id="testing", aws_secret_access_key="testing")
    keys = [o["Key"] for o in
            client.list_objects_v2(Bucket="lake", Prefix="t1/").get(
                "Contents", [])]
    assert keys and not [k for k in keys if ".tmp." in k]


def test_s3_mid_epoch_crash_resume_bit_identity(
        ray_session, s3_server, binlog, tmp_path):
    """The S3 'manifest object never appeared' crash: bucket files of the
    last epoch exist, its manifest does not. Resume must replay that epoch
    to a bit-identical lake."""
    fs = _s3_lakefs(s3_server)
    eng = CDCEngine("lake/t2", num_buckets=8, lake_fs=fs)
    eng.replay_binlog(binlog, catchup=False)
    want = eng.table.snapshot_table()
    want_digests = {b: e["digest"] for b, e in
                    eng.table.manifest(2)["buckets"].items()}

    client = boto3.client(
        "s3", endpoint_url=s3_server, region_name="us-east-1",
        aws_access_key_id="testing", aws_secret_access_key="testing")
    client.delete_object(Bucket="lake", Key="t2/pages/_log/epoch-00002.json")

    eng2 = CDCEngine("lake/t2", num_buckets=8, lake_fs=_s3_lakefs(s3_server))
    assert eng2.table.committed_epoch() == 1
    eng2.replay_binlog(binlog, catchup=False)
    assert eng2.table.committed_epoch() == 2
    assert eng2.table.snapshot_table().equals(want)
    assert {b: e["digest"] for b, e in
            eng2.table.manifest(2)["buckets"].items()} == want_digests


def test_s3_vacuum_and_table_reload(ray_session, s3_server, binlog):
    fs = _s3_lakefs(s3_server)
    eng = CDCEngine("lake/t3", num_buckets=8, max_deltas=1, lake_fs=fs)
    eng.replay_binlog(binlog, catchup=False)
    want = eng.table.snapshot_table()
    deleted = eng.table.vacuum(retain_epochs=1)
    assert deleted
    t = LakeTable.load("lake/t3", "pages", fs=_s3_lakefs(s3_server))
    assert t.snapshot_table().equals(want)


def test_s3_conditional_put_split_brain_fence(ray_session, s3_server, binlog):
    """Manifest commits on S3 are fenced with If-None-Match: a second
    writer racing the same epoch is a no-op when its manifest is
    byte-identical (idempotent replay) and a loud SchemaError when it
    diverged (split brain) — never a silent overwrite."""
    from geomesa_nifi_ray.lake import SchemaError

    fs = _s3_lakefs(s3_server)
    eng = CDCEngine("lake/t4", num_buckets=8, lake_fs=fs)
    eng.replay_binlog(binlog, catchup=False)
    t = eng.table
    m = t.manifest(2)
    assert t.committed_epoch() == 2

    # identical-content recommit (a crashed driver's retry): benign no-op
    t.commit_epoch(t.manifest(2) | {})  # epoch < expected -> early return

    # a DIVERGED writer at the next epoch number: first commit wins, the
    # second must fail loudly
    nxt = dict(m, epoch=3, epochs_covered=[3, 3], rows_in=1)
    t.commit_epoch(nxt)
    diverged = dict(m, epoch=3, epochs_covered=[3, 3], rows_in=999)
    # bypass the cursor early-return (simulates a stale second driver
    # that read committed_epoch() == 2 before the first one's commit)
    with pytest.raises((SchemaError, FileExistsError)):
        fs_path = t._log_path(3)
        try:
            fs.publish_json(fs_path, diverged, if_absent=True)
        except FileExistsError:
            raise SchemaError("fenced")
    # identical replay of the SAME epoch-3 manifest through the fence:
    # commit_epoch swallows it (content equal)
    t2 = type(t).load("lake/t4", "pages", fs=_s3_lakefs(s3_server))
    import json as _json

    same = _json.loads(_json.dumps(nxt, sort_keys=True))
    # force the publish path despite the cursor (what a crashed driver
    # that lost the commit ACK would do on its internal retry)
    try:
        t2.fs.publish_json(t2._log_path(3), same, if_absent=True)
        raced = False
    except FileExistsError:
        raced = True
    assert raced  # the fence reports the existing object
    assert t2.manifest(3)["rows_in"] == 1  # first writer's content stands


def test_s3_sharded_shard_files_are_content_addressed(s3_server, monkeypatch):
    """Round-5 review finding: shard JSONs are content-addressed (digest
    in the name), so a diverged writer racing the SAME epoch writes its
    own shard files and the committed manifest's shard bytes can never be
    shadowed; the racing commit still fails loudly at the fenced manifest
    PUT."""
    import pyarrow as pa

    import geomesa_nifi_ray.lake as lake_mod
    from geomesa_nifi_ray.lake import SchemaError

    monkeypatch.setattr(lake_mod, "MANIFEST_SHARD_THRESHOLD", 4)
    monkeypatch.setattr(lake_mod, "MANIFEST_SHARD_SIZE", 3)

    schema = pa.schema([pa.field("url", pa.string()),
                        pa.field("warc_ts", pa.timestamp("us")),
                        pa.field("offset", pa.int64()),
                        pa.field("content_hash", pa.string())])

    def mk(rows: int) -> dict:
        return {
            "epoch": 0, "epochs_covered": [0, 0],
            "offset_min": 0, "offset_max": 9, "rows_in": rows,
            "buckets": {str(b): {"file": f"data/bucket={b:05d}/epoch-00000.parquet",
                                 "rows": rows, "digest": f"d{rows}"}
                        for b in range(8)},
        }

    t = LakeTable.create("lake/shardfence", "pages", schema, num_buckets=8,
                         fs=_s3_lakefs(s3_server))
    t.commit_epoch(mk(5))
    assert "buckets_sharded" in t.fs.read_json(t._log_path(0))

    # writer B raced: its cursor read committed_epoch() == None BEFORE A's
    # commit landed, and its epoch-0 content diverged
    t2 = LakeTable.load("lake/shardfence", "pages", fs=_s3_lakefs(s3_server))
    t2.committed_epoch = lambda: None  # the stale pre-commit view
    with pytest.raises(SchemaError, match="split-brain"):
        t2.commit_epoch(mk(999))
    # A's shard content is INTACT (the corruption content-addressing
    # closes): the loser wrote different shard NAMES, never A's bytes
    assert all(e["rows"] == 5 for e in t.manifest(0)["buckets"].values())

    # the same stale writer replaying IDENTICAL content is benign
    t2.commit_epoch(mk(5))
    assert all(e["rows"] == 5 for e in t.manifest(0)["buckets"].values())

    # crash-replay whose RE-FORMED epoch content legally differs (bus
    # sources grow trailing batches): orphan shards from the crashed
    # attempt must not wedge the commit (the old shard-level fence
    # false-positived here as split-brain)
    t3 = LakeTable.create("lake/shardreform", "pages", schema, num_buckets=8,
                          fs=_s3_lakefs(s3_server))
    # simulate the crashed first attempt: its shards land (under their own
    # content digests), the manifest never does
    import os as _os

    t3.fs.publish_json(
        _os.path.join(t3.table_dir, "_log", "shards-00000-0000-deadbeef0123.json"),
        {"epoch": 0, "shard": 0, "buckets": dict(list(mk(3)["buckets"].items())[:3])})
    t3.commit_epoch(mk(7))  # the re-formed (different) epoch commits fine
    assert all(e["rows"] == 7 for e in t3.manifest(0)["buckets"].values())
    # vacuum sweeps the unreferenced orphan shard JSONs
    removed = t3.vacuum(retain_epochs=2)
    assert any("shards-" in p for p in removed)
    assert all(e["rows"] == 7 for e in t3.manifest(0)["buckets"].values())


def test_s3_lookup_and_bulk_delete(ray_session, s3_server, binlog, tmp_path):
    """Round-5 additions over a REAL S3 lake: ``lookup_keys`` point probes
    must resolve LWW/tombstones through the boto handler's pruned reads
    (row-group skipping over HTTP range-less GETs), and ``delete_keys`` /
    ``delete_where`` maintenance epochs must leave the S3 lake bit-equal
    to a local lake applying the same operations."""
    import pyarrow as pa
    import pyarrow.compute as pc

    fs = _s3_lakefs(s3_server)
    eng = CDCEngine("lake/t5", num_buckets=8, lake_fs=fs)
    eng.replay_binlog(binlog)
    ref = CDCEngine(str(tmp_path / "lake_ref5"), num_buckets=8)
    ref.replay_binlog(binlog)

    snap = ref.table.snapshot_table()
    urls = sorted(snap["url"].to_pylist())
    probe = urls[:5] + ["https://never/absent"]
    hit = eng.table.lookup_keys(probe)
    want = snap.filter(pc.is_in(snap["url"], value_set=pa.array(probe)))
    assert sorted(hit["url"].to_pylist()) == sorted(want["url"].to_pylist())
    key_of = {r["url"]: r for r in want.to_pylist()}
    for row in hit.to_pylist():
        assert row == key_of[row["url"]]

    # keyed bulk delete: S3 lake == local lake after the same epoch
    victims = urls[:3] + ["https://never/absent"]  # absent key is a no-op
    r_s3 = eng.delete_keys(victims)
    r_loc = ref.delete_keys(victims)
    assert r_s3.epoch == r_loc.epoch
    assert eng.table.snapshot_table().equals(ref.table.snapshot_table())
    assert eng.table.lookup_keys(victims).num_rows == 0
    # maintenance epoch advances no offsets: the tail cursor skips it
    assert int(eng.table.manifest(r_s3.epoch)["offset_min"]) == -1

    # predicate scan-delete: same equivalence
    def pred(batch: pa.Table) -> pa.ChunkedArray:
        return pc.equal(batch["lang"], "de")

    eng.delete_where(pred, columns=["lang"])
    ref.delete_where(pred, columns=["lang"])
    final_s3 = eng.table.snapshot_table()
    assert final_s3.equals(ref.table.snapshot_table())
    assert final_s3.filter(
        pc.fill_null(pc.equal(final_s3["lang"], "de"), False)).num_rows == 0
    # time-travel lookup still sees a pre-delete victim at the old epoch
    old = eng.table.lookup_keys(victims[:1], epoch=2)
    assert old.num_rows == want.filter(
        pc.equal(want["url"], victims[0])).num_rows


def test_s3_delete_dir_paginates_past_1000_objects(s3_server):
    """Round-5 review finding: delete_dir must paginate list_objects_v2 —
    an unpaginated pass silently leaves everything past the first 1000
    keys behind."""
    from geomesa_nifi_ray.s3boto import BotoS3Handler

    client = boto3.client(
        "s3", endpoint_url=s3_server, region_name="us-east-1",
        aws_access_key_id="testing", aws_secret_access_key="testing")
    for i in range(1050):
        client.put_object(Bucket="lake", Key=f"deltest/o{i:04d}", Body=b"x")
    h = BotoS3Handler(s3_server)
    h.delete_dir("lake/deltest")
    r = client.list_objects_v2(Bucket="lake", Prefix="deltest/")
    assert r.get("KeyCount", 0) == 0 and "Contents" not in r
