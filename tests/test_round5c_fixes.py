"""Round-5 path-review fixes for lake.py:

1. ``read_parquet_pruned`` must index row-group statistics by parquet
   LEAF path, not arrow-schema position — with any nested column ordered
   before the key, position-indexing reads a foreign leaf's [min, max]
   and silently prunes row groups that hold live keys.
2. The snapshot chain scan ships each task its own chain file list via
   the control table (no O(P x files) closure capture) and reuses the
   shared tombstone-aware ``read_chain_tables`` projection.
"""

import pyarrow as pa
import pyarrow.parquet as pq

from geomesa_nifi_ray.lake import LakeFS


def _nested_first_file(tmp_path, groups: int = 10, rows_per: int = 10):
    n = groups * rows_per
    t = pa.table({
        # struct expands to TWO parquet leaves before the key column
        "meta": pa.array([{"a": i, "b": str(i)} for i in range(n)]),
        "url": pa.array([f"k{i:03d}" for i in range(n)]),
        "v": pa.array(range(n)),
    })
    path = str(tmp_path / "nested_first.parquet")
    pq.write_table(t, path, row_group_size=rows_per,
                   write_statistics=True)
    return path, n


def test_pruned_read_survives_nested_column_before_key(tmp_path):
    """A live key in the LAST row group must never be pruned away just
    because a struct column precedes the key in the schema."""
    path, n = _nested_first_file(tmp_path)
    fs = LakeFS()
    got, total, kept = fs.read_parquet_pruned(path, None, "url", ["k095"])
    assert total == 10
    assert "k095" in got["url"].to_pylist()
    # and the skip machinery still prunes: a one-key probe needs one group
    assert kept < total


def test_pruned_read_nested_matches_exact_for_key_sweep(tmp_path):
    """Soundness sweep over every row group boundary of the nested-first
    layout: the pruned read always contains the probed keys."""
    path, n = _nested_first_file(tmp_path)
    fs = LakeFS()
    for probe in (["k000"], ["k009", "k010"], ["k050"], ["k099"],
                  ["k000", "k099"]):
        got, total, kept = fs.read_parquet_pruned(path, ["url"], "url",
                                                  sorted(probe))
        urls = set(got["url"].to_pylist())
        assert set(probe) <= urls, probe
        assert kept <= total


def test_snapshot_chain_scan_control_table_carries_files(ray_session,
                                                         tmp_path):
    """The delta-path snapshot reader's control dataset rows carry the
    chain file lists themselves (sliced shipping), and the scan still
    merges chains correctly after the refactor."""
    import ray.data

    from geomesa_nifi_ray.engine import CDCEngine

    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=4)

    def ep(epoch, urls, ts0, off0, ops=None):
        n = len(urls)
        t = pa.table({
            "url": pa.array(urls),
            "warc_ts": pa.array([ts0 + i for i in range(n)],
                                pa.int64()).cast(pa.timestamp("us")),
            "html": pa.array([b"<p>x</p>"] * n, pa.large_binary()),
            "lang": pa.array(["en"] * n),
            "offset": pa.array(range(off0, off0 + n), pa.int64()),
            **({"_op": pa.array(ops)} if ops else {}),
        })
        eng.apply_epoch(ray.data.from_arrow(t), epoch=epoch,
                        offset_range=(off0, off0 + n - 1))

    urls = [f"https://c/{i}" for i in range(12)]
    ep(0, urls, 1_000_000, 0)
    ep(1, [urls[3]], 2_000_000, 100)            # delta chain on one bucket
    ep(2, [urls[4]], 3_000_000, 200, ops=["delete"])
    snap = eng.table.snapshot_table()
    ds = eng.table.snapshot_dataset()
    got = sorted(r["url"] for r in ds.take_all())
    assert got == sorted(snap["url"].to_pylist())
    assert f"https://c/4" not in got  # tombstone-aware merge held
