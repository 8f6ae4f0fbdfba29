"""GroupSumView: incremental SUM(kernel(value)) GROUP BY — same delta
machinery as the count view, value column projected into the +new/-old
reads. Invariant: incremental == full recompute after every epoch,
including updates that change the value, deletes, tombstone re-upserts
and null values."""

import pyarrow as pa

from geomesa_nifi_ray.engine import CDCEngine


def _sum_text_chars_of(snap):
    out = {}
    for lang, text in zip(snap["lang"].to_pylist(), snap["text"].to_pylist()):
        if lang is None:
            continue
        out[lang] = out.get(lang, 0) + (len(text) if text is not None else 0)
    return {k: v for k, v in out.items() if v}


def _epoch(eng, epoch, urls, htmls, langs, ts0, off0, ops=None):
    import ray.data

    n = len(urls)
    t = {
        "url": pa.array(urls),
        "warc_ts": pa.array([ts0 + i for i in range(n)],
                            pa.int64()).cast(pa.timestamp("us")),
        "html": pa.array(htmls, pa.large_binary()),
        "lang": pa.array(langs, pa.string()),
        "offset": pa.array([off0 + i for i in range(n)], pa.int64()),
    }
    if ops:
        t["_op"] = pa.array(ops, pa.string())
    eng.apply_epoch(ray.data.from_arrow(pa.table(t)), epoch=epoch,
                    offset_range=(off0, off0 + n - 1))


def test_sum_view_tracks_updates_and_deletes(ray_session, tmp_path):
    from geomesa_nifi_ray.derived import GroupSumView

    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=2)
    view = GroupSumView(eng.table, str(tmp_path / "views"),
                        group_col="lang", value_col="text",
                        value_kernel="utf8_length")

    _epoch(eng, 0,
           [f"https://s/{i}" for i in range(6)],
           [b"<p>aa</p>", b"<p>bbbb</p>", b"<p>c</p>",
            b"<p>dddddd</p>", b"<p>ee</p>", b"<p>fff</p>"],
           ["en", "en", "de", "de", "fr", "fr"], 1_000_000, 0)
    assert view.refresh() == 1
    assert view.counts() == _sum_text_chars_of(eng.table.snapshot_table())

    # update: same key, longer text AND a group flip (both deltas at once)
    _epoch(eng, 1, ["https://s/2"], [b"<p>now much longer text</p>"],
           ["en"], 2_000_000, 10)
    view.refresh()
    assert view.counts() == _sum_text_chars_of(eng.table.snapshot_table())

    # delete one fr key: its chars leave the fr sum
    _epoch(eng, 2, ["https://s/4"], [None], [None], 3_000_000, 20,
           ops=["delete"])
    view.refresh()
    expect = _sum_text_chars_of(eng.table.snapshot_table())
    assert view.counts() == expect

    # incremental == from-scratch rebuild
    view2 = GroupSumView(eng.table, str(tmp_path / "views2"),
                         group_col="lang", value_col="text",
                         value_kernel="utf8_length")
    view2.rebuild()
    assert view2.counts() == view.counts()

    # truncate resets; sums resume after
    eng.truncate()
    assert view.refresh() == 1
    assert view.counts() == {}
    _epoch(eng, 4, ["https://s/9"], [b"<p>zz</p>"], ["ru"], 4_000_000, 30)
    view.refresh()
    assert view.counts() == _sum_text_chars_of(eng.table.snapshot_table())


def test_sum_view_rejects_unknown_kernel(tmp_path):
    import pytest

    from geomesa_nifi_ray.derived import GroupSumView

    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=2)
    with pytest.raises(ValueError, match="value_kernel"):
        GroupSumView(eng.table, str(tmp_path / "views"),
                     value_kernel="nope")


def test_sum_view_sparse_zero_total_group(ray_session, tmp_path):
    """A group whose every winner has EMPTY text sums to 0 and is not
    materialized (sparse-state contract; the SQL oracle mirrors it with
    HAVING sum > 0)."""
    from geomesa_nifi_ray.derived import GroupSumView

    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=2)
    view = GroupSumView(eng.table, str(tmp_path / "views"),
                        group_col="lang", value_col="text",
                        value_kernel="utf8_length")
    # html with no text content -> extracted text is "" (length 0)
    _epoch(eng, 0, ["https://s/0", "https://s/1"],
           [b"<br>", b"<p>hello</p>"], ["xx", "en"], 1_000_000, 0)
    view.refresh()
    assert "xx" not in view.counts()
    assert view.counts().get("en", 0) > 0
    # and rebuild agrees (same sparse rule end-to-end)
    view2 = GroupSumView(eng.table, str(tmp_path / "views2"),
                         group_col="lang", value_col="text",
                         value_kernel="utf8_length")
    view2.rebuild()
    assert view2.counts() == view.counts()
