"""Deterministic synth generator properties (FIXTURES.md F1)."""

import pyarrow as pa

from geomesa_nifi_ray.synth import BinlogSpec, synth_change_events, write_binlog
from geomesa_nifi_ray.text import extract_text

SPEC = BinlogSpec(num_events=2000, num_urls=400, num_epochs=4, seed=42)


def test_deterministic():
    t1 = synth_change_events(SPEC)
    t2 = synth_change_events(SPEC)
    assert t1.equals(t2)


def test_schema_and_monotonic_offsets():
    t = synth_change_events(SPEC)
    assert t.column_names == ["offset", "url", "warc_ts", "html", "text", "lang"]
    assert t["html"].type == pa.large_binary()
    offs = t["offset"].to_pylist()
    assert offs == list(range(len(offs)))


def test_text_is_kernel_output():
    t = synth_change_events(BinlogSpec(num_events=100, num_urls=30, num_epochs=1))
    for html, text in zip(t["html"].to_pylist()[:50], t["text"].to_pylist()[:50]):
        if html is None:
            assert text is None
        else:
            assert extract_text(html) == text


def test_duplicates_ties_and_nulls_present():
    t = synth_change_events(SPEC)
    urls = t["url"].to_pylist()
    assert len(set(urls)) < len(urls)  # duplicate urls (versions)
    assert t["html"].null_count > 0    # dead-letter rows
    # ties: at least one url with two identical warc_ts values
    import collections

    seen = collections.Counter(zip(urls, t["warc_ts"].to_pylist()))
    assert any(v > 1 for v in seen.values())


def test_write_binlog_idempotent(tmp_path):
    d = str(tmp_path / "binlog")
    m1 = write_binlog(d, SPEC)
    m2 = write_binlog(d, SPEC)  # cached, no rewrite
    assert m1 == m2
    assert len(m1["epochs"]) == 4
    assert sum(e["rows"] for e in m1["epochs"]) == 2000


def test_extra_column_epochs(tmp_path):
    spec = BinlogSpec(num_events=200, num_urls=50, num_epochs=2, extra_column_from_epoch=1)
    m = write_binlog(str(tmp_path / "b2"), spec)
    import pyarrow.parquet as pq

    s0 = pq.read_schema(m["epochs"][0]["files"][0])
    s1 = pq.read_schema(m["epochs"][1]["files"][0])
    assert "content_type" not in s0.names
    assert "content_type" in s1.names


def test_parallel_serial_identical(tmp_path, ray_session):
    spec = BinlogSpec(num_events=1000, num_urls=200, num_epochs=2)
    m_ser = write_binlog(str(tmp_path / "ser"), spec, parallel=False)
    m_par = write_binlog(str(tmp_path / "par"), spec, parallel=True)
    for es, ep in zip(m_ser["epochs"], m_par["epochs"]):
        for fs, fp in zip(es["files"], ep["files"]):
            assert open(fs, "rb").read() == open(fp, "rb").read()
