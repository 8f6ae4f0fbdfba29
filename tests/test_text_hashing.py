"""Text-extraction kernel determinism + content-hash/bucket stability."""

import hashlib
import subprocess
import sys

import numpy as np
import pyarrow as pa

from geomesa_nifi_ray.hashing import add_hash_and_bucket, bucket_ids, content_hash_rows
from geomesa_nifi_ray.text import (
    bpe_token_count,
    extract_text,
    extract_text_batch,
    rolling_fingerprint,
    whitespace_token_count,
)


def test_extract_basic():
    html = b"<html><head><title>T</title></head><body><p>hello  world</p><p>two</p></body></html>"
    assert extract_text(html) == "T\nhello world\ntwo"


def test_extract_strips_script_style_comments():
    html = (b"<html><head><script>var x = '<p>no</p>';</script>"
            b"<style>p{color:red}</style></head>"
            b"<body><!-- hidden --><p>kept</p></body></html>")
    assert extract_text(html) == "kept"


def test_extract_entities_unescaped():
    assert extract_text(b"<p>a &amp; b &lt;tag&gt;</p>") == "a & b <tag>"


def test_extract_null_and_garbage():
    assert extract_text(None) is None
    assert extract_text(b"\xff\xfe garbage < not a tag") is not None  # total, no raise


def test_extract_batch_matches_scalar():
    rows = [b"<p>one</p>", None, b"<b>two</b> three"]
    col = pa.array(rows, type=pa.large_binary())
    out = extract_text_batch(col).to_pylist()
    assert out == [extract_text(r) for r in rows]


def test_extract_deterministic_across_processes():
    """The per-row invariant: byte-identical text for the same html in a
    fresh interpreter (no PYTHONHASHSEED / locale dependence)."""
    code = (
        "import sys; sys.path.insert(0, '/root/repo');"
        "from geomesa_nifi_ray.text import extract_text;"
        "import hashlib;"
        "h = extract_text(b'<p>a &amp; b</p><script>x</script><p>c  d</p>');"
        "print(hashlib.md5(h.encode()).hexdigest())"
    )
    outs = {
        subprocess.run([sys.executable, "-c", code], capture_output=True, text=True).stdout
        for _ in range(2)
    }
    assert len(outs) == 1
    local = extract_text(b"<p>a &amp; b</p><script>x</script><p>c  d</p>")
    assert hashlib.md5(local.encode()).hexdigest() == outs.pop().strip()


def test_content_hash_matches_duckdb_md5():
    import duckdb

    urls = ["https://a/1", "https://b/2"]
    ts = np.array([1_600_000_000_000_000, 1_600_000_000_000_001])
    texts = ["hello", "wörld"]
    langs = ["en", "de"]
    ours = content_hash_rows(urls, ts, texts, langs)
    con = duckdb.connect()
    for i in range(2):
        (theirs,) = con.execute(
            "SELECT md5(? || chr(31) || CAST(? AS VARCHAR) || chr(31) || ? || chr(31) || ?)",
            [urls[i], int(ts[i]), texts[i], langs[i]],
        ).fetchone()
        assert ours[i] == theirs


def test_bucket_stable_and_in_range():
    urls = [f"https://host{i % 7}/p/{i}" for i in range(1000)]
    b1 = bucket_ids(urls, 64)
    b2 = bucket_ids(urls, 64)
    assert (b1 == b2).all()
    assert b1.min() >= 0 and b1.max() < 64
    assert len(np.unique(b1)) > 32  # spreads


def test_add_hash_and_bucket_columns():
    t = pa.table(
        {
            "url": ["u1", "u2"],
            "warc_ts": pa.array([1, 2], type=pa.int64()).cast(pa.timestamp("us")),
            "text": ["a", None],
            "lang": ["en", None],
        }
    )
    out = add_hash_and_bucket(t, 16)
    assert out["content_hash"].null_count == 0
    assert out["bucket"].type == pa.int32()


def test_token_counts_and_fingerprint():
    assert whitespace_token_count("a  b\nc") == 3
    assert whitespace_token_count(None) is None
    assert bpe_token_count("don't stop2") == 5  # don / ' / t / stop / 2
    f1 = rolling_fingerprint("some document text here")
    f2 = rolling_fingerprint("some document text here")
    assert f1 == f2 and isinstance(f1, int)
    assert rolling_fingerprint("x") == rolling_fingerprint("x")


def test_normalize_urls_rule_and_sql_parity():
    """normalize_urls: fragment strip, bare-? strip, lowercased
    scheme+authority only (path/query case preserved); schemeless rows
    get rules 1-2; nulls propagate. Value-parity with the ACTUAL
    ``_CDC_URL_NORM_SQL`` the ``cdc_url_normalized`` oracle renders
    (imported, not hand-copied, so the test cannot de-sync from the
    production SQL), on both string and large_string inputs."""
    import duckdb

    from geomesa_nifi_ray.pipelines.queries import _CDC_URL_NORM_SQL
    from geomesa_nifi_ray.text import normalize_urls

    urls = [
        "https://Host.Example.COM/Path/Page?q=1#frag",
        "HTTP://EXAMPLE.com:8080/A?",
        "https://h/x#a#b",
        "ftp://Mixed.Case/Z?keep=Case",
        "no-scheme/Path?#f",
        "relative#only-frag",
        None,
        "https://h/",
        "https://H?",
        "a+b-c.d://HOST/Q",
        "https://TOKEN@Api.Example.COM/x",  # userinfo lowered too (documented)
        "https://h/p??",                    # trailing-? RUN strips in one pass
    ]
    got = normalize_urls(pa.array(urls, pa.string())).to_pylist()
    assert got[0] == "https://host.example.com/Path/Page?q=1"
    assert got[3] == "ftp://mixed.case/Z?keep=Case"   # path case kept
    assert got[4] == "no-scheme/Path" and got[6] is None
    assert got[10] == "https://token@api.example.com/x"
    # large_string input (Ray Data promotes big blocks): same values
    got_large = normalize_urls(pa.array(urls, pa.large_string())).to_pylist()
    assert got_large == got
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " + ",".join(
        "(NULL)" if u is None else f"('{u}')" for u in urls) + ") v(u)")
    sql = _CDC_URL_NORM_SQL.replace("SNAPSHOT_SQL", "SELECT u AS url FROM t")
    want = [r[1] for r in con.execute(sql).fetchall()]
    assert got == want
