"""Round-5e regression tests (review findings on the 5d hardening batch).

1. Multi-part epochs: a ``_mode`` column in ANY part — not just part 0's
   footer — vetoes the late exchange (keys-only winner collapse would
   drop the older upsert row an update directive must coalesce onto).
2. Null values in SECONDARY order columns survive the delta-merge join on
   BOTH sides even when every epoch key already exists (the old fill was
   gated on ``not have.all()`` and only applied to the ``_cur`` side, so
   str-vs-None raised TypeError inside the bucket-merge task), and the
   verdict matches the full-merge ``_order_arrays`` rule: null loses to
   every real value.
3. The pages convert kernel normalizes ``warc_ts`` even when a custom
   ``order=`` leaves it out — the validity check reads it unconditionally
   (contract event time), so a producer omitting the column dead-letters
   instead of KeyError-ing the Ray task.
4. ``_fill_order_lose`` unit coverage for the numeric / datetime branches.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from geomesa_nifi_ray.engine import CDCEngine
from geomesa_nifi_ray.upsert import _fill_order_lose


def _pages_table(urls, ts, offs, html=b"<p>x</p>", lang=None):
    n = len(urls)
    cols = {
        "url": pa.array(urls),
        "warc_ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
        "html": pa.array([html] * n, pa.large_binary()),
        "offset": pa.array(offs, pa.int64()),
    }
    if lang is not None:
        cols["lang"] = pa.array(lang, pa.string())
    return pa.table(cols)


# -- 1: _mode in a later part vetoes the late exchange -----------------------

def test_mode_in_later_part_vetoes_late_exchange(ray_session, tmp_path):
    import ray.data

    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=2)
    t0 = _pages_table([f"https://m/{i}" for i in range(4)],
                      [1_000_000 + i for i in range(4)], list(range(4)))
    eng.apply_epoch(ray.data.from_arrow(t0), epoch=0, offset_range=(0, 3))

    part0 = _pages_table(["https://m/0"], [2_000_000], [10])
    part1 = _pages_table(["https://m/1"], [2_000_001], [11]).append_column(
        "_mode", pa.array(["update"], pa.string()))
    p0 = str(tmp_path / "part0.parquet")
    p1 = str(tmp_path / "part1.parquet")
    pq.write_table(part0, p0)
    pq.write_table(part1, p1)

    with pytest.raises(ValueError, match="_mode"):
        eng.apply_epoch([p0, p1], epoch=1, offset_range=(10, 11),
                        exchange="late")
    # rejected BEFORE any side effect
    assert eng.table.committed_epoch() == 0


# -- 2: null secondary string order values in the delta merge ----------------

def test_null_string_order_existing_keys_delta_merge(ray_session, tmp_path):
    """order=('warc_ts','lang'): stored winner u1 has lang=NULL, epoch 1
    touches ONLY existing keys (have.all() is True). The change for u1 ties
    on warc_ts with a real lang -> must WIN (null loses, the _order_arrays
    verdict); the change for u2 is older -> must lose. Crashed with
    TypeError before the two-sided fill."""
    import ray.data

    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=1,
                    order=("warc_ts", "lang"))
    t0 = _pages_table(["https://n/1", "https://n/2"],
                      [1_000_000, 1_000_000], [0, 1],
                      lang=[None, "en"])
    eng.apply_epoch(ray.data.from_arrow(t0), epoch=0, offset_range=(0, 1))

    t1 = _pages_table(["https://n/1", "https://n/2"],
                      [1_000_000, 900_000], [10, 11],
                      lang=["fr", None])
    res = eng.apply_epoch(ray.data.from_arrow(t1), epoch=1,
                          offset_range=(10, 11))
    assert res is not None
    snap = eng.table.snapshot_table()
    got = dict(zip(snap["url"].to_pylist(), snap["offset"].to_pylist()))
    # u1: warc_ts tie, 'fr' beats stored NULL -> updated (offset 10);
    # u2: older warc_ts -> stale change dropped (offset 1 kept)
    assert got == {"https://n/1": 10, "https://n/2": 1}
    langs = dict(zip(snap["url"].to_pylist(), snap["lang"].to_pylist()))
    assert langs["https://n/1"] == "fr" and langs["https://n/2"] == "en"


def test_nullable_order_delta_matches_full_merge(ray_session, tmp_path):
    """Randomized equivalence: with a NULLABLE secondary order column
    (order=('warc_ts','lang'), lang sometimes null) and heavy key/ts
    collisions, the delta path (max_deltas=4) and the full-merge path
    (max_deltas=0) must produce identical snapshots — the two null-order
    verdicts (_order_arrays lexsort vs _fill_order_lose+lex_ge) agree."""
    import random

    import pyarrow.compute as pc
    import ray.data

    rng = random.Random(77)
    epochs = []
    off = 0
    for _ in range(4):
        n = 120
        urls = [f"https://p/{rng.randrange(40)}" for _ in range(n)]
        ts = [1_000_000 + rng.randrange(6) for _ in range(n)]  # force ties
        langs = [rng.choice([None, "aa", "bb"]) for _ in range(n)]
        t = _pages_table(urls, ts, list(range(off, off + n)), lang=langs)
        epochs.append((t, (off, off + n - 1)))
        off += n

    snaps = []
    for label, md in [("delta", 4), ("full", 0)]:
        eng = CDCEngine(str(tmp_path / f"lk_{label}"), num_buckets=4,
                        max_deltas=md, order=("warc_ts", "lang"))
        for i, (t, rng_off) in enumerate(epochs):
            eng.apply_epoch(ray.data.from_arrow(t), epoch=i,
                            offset_range=rng_off)
        snap = eng.table.snapshot_table()
        snaps.append(snap.take(pc.sort_indices(
            snap, sort_keys=[("url", "ascending")])))
    assert snaps[0].equals(snaps[1])


# -- 3: custom-order pages engine, producer omits warc_ts --------------------

def test_pages_custom_order_missing_warc_ts_dead_letters(ray_session,
                                                         tmp_path):
    import ray.data

    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=2,
                    order=("offset",))
    t0 = _pages_table([f"https://w/{i}" for i in range(3)],
                      [1_000_000 + i for i in range(3)], list(range(3)))
    eng.apply_epoch(ray.data.from_arrow(t0), epoch=0, offset_range=(0, 2))

    # no warc_ts column at all: contract event time is still required by
    # the validity check -> rows dead-letter, the task must not KeyError
    bad = pa.table({
        "url": pa.array(["https://w/0", "https://w/9"]),
        "html": pa.array([b"<p>y</p>"] * 2, pa.large_binary()),
        "offset": pa.array([10, 11], pa.int64()),
    })
    res = eng.apply_epoch(ray.data.from_arrow(bad), epoch=1,
                          offset_range=(10, 11))
    assert res.rows_failed == 2 and res.rows_applied == 0
    assert eng.table.snapshot_table().num_rows == 3


# -- catch-up drains compatible groups before a schema error -----------------

@pytest.mark.parametrize("catchup", [True, False])
def test_catchup_commits_compatible_groups_before_schema_error(ray_session,
                                                               tmp_path,
                                                               catchup):
    """A backlog whose LAST epoch carries an unsupported type change: the
    compatible prefix must COMMIT (cursor advances) and the SchemaError
    must surface from the bad epoch's own apply — the serial path's
    behavior — not abort the whole drain with zero progress from an eager
    up-front timeline computation. Covers BOTH the catch-up group path
    and the default pipelined (task-based) path."""
    from geomesa_nifi_ray.schema import SchemaError

    def write_epoch(i, table):
        p = str(tmp_path / f"epoch{i}.parquet")
        pq.write_table(table, p)
        return {"epoch": i, "path": p,
                "offset_min": i * 10, "offset_max": i * 10 + 1}

    good0 = _pages_table(["https://g/0", "https://g/1"],
                         [1_000_000, 1_000_001], [0, 1])
    good1 = _pages_table(["https://g/2", "https://g/0"],
                         [1_000_002, 1_000_003], [10, 11])
    bad = pa.table({
        "url": pa.array(["https://g/9"]),
        "warc_ts": pa.array([9_000_000], pa.int64()).cast(pa.timestamp("us")),
        "html": pa.array([b"<p>x</p>"], pa.large_binary()),
        "offset": pa.array([20], pa.int64()),
        "lang": pa.array([7], pa.int64()),   # retyped column: hard error
    })
    meta = {"epochs": [write_epoch(0, good0), write_epoch(1, good1),
                       write_epoch(2, bad)]}

    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=2)
    with pytest.raises(SchemaError):
        eng.replay_binlog(meta, catchup=catchup)
    assert eng.table.committed_epoch() == 1    # compatible prefix landed
    assert eng.table.snapshot_table().num_rows == 3


@pytest.mark.parametrize("catchup", [True, False])
def test_unreadable_later_epoch_commits_prefix(ray_session, tmp_path,
                                               catchup):
    """A MISSING/unreadable later epoch file must behave like an
    incompatible one: the readable prefix commits and the real I/O error
    surfaces from the broken epoch's own apply — footer reads are lazy,
    never an eager up-front sweep that aborts the drain."""
    def write_epoch(i, table):
        p = str(tmp_path / f"epoch{i}.parquet")
        pq.write_table(table, p)
        return {"epoch": i, "path": p,
                "offset_min": i * 10, "offset_max": i * 10 + 1}

    e0 = write_epoch(0, _pages_table(["https://u/0", "https://u/1"],
                                     [1_000_000, 1_000_001], [0, 1]))
    e1 = write_epoch(1, _pages_table(["https://u/2"], [1_000_002], [10]))
    missing = {"epoch": 2, "path": str(tmp_path / "nope.parquet"),
               "offset_min": 20, "offset_max": 21}

    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=2)
    with pytest.raises(Exception):
        eng.replay_binlog({"epochs": [e0, e1, missing]}, catchup=catchup)
    assert eng.table.committed_epoch() == 1
    assert eng.table.snapshot_table().num_rows == 3


def test_schema_timeline_mark_applied_repairs_planning(tmp_path):
    """_SchemaTimeline: an entry that fails to plan (unreadable footer)
    stops planning; mark_applied() on that index adopts the actual stored
    schema and RESUMES planning for later entries — one transient hiccup
    must not degrade the rest of the drain to the unprefetched path."""
    from geomesa_nifi_ray.engine import PAGE_SCHEMA, _SchemaTimeline
    from geomesa_nifi_ray.schema import CompatibilityMode

    ok = str(tmp_path / "ok.parquet")
    pq.write_table(PAGE_SCHEMA.empty_table(), ok)
    incoming = [PAGE_SCHEMA, str(tmp_path / "missing.parquet"), ok]
    tl = _SchemaTimeline(PAGE_SCHEMA, CompatibilityMode.EXISTING, incoming)
    assert tl.schema_after(0) is not None
    assert tl.schema_after(1) is None          # unreadable: planning stops
    assert tl.schema_after(2) is None          # ... and stays stopped
    tl.mark_applied(0, PAGE_SCHEMA)            # planned entry: no-op
    assert tl.schema_after(1) is None
    tl.mark_applied(1, PAGE_SCHEMA)            # entry 1 applied anyway
    assert tl.schema_after(1) is not None      # adopted
    assert tl.schema_after(2) is not None      # planning resumed


# -- 4: _fill_order_lose dtype branches ---------------------------------------

def test_fill_order_lose_branches():
    # no nulls: pass-through
    out = _fill_order_lose(pd.Series([1, 2], dtype="int64"))
    assert out.dtype == np.int64 and list(out) == [1, 2]
    # numeric with NaN (int upcast by a left join) -> -inf
    out = _fill_order_lose(pd.Series([1.0, np.nan]))
    assert out[1] == -np.inf and out[1] < 0 < out[0] + 1
    # object -> "" (loses to every real string, ties with itself)
    out = _fill_order_lose(pd.Series(["b", None], dtype=object))
    assert out[1] == "" and out[0] > out[1]
    # datetime64 NaT -> Timestamp.min (below every real timestamp)
    s = pd.Series(pd.to_datetime(["2026-01-01", None]))
    out = _fill_order_lose(s)
    assert pd.Timestamp(out[1]) == pd.Timestamp.min and out[1] < out[0]
