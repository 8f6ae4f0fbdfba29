"""Driver-contract check: every queries() entry runs; every oracle_sql()
entry matches on row count + sorted-column values (the driver's compare)."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _to_pandas(result):
    import pyarrow as pa

    try:
        import ray.data

        if isinstance(result, ray.data.Dataset):
            return result.to_pandas()
    except ImportError:
        pass
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_bool_dtype(df[c]) or df[c].dtype == object:
            pass
    df = df.sort_values(by=list(df.columns), kind="stable").reset_index(drop=True)
    # unify integer dtypes
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        if pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
    return df


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__ as m

    return m


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    yield con
    con.close()


def test_entry_smoke(entrymod):
    out = entrymod.entry()
    assert out.num_rows > 0
    assert "url" in out.schema.names and "content_hash" in out.schema.names


def test_all_queries_run(entrymod):
    qs = entrymod.queries()
    assert len(qs) >= 20
    for name, fn in qs.items():
        res = _to_pandas(fn(SF))
        assert res is not None and len(res.columns) > 0, name


@pytest.mark.parametrize("name", [
    "cdc_replay_snapshot", "cdc_lww_dedup", "cdc_update_partial", "cdc_egress_epoch", "cdc_enrich_tokens", "cdc_schema_evolution",
    "cdc_point_lookup", "cdc_delete_where", "cdc_delete_egress",
    "cdc_domain_stats", "cdc_mirror_snapshot", "cdc_url_normalized",
    "cdc_replay_norm_keys", "cdc_retention_snapshot", "cdc_window_scan",
    "split_documents", "pack_documents", "token_budget_documents",
    "duplicate_spans_documents", "top_docs_per_lang",
    "token_quantiles_documents", "duplicate_span_stats_documents",
    "lang_token_budget_documents",
    "pricing_summary", "top_customer_orders", "events_windowed",
    "lww_latest_events", "upsert_events", "convert_events_typed",
    "events_sessionized", "events_distinct_users", "orders_semi_join", "cdc_backfill_rewrite",
    "exact_dedup_documents", "content_hash_documents", "token_stats_documents",
    "quality_documents", "lang_distribution_documents",
    "schema_project_documents", "embedding_topk",
    "geo_bbox_events", "geo_z2_events", "geo_wkt_events",
    "geo_z3_keys_events", "geo_z3_bbox_events",
])
def test_query_matches_oracle(entrymod, oracle_con, name):
    qs = entrymod.queries()
    sql = entrymod.oracle_sql()
    ours = _normalize(_to_pandas(qs[name](SF)))
    theirs = _normalize(oracle_con.execute(sql[name]).df())
    assert list(ours.columns) == list(theirs.columns), (
        f"{name} columns: {list(ours.columns)} vs {list(theirs.columns)}"
    )
    assert len(ours) == len(theirs), f"{name} rowcount {len(ours)} vs {len(theirs)}"
    pd.testing.assert_frame_equal(ours, theirs, check_dtype=False, atol=1e-6,
                                  obj=name)
