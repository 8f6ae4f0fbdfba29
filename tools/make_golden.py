"""Generate golden-snapshot oracle fixtures for the non-SQL-expressible
queries (heuristic / sketch / index ops whose outputs DuckDB cannot
recompute): langid, quality scoring, minhash/simhash pairs, clusters,
fingerprints, multimodal features, IVF top-k.

The fixture pins the DETERMINISTIC output of each query at the small sf
tiers; the driver's oracle then becomes ``SELECT * FROM
read_parquet('<fixture>')``. This verifies stability and batch-layout
independence (a regression that changes any value, row count or schema
fails the gate); *semantic* correctness of these operators is covered by
pytest (planted near-dups, known-language docs, recall-vs-exact tests).

Run: ``python tools/make_golden.py`` (re-run whenever an operator's
output is intentionally changed; commit the updated fixtures).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

GOLDEN_QUERIES = [
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
    "geo_wkb_events",
]

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "tests", "fixtures", "golden")


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from geomesa_nifi_ray.pipelines.queries import QUERIES, _sf_name

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for sf_dir in SF_DIRS:
        name = _sf_name(sf_dir)
        for q in GOLDEN_QUERIES:
            res = QUERIES[q](sf_dir)
            if hasattr(res, "to_arrow_refs"):       # ray Dataset
                df = res.to_pandas()
            elif isinstance(res, pa.Table):
                df = res.to_pandas()
            else:
                df = res
            cols = sorted(df.columns)
            df = df[cols].sort_values(cols, kind="stable").reset_index(drop=True)
            path = os.path.join(GOLDEN_DIR, f"{q}__{name}.parquet")
            pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
            print(f"wrote {path} rows={len(df)}")
    ray.shutdown()


if __name__ == "__main__":
    main()
