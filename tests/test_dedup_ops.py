"""Dedup suite over the driver testdata documents/embeddings tables."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import geomesa_nifi_ray.dedup as dd

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(ray_session):
    import ray.data

    return ray.data.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(ray_session):
    import ray.data

    return ray.data.read_parquet(f"{SF}/embeddings.parquet")


def test_exact_dedup_matches_duckdb(docs):
    import duckdb

    out = dd.exact_dedup(docs, ["text"], "doc_id").to_pandas()
    con = duckdb.connect()
    expected = con.execute(
        f"SELECT count(DISTINCT text) n, count(*) total FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()
    con.close()
    assert len(out) == expected[0] <= expected[1]
    assert out.doc_id.is_unique


def test_exact_dedup_picks_min_id(ray_session):
    import ray.data

    t = pa.table({"doc_id": [5, 3, 9, 1], "text": ["a", "a", "b", "b"]})
    out = dd.exact_dedup(ray.data.from_arrow(t), ["text"], "doc_id").to_pandas()
    assert sorted(out.doc_id.tolist()) == [1, 3]


def test_minhash_finds_planted_neardups(ray_session):
    import ray.data

    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "through fields of green grass under a bright blue sky today") * 3
    near = base.replace("lazy", "sleepy")          # high jaccard
    far = "completely different content about database engines and arrow " * 6
    t = pa.table({"doc_id": [1, 2, 3, 4], "text": [base, near, far, base]})
    pairs = dd.minhash_candidate_pairs(
        ray.data.from_arrow(t), threshold=0.5, shingle_k=5
    ).to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(pairs.doc_a, pairs.doc_b)}
    assert (1, 4) in got          # exact duplicate
    assert (1, 2) in got or (2, 4) in got  # near duplicate
    assert (1, 3) not in got and (2, 3) not in got  # unrelated


def test_minhash_signature_deterministic():
    a, b = dd._perm_params(64, 1729)
    s1 = dd.minhash_signature(np.array([1, 2, 3, 4], dtype=np.uint64), a, b)
    s2 = dd.minhash_signature(np.array([4, 3, 2, 1, 1], dtype=np.uint64), a, b)
    assert (s1 == s2).all()  # set semantics, order/dup independent


def test_cluster_assignment():
    pairs = pd.DataFrame({"doc_a": [1, 2, 10], "doc_b": [2, 3, 11]})
    out = dd.assign_duplicate_clusters(pairs)
    m = dict(zip(out.doc_id, out.cluster))
    assert m[1] == m[2] == m[3] == 1
    assert m[10] == m[11] == 10


def test_simhash_pairs(ray_session):
    import ray.data

    base = "word " * 50 + "ending one two three four five six seven"
    near = "word " * 50 + "ending one two three four five six eight"
    t = pa.table({"doc_id": [1, 2, 3], "text": [base, near, "totally other stuff here now"]})
    pairs = dd.simhash_candidate_pairs(ray.data.from_arrow(t), max_hamming=8).to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(pairs.doc_a, pairs.doc_b)}
    assert (1, 2) in got
    assert (1, 3) not in got


def test_ngram_jaccard_exact(ray_session):
    import ray.data

    a = "one two three four five six seven eight nine ten"
    b = "one two three four five six seven eight nine eleven"
    t = pa.table({"doc_id": [1, 2, 3], "text": [a, b, "x y z w q r s t u v"]})
    pairs = dd.ngram_jaccard_pairs(ray.data.from_arrow(t), n=3, threshold=0.3).to_pandas()
    got = {tuple(sorted((x, y))): j for x, y, j in zip(pairs.doc_a, pairs.doc_b, pairs.jaccard)}
    assert (1, 2) in got
    # exact jaccard of 3-gram sets: 8 shared / (8+8-... ) compute: a has 8 grams, b has 8, share 7 -> 7/9
    assert abs(got[(1, 2)] - 7 / 9) < 1e-9


def test_embedding_neardup_and_lsh(ray_session):
    import ray.data

    rng = np.random.RandomState(11)
    base = rng.standard_normal((40, 16)).astype(np.float32)
    # plant near-duplicates: rows 40..44 are jittered copies of rows 0..4
    dups = base[:5] + 0.01 * rng.standard_normal((5, 16)).astype(np.float32)
    mat = np.vstack([base, dups])
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(45, dtype=np.int64)),
            "embedding": pa.array([v.tolist() for v in mat], type=pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(t)
    pairs = dd.embedding_neardup_pairs(ds, tau=0.99).to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(pairs.doc_a, pairs.doc_b)}
    assert {(i, 40 + i) for i in range(5)} <= got
    assert (pairs.doc_a < pairs.doc_b).all()  # canonical orientation, no self pairs

    lsh = dd.embedding_lsh_neardup_pairs(ds, tau=0.99, planes=6).to_pandas()
    if len(lsh):
        approx = {tuple(sorted((a, b))) for a, b in zip(lsh.doc_a, lsh.doc_b)}
        assert approx <= got  # LSH returns a subset of the exact pairs


def test_distributed_clusters_match_driver_version(ray_session):
    import ray.data

    pairs = pd.DataFrame(
        {"doc_a": [1, 2, 5, 7, 10], "doc_b": [2, 3, 6, 8, 11], "est_jaccard": [1.0] * 5}
    )
    want = dd.assign_duplicate_clusters(pairs)
    got = dd.assign_duplicate_clusters_ds(ray.data.from_pandas(pairs))
    w = want.sort_values("doc_id").reset_index(drop=True)
    g = got.sort_values("doc_id").reset_index(drop=True)
    assert list(w["doc_id"]) == list(g["doc_id"])
    assert list(w["cluster"]) == list(g["cluster"])
    # components: {1,2,3}->1, {5,6}->5, {7,8}->7, {10,11}->10
    by = dict(zip(g["doc_id"], g["cluster"]))
    assert by[3] == 1 and by[6] == 5 and by[8] == 7 and by[11] == 10


def test_distributed_clusters_long_chain(ray_session):
    import ray.data

    # a 12-node path graph needs multiple propagation rounds
    pairs = pd.DataFrame({"doc_a": list(range(11)), "doc_b": list(range(1, 12)),
                          "est_jaccard": [1.0] * 11})
    got = dd.assign_duplicate_clusters_ds(ray.data.from_pandas(pairs))
    assert set(got["cluster"]) == {0} and len(got) == 12
