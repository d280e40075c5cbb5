"""ANN scale-path quality: planted near-duplicate vectors must be recovered
by the multi-table hyperplane LSH + rerank (dedup.queries.ann_lsh_pairs).
The driver's embeddings table has no strongly-similar pairs (max pairwise
cos ~0.48 at sf0.001), so recall is exercised here on planted data: for
cos ~0.998 pairs the per-table collision probability is ~(1 - theta/pi)^12
~ 0.74, so missing ALL 8 tables is ~2e-5 per pair. (Noise sigma 0.015 puts
planted pairs at cos ~0.993 — the regime embedding near-dups live in; at
cos ~0.97 single-table collision drops to ~0.4 and recall to ~0.92, which
is below this LSH configuration's design point.)"""

from __future__ import annotations

import numpy as np
import pytest

from dedup.queries import ann_lsh_pairs


@pytest.fixture(scope="module")
def planted(spark):
    rng = np.random.RandomState(7)
    base = rng.randn(200, 64)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i].tolist()) for i in range(200)]
    # 40 planted near-duplicates of the first 40 vectors
    for j in range(40):
        v = base[j] + 0.015 * rng.randn(64)
        v /= np.linalg.norm(v)
        rows.append((200 + j, v.tolist()))
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    return df, [(j, 200 + j) for j in range(40)]


def test_ann_lsh_recall_on_planted_near_dups(spark, planted):
    df, truth = planted
    got = {(r["a"], r["b"])
           for r in ann_lsh_pairs(df, cos_min=0.9).collect()}
    found = sum(1 for p in truth if p in got)
    assert found / len(truth) >= 0.95
    # every reported pair respects the rerank threshold by construction;
    # check no spurious strong pairs appear among unrelated base vectors
    spurious = [p for p in got if p not in truth and p[0] < 200 and p[1] < 200]
    assert not spurious


def test_ann_lsh_emits_nothing_for_orthogonalish_data(spark):
    rng = np.random.RandomState(11)
    vecs = rng.randn(150, 64)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(150)],
        "vec_id long, v array<double>")
    # random 64-dim unit vectors essentially never exceed cos 0.9
    assert ann_lsh_pairs(df, cos_min=0.9).count() == 0


def test_ivf_centroid_mod_bounds_index_size():
    from dedup.queries import IVF_MAX_CENTROIDS, ivf_centroid_mod

    # small n keeps the dense stand-in quantizer
    assert ivf_centroid_mod(500) == 16
    assert ivf_centroid_mod(65_536) == 16
    # beyond max_centroids*16 the stride grows so k stays bounded: the
    # centroid collect and the broadcast matrix are fixed-size artifacts
    # regardless of table size (the round-2 O(n^2) quantizer is gone)
    for n in (100_000, 10_000_000, 10_000_000_000):
        mod = ivf_centroid_mod(n)
        k = n // mod + 1
        assert k <= IVF_MAX_CENTROIDS + 1
    # monotone non-decreasing stride
    assert ivf_centroid_mod(10_000_000) >= ivf_centroid_mod(100_000)


def test_ivf_query_matches_local_oracle_sf0001(spark):
    from dedup.local_oracle import local_ivf_pairs
    from dedup.queries import q_embedding_knn_ivf

    sf_dir = "/root/testdata/sf0.001"
    got = {(r["a"], r["b"], r["cos_sim"])
           for r in q_embedding_knn_ivf(spark, sf_dir).collect()}
    import duckdb
    emb = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id").fetchall()
    from dedup.queries import ANN_BUCKET_CAP, ANN_COS_MIN
    want = {(a, b, c)
            for a, b, c in local_ivf_pairs(
                [(vid, np.asarray(v, dtype=np.float64)) for vid, v in emb],
                ANN_COS_MIN, ANN_BUCKET_CAP)}
    assert got == want
