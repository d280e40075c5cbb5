"""Round-5 fixes: zero-norm embeddings through the ANN/semantic query
UDFs (the guard landed in dedup/ann_index.py in round 4 — these tests pin
it in the queries.py UDF path and the single-node oracle too)."""

from __future__ import annotations

import math

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def zero_vec_sf_dir(spark, tmp_path_factory):
    """A temp sf-dir whose embeddings table is the sf0.001 set plus TWO
    planted all-zero vectors — one on a centroid id (vec_id % mod == 0
    territory) and one off — so both the centroid matrix and the batch
    side of the normalized matmuls see a zero row."""
    base = tmp_path_factory.mktemp("zerovec")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    dim = len(emb.first()["embedding"])
    n = emb.count()
    zeros = spark.createDataFrame(
        [(n, [0.0] * dim), (n + 1, [0.0] * dim)],
        "vec_id bigint, embedding array<double>")
    (emb.select("vec_id", "embedding").unionByName(zeros)
     .write.parquet(f"{base}/embeddings.parquet"))
    return str(base)


def _vec_rows(spark, sf_dir):
    return [(r["vec_id"], list(r["embedding"]))
            for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .orderBy("vec_id").collect()]


def test_ivf_query_survives_zero_vectors(spark, zero_vec_sf_dir):
    """A planted zero embedding must not NaN-poison the Arrow batch's cell
    assignments: every emitted cos_sim is finite and the pair set equals
    the independently-guarded single-node oracle."""
    from dedup import local_oracle as lo
    from dedup.queries import ANN_BUCKET_CAP, ANN_COS_MIN, q_embedding_knn_ivf

    got = [(r["a"], r["b"], r["cos_sim"])
           for r in q_embedding_knn_ivf(spark, zero_vec_sf_dir).collect()]
    assert got, "query emitted no pairs"
    assert all(math.isfinite(c) for _, _, c in got)
    want = lo.local_ivf_pairs(_vec_rows(spark, zero_vec_sf_dir),
                              ANN_COS_MIN, ANN_BUCKET_CAP)
    assert got == want


def test_semantic_dedup_survives_zero_vectors(spark, zero_vec_sf_dir):
    """Zero vectors get a deterministic cell (argmax over an all-zero sim
    row) and survive the greedy sweep as keeps; every row present, none
    NaN-assigned, oracle-equal."""
    from dedup import local_oracle as lo
    from dedup.queries import SEM_CELL_CAP, SEM_DEDUP_T, q_semantic_dedup

    got = [(r["vec_id"], r["cell"], r["keep"], r["rep_id"])
           for r in q_semantic_dedup(spark, zero_vec_sf_dir).collect()]
    rows = _vec_rows(spark, zero_vec_sf_dir)
    planted = rows + [(vid + 100000, v) for vid, v in rows if vid < 50]
    want = lo.local_semantic_dedup(planted, SEM_DEDUP_T, SEM_CELL_CAP)
    assert sorted(got) == want
    # the two zero vectors are present and kept (cos 0 to everything)
    n = len(rows) - 2
    zero_rows = [r for r in got if r[0] in (n, n + 1)]
    assert len(zero_rows) == 2
    assert all(keep for _, _, keep, _ in zero_rows)
