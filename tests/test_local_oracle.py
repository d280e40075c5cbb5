"""Parity tests for the single-node oracle engine (dedup/local_oracle.py):
the fixture generator is only a valid oracle if its primitives match Spark
bit-for-bit — xxhash64, grouped pair emission, HALF_UP rounding — and if the
committed fixture file is reproducible from the current code."""

from __future__ import annotations

import json
import random
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from dedup import local_oracle as lo
from dedup.config import PARITY_CONFIG
from dedup.lsh import pairs_within_groups

FIXTURE = Path(__file__).parent.parent / "dedup" / "fixtures" / "oracle_sf001.json"


def test_xxh64_long_array_matches_spark(spark):
    random.seed(11)
    rows = [(i, [random.randint(0, 2**34) for _ in range(random.randint(1, 7))])
            for i in range(100)]
    df = spark.createDataFrame(rows, "id int, arr array<bigint>")
    got = {r["id"]: r["h"]
           for r in df.select("id", F.xxhash64("arr").alias("h")).collect()}
    for i, arr in rows:
        assert lo.xxh64_long_array(arr) == got[i]


def test_xxh64_band_key_matches_spark(spark):
    """The unified band key is xxhash64(band_id INT, slice ARRAY<BIGINT>);
    the single-node oracle and dedupe_one must reproduce it exactly."""
    random.seed(19)
    rows = [(i, random.randint(0, 63),
             [random.randint(0, 2**33) for _ in range(2)])
            for i in range(80)]
    df = spark.createDataFrame(rows, "id int, bid int, arr array<bigint>")
    got = {r["id"]: r["h"] for r in
           df.select("id", F.xxhash64("bid", "arr").alias("h")).collect()}
    for i, bid, arr in rows:
        assert lo.xxh64_band_key(bid, arr) == got[i]


def test_pairs_from_groups_matches_spark(spark):
    random.seed(13)
    rows = [(f"k{random.randint(0, 9)}", f"m{random.randint(0, 30):03d}")
            for _ in range(300)]
    rows += [("hot", f"h{i:03d}") for i in range(40)] * 2  # 80 rows > cap
    cap = 20
    df = spark.createDataFrame(rows, "gk string, url string")
    spark_pairs = {(r["a"], r["b"]) for r in
                   pairs_within_groups(df, ["gk"], cap).collect()}
    local_pairs = {(a, b) for _, a, b in lo.pairs_from_groups(rows, cap)}
    assert local_pairs == spark_pairs
    # hot group produced star edges only: center h000, 39 edges
    hot = {(a, b) for a, b in local_pairs if a.startswith("h")}
    assert hot == {("h000", f"h{i:03d}") for i in range(1, 40)}


def test_round_half_up_matches_spark_round(spark):
    random.seed(17)
    vals = [random.uniform(-1, 1) for _ in range(300)]
    vals += [0.1234565, 0.9999995, -0.1234565, 1.0, 0.0]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "id int, x double")
    got = {r["id"]: r["r"] for r in
           df.select("id", F.round("x", 6).alias("r")).collect()}
    for i, v in enumerate(vals):
        assert lo.round_half_up(v, 6) == got[i], (v, lo.round_half_up(v, 6), got[i])


def test_fixture_file_exists_and_covers_expected_queries():
    data = json.loads(FIXTURE.read_text())
    assert set(data) == {
        "minhash_signatures", "lsh_candidate_pairs", "dup_clusters",
        "simhash_hamming", "doc_fingerprints", "substring_pairs",
        "media_features", "media_dup_pairs", "embedding_knn_lsh",
        "embedding_knn_ivf", "dedupe_one_url", "dedupe_by_metadata",
        "kernel_detect", "metadata_block_pairs", "url_normalize_youtube",
        "permutation_coeffs", "minhash_signatures_engine", "candidate_stats",
        "clusters_incremental", "stream_pairs", "semantic_dedup",
        "dup_clusters_engine", "embedding_knn_ivf_trained",
        "ingest_two_drops", "stream_state_evict",
        "cluster_representatives",
    }
    for name, d in data.items():
        assert d["rows"], f"{name} fixture is empty"
        width = len(d["columns"])
        assert all(len(r) == width for r in d["rows"])


def test_fixture_signatures_reproducible():
    """Spot-check: the committed fixture rows equal a fresh local
    computation (guards against stale fixtures after config changes)."""
    import duckdb
    data = json.loads(FIXTURE.read_text())
    con = duckdb.connect()
    df = con.execute(
        "SELECT doc_id, text, source FROM "
        "'/root/testdata/sf0.01/documents.parquet' "
        "ORDER BY doc_id LIMIT 5").df()
    rows = [(f"https://www.{s}.example.com/docs/{d}", t)
            for d, t, s in zip(df["doc_id"], df["text"], df["source"])]
    sigs = lo.local_signatures(rows, PARITY_CONFIG)
    by_url = {r[0]: r for r in data["minhash_signatures"]["rows"]}
    for s in sigs:
        url, sig_len, n_tokens, sig0, simhash = by_url[s.url]
        assert sig_len == len(s.minhash)
        assert n_tokens == s.n_tokens
        assert sig0 == int(s.minhash[0])
        assert simhash == s.simhash


def test_batched_matmul_cosine_bit_equals_per_row_dot():
    """The verify stage scores Arrow batches with batched BLAS matmul; the
    reference scores per pair with np.dot/np.linalg.norm. These must agree
    to the LAST ULP (the einsum/sum-axis alternatives do not)."""
    import numpy as np
    rng = np.random.RandomState(5)
    n, k = 5000, 100
    A = rng.randint(0, 2**32, size=(n, k)).astype(np.float64)
    B = rng.randint(0, 2**32, size=(n, k)).astype(np.float64)
    dots = np.matmul(A[:, None, :], B[:, :, None]).ravel()
    na = np.sqrt(np.matmul(A[:, None, :], A[:, :, None]).ravel())
    nb = np.sqrt(np.matmul(B[:, None, :], B[:, :, None]).ravel())
    batched = dots / (na * nb)
    for i in range(n):
        ref = np.dot(A[i], B[i]) / (np.linalg.norm(A[i]) * np.linalg.norm(B[i]))
        assert batched[i] == ref


def test_local_verify_threshold_semantics():
    cfg = PARITY_CONFIG
    sigs = lo.local_signatures(
        [("u1", "alpha beta gamma delta epsilon zeta"),
         ("u2", "alpha beta gamma delta epsilon zeta"),
         ("u3", "totally different words entirely here now")], cfg)
    verified = lo.local_verify(
        [("u1", "u2", "lsh"), ("u1", "u3", "lsh"), ("u2", "u3", "url_exact")],
        sigs, cfg)
    by_pair = {(a, b): (sim, keep) for a, b, _, sim, _, keep in verified}
    # u1 == u2 byte-identical -> identical signatures; the expected score is
    # the REFERENCE formula on that vector (np.dot self-cosine is 1.0 only
    # up to the platform BLAS's ULP — parity means same-formula, not ==1.0)
    import numpy as np
    v = next(s.minhash for s in sigs if s.url == "u1").astype(np.float64)
    self_cos = float(np.dot(v, v) / (np.linalg.norm(v) * np.linalg.norm(v)))
    assert by_pair[("u1", "u2")] == (self_cos, True)
    assert by_pair[("u1", "u2")][0] >= 0.999999999
    assert by_pair[("u2", "u3")] == (1.0, True)  # url_exact bypass
    assert not by_pair[("u1", "u3")][1] or by_pair[("u1", "u3")][0] >= 0.9
