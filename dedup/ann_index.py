"""Trained IVF coarse quantizer — the ANN index PREPROCESSING job.

`dedup/queries.q_embedding_knn_ivf` uses a deterministic sampling stand-in
for its coarse quantizer (vec_id % mod == 0) because kmeans training is a
preprocessing job, not a query. This module is that job: a deterministic
seeded mini-batch kmeans over a BOUNDED hash-ordered sample, persisted as a
fixed-size index artifact (<= IVF_MAX_CENTROIDS rows) with a manifest that
pins the training config — loading under a different config is refused,
like the pipeline key-index guard (jobs/detect.py).

Scale shape: training touches only `sample_cap` vectors (one TakeOrdered
collect, bounded driver memory); assignment at query time is one matmul per
Arrow batch against the broadcast centroid matrix — O(n * k * d) total,
linear in corpus size. The sampling quantizer remains the documented
training-free fallback.

Determinism: the sample is ordered by (xxhash64(vec_id), vec_id) — a pure
function of the data, independent of partitioning — and Lloyd's iterations
use reduceat-based per-cell means over a stable sort, so the single-node
oracle reproduces the exact centroid matrix by running the same pure
function on the same sample.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

IVF_TRAIN_SEED = 42          # xxhash64 default seed used by the sample order
IVF_TRAIN_SAMPLE = 16384     # driver-side training sample cap
IVF_TRAIN_ITERS = 8          # Lloyd's iterations (fixed, bounded)
IVF_INDEX_VERSION = 1


def unit_rows(M: np.ndarray) -> np.ndarray:
    """Row-normalize with the engine's canonical zero-norm guard: zero
    rows divide by 1.0 (all-zero unit row, deterministic argmax) instead
    of NaN-poisoning every downstream matmul. THE single definition —
    queries.py and the single-node oracle import it so the policy can
    never drift between engine and oracle."""
    norms = np.linalg.norm(M, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return M / norms


def ivf_k_for(n: int, max_centroids: int = 4096) -> int:
    """Centroid count heuristic: k ~ sqrt(n), clamped to [16, max]."""
    return int(min(max_centroids, max(16, round(n ** 0.5))))


def train_kmeans(M: np.ndarray, k: int,
                 iters: int = IVF_TRAIN_ITERS) -> np.ndarray:
    """Deterministic spherical Lloyd's kmeans.

    M rows must arrive in a deterministic order (the hash-ordered sample);
    init = the first k rows, each iteration assigns by cosine (normalized
    matmul) and recomputes per-cell means with np.add.reduceat over a
    stable sort — no RNG, no order-dependent accumulation. Empty cells
    keep their previous centroid. Returns the (k, dim) row-normalized
    centroid matrix. Zero-norm input rows normalize against 1.0 instead
    of NaN-poisoning the whole matrix."""
    Mn = unit_rows(M)
    k = min(k, Mn.shape[0])
    C = Mn[:k].copy()
    for _ in range(iters):
        assign = np.argmax(Mn @ C.T, axis=1)
        order = np.argsort(assign, kind="stable")
        sa = assign[order]
        starts = np.flatnonzero(np.r_[True, sa[1:] != sa[:-1]])
        sums = np.add.reduceat(Mn[order], starts, axis=0)
        counts = np.diff(np.r_[starts, sa.size])
        newC = C.copy()
        newC[sa[starts]] = sums / counts[:, None]
        C = unit_rows(newC)
    return C


def sample_vectors(e: DataFrame, cap: int = IVF_TRAIN_SAMPLE) -> np.ndarray:
    """Bounded deterministic training sample of e(vec_id, v): the `cap`
    vectors with the smallest (xxhash64(vec_id), vec_id) — a TakeOrdered
    collect, not a full sort."""
    rows = (e.select("vec_id", "v")
            .orderBy(F.xxhash64(F.col("vec_id").cast("bigint")), "vec_id")
            .limit(cap).collect())
    return np.stack([np.asarray(r["v"], dtype=np.float64) for r in rows])


def ivf_index_config(n_vectors: int, dim: int, k: int,
                     sample_cap: int = IVF_TRAIN_SAMPLE,
                     iters: int = IVF_TRAIN_ITERS) -> dict:
    return {"kind": "ivf_kmeans", "version": IVF_INDEX_VERSION,
            "seed": IVF_TRAIN_SEED, "sample_cap": sample_cap,
            "iters": iters, "n_vectors": n_vectors, "dim": dim, "k": k}


def build_ivf_index(spark, e: DataFrame, path: str,
                    k: int | None = None,
                    sample_cap: int = IVF_TRAIN_SAMPLE,
                    iters: int = IVF_TRAIN_ITERS) -> np.ndarray:
    """Train and persist the quantizer for e(vec_id BIGINT, v ARRAY<DOUBLE>).

    Writes `<path>` as a parquet table (centroid_id INT, vector
    ARRAY<DOUBLE>) plus `<path>/_manifest.json` (underscore-prefixed, so
    table scans ignore it) pinning the training config. Returns the
    centroid matrix."""
    n = e.count()
    if n == 0:
        raise ValueError(
            "cannot train an IVF quantizer on an empty embeddings table — "
            "no vectors to sample (check the input path/filter)")
    dim = len(e.select("v").first()["v"])
    k = k if k is not None else ivf_k_for(n)
    C = train_kmeans(sample_vectors(e, sample_cap), k, iters)
    rows = [(i, C[i].tolist()) for i in range(C.shape[0])]
    (spark.createDataFrame(rows, "centroid_id int, vector array<double>")
     .coalesce(1).write.mode("overwrite").parquet(path))
    manifest = ivf_index_config(n, dim, C.shape[0], sample_cap, iters)
    Path(path, "_manifest.json").write_text(json.dumps(manifest, indent=2))
    return C


def load_ivf_index(spark, path: str,
                   expect: dict | None = None) -> np.ndarray:
    """Load a persisted quantizer; refuse one whose manifest is missing or
    whose config (minus corpus-size fields) mismatches `expect` — a
    quantizer trained under different parameters silently assigns
    different cells, exactly like a mismatched key index."""
    mp = Path(path, "_manifest.json")
    if not mp.exists():
        raise ValueError(f"ANN index at {path} has no _manifest.json; "
                         "rebuild it with build_ivf_index")
    man = json.loads(mp.read_text())
    if expect is not None:
        check = {f: man.get(f) for f in
                 ("kind", "version", "seed", "sample_cap", "iters")}
        want = {f: expect.get(f) for f in check}
        if check != want:
            raise ValueError(
                f"ANN index config mismatch at {path}: {check} != {want}")
    rows = (spark.read.parquet(path)
            .orderBy("centroid_id").collect())
    return np.stack([np.asarray(r["vector"], dtype=np.float64)
                     for r in rows])


def ivf_pairs(e: DataFrame, C: np.ndarray, cos_min: float,
              bucket_cap: int, nprobe: int = 2) -> DataFrame:
    """Cell assignment + skew-aware grouped pair emission + exact rerank
    against a GIVEN (trained or sampled) centroid matrix. Same
    non-degenerate shape as q_embedding_knn_ivf: the centroid matrix rides
    a sparkContext.broadcast, vectors never enter the shuffle, no cell
    self-join, one matmul per Arrow batch."""
    from dedup.lsh import pairs_within_groups

    spark = e.sparkSession
    Cn_bc = spark.sparkContext.broadcast(unit_rows(C))

    @F.pandas_udf("array<int>")
    def cells_udf(vs: pd.Series) -> pd.Series:
        M = np.stack(vs.to_numpy()).astype(np.float64, copy=False)
        Mn = unit_rows(M)
        sims = Mn @ Cn_bc.value.T
        top = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(top.astype(np.int32)))

    cells = (e.select(F.col("vec_id").cast("string").alias("url"),
                      F.explode(cells_udf("v")).alias("cell")))
    raw = (pairs_within_groups(cells, ["cell"], bucket_cap)
           .select(F.col("a").cast("bigint").alias("_x"),
                   F.col("b").cast("bigint").alias("_y")))
    pairs = (raw.select(F.least("_x", "_y").alias("a"),
                        F.greatest("_x", "_y").alias("b"))
             .dropDuplicates(["a", "b"]))
    va = e.select(F.col("vec_id").alias("a"), F.col("v").alias("va"))
    vb = e.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"))
    dot = F.expr("aggregate(zip_with(va, vb, (x, y) -> x * y), "
                 "cast(0.0 as double), (acc, x) -> acc + x)")
    norm = ("sqrt(aggregate(transform({0}, x -> x * x), cast(0.0 as double), "
            "(acc, x) -> acc + x))")
    cos = F.try_divide(dot, F.expr(norm.format("va")) * F.expr(norm.format("vb")))
    return (pairs.join(va, "a").join(vb, "b")
            .select("a", "b", F.round(cos, 6).alias("cos_sim"))
            .where(f"cos_sim > {cos_min}")
            .orderBy("a", "b"))
