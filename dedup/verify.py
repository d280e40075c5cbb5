"""Candidate-pair verification: cosine (parity) and exact Jaccard (engine).

The reference scores a pair as the cosine of the two MinHash signature
vectors — NOT a Jaccard estimate (reference app/hash_detector.py:138-154,
formula at :153). Parity runs must therefore use cosine; engine mode adds
exact Jaccard over the shingle sets (the north-star's "exact verification"),
computed natively with array_intersect/array_union sizes.

Scale notes:
- candidate pairs arrive as a slim (a, b) table; signatures are joined back
  by key here so the wide arrays never ride through the banding shuffle.
- parity cosine runs in an Arrow-batched pandas UDF using the same
  ``np.dot / (norm * norm)`` float64 formula as the reference, per pair, so
  scores agree to the last ulp (verified in tests).
- exact Jaccard stays entirely JVM-side (whole-stage codegen).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DoubleType

from dedup.config import DedupConfig


def cosine_similarity(sig1: np.ndarray, sig2: np.ndarray) -> float:
    """Reference-identical cosine on float64 vectors
    (parity: app/hash_detector.py:149-154)."""
    if sig1 is None or sig2 is None:
        return 0.0
    s1 = sig1.astype(np.float64, copy=False)
    s2 = sig2.astype(np.float64, copy=False)
    return float(np.dot(s1, s2) / (np.linalg.norm(s1) * np.linalg.norm(s2)))


@F.pandas_udf(DoubleType())
def cosine_udf(sig_a: pd.Series, sig_b: pd.Series) -> pd.Series:
    """Pair-wise reference cosine. Per-pair np.dot (not a fused matrix
    product) so float64 summation order matches the reference exactly."""
    out = np.empty(len(sig_a), dtype=np.float64)
    for i, (a, b) in enumerate(zip(sig_a, sig_b)):
        if a is None or b is None:
            out[i] = 0.0
            continue
        va = np.asarray(a, dtype=np.float64)
        vb = np.asarray(b, dtype=np.float64)
        out[i] = np.dot(va, vb) / (np.linalg.norm(va) * np.linalg.norm(vb))
    return pd.Series(out)


def jaccard_cols(shingles_a, shingles_b):
    """Exact Jaccard on (sorted, distinct) shingle arrays — native expression,
    no Python."""
    inter = F.size(F.array_intersect(shingles_a, shingles_b))
    union = F.size(F.array_union(shingles_a, shingles_b))
    return F.when(union > 0, inter.cast("double") / union.cast("double")
                  ).otherwise(F.lit(0.0))


def verify_pairs(pairs: DataFrame, signatures: DataFrame,
                 cfg: DedupConfig) -> DataFrame:
    """(a, b [, match_source]) + signatures -> verified pairs with scores.

    Output: a, b, match_source, similarity (reference scoring), jaccard
    (exact), keep (boolean decision).

    url_exact pairs keep similarity 1.0 and bypass the threshold, matching
    the reference short-circuit (app/hash_detector.py:263-266, :295-297);
    Catalyst pushes the match_source filter below the cosine UDF projection
    so url_exact pairs never pay for signature scoring.
    """
    if "match_source" not in pairs.columns:
        pairs = pairs.withColumn("match_source", F.lit("lsh"))
    sig = signatures.select(
        "url", "minhash", "shingles").where(F.col("minhash").isNotNull())
    sa = sig.select(F.col("url").alias("a"),
                    F.col("minhash").alias("_sig_a"),
                    F.col("shingles").alias("_sh_a"))
    sb = sig.select(F.col("url").alias("b"),
                    F.col("minhash").alias("_sig_b"),
                    F.col("shingles").alias("_sh_b"))

    url_exact = pairs.where(F.col("match_source") == "url_exact").select(
        "a", "b", "match_source",
        F.lit(1.0).alias("similarity"),
        F.lit(1.0).alias("jaccard"),
        F.lit(True).alias("keep"),
    )

    scored = (
        pairs.where(F.col("match_source") != "url_exact")
        .join(sa, "a").join(sb, "b")
        .withColumn("similarity", cosine_udf(F.col("_sig_a"), F.col("_sig_b")))
        .withColumn("jaccard", jaccard_cols(F.col("_sh_a"), F.col("_sh_b")))
    )
    if cfg.scoring == "jaccard":
        keep = F.col("jaccard") >= F.lit(cfg.jaccard_threshold)
    else:
        keep = F.col("similarity") >= F.lit(cfg.threshold)
    scored = scored.select("a", "b", "match_source", "similarity", "jaccard",
                           keep.alias("keep"))
    return url_exact.unionByName(scored)
