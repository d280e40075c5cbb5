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

from dedup.config import DedupConfig


def cosine_similarity(sig1: np.ndarray, sig2: np.ndarray) -> float:
    """Reference-identical cosine on float64 vectors
    (parity: app/hash_detector.py:149-154)."""
    if sig1 is None or sig2 is None:
        return 0.0
    s1 = sig1.astype(np.float64, copy=False)
    s2 = sig2.astype(np.float64, copy=False)
    return float(np.dot(s1, s2) / (np.linalg.norm(s1) * np.linalg.norm(s2)))


def jaccard_cols(shingles_a, shingles_b):
    """Exact Jaccard on (sorted, distinct) shingle arrays — native expression,
    no Python."""
    inter = F.size(F.array_intersect(shingles_a, shingles_b))
    union = F.size(F.array_union(shingles_a, shingles_b))
    return F.when(union > 0, inter.cast("double") / union.cast("double")
                  ).otherwise(F.lit(0.0))


_VERIFIED_SCHEMA = ("a string, b string, match_source string, "
                    "similarity double, jaccard double, keep boolean")


def verify_pairs(pairs: DataFrame, signatures: DataFrame,
                 cfg: DedupConfig) -> DataFrame:
    """(a, b [, match_source]) + signatures -> verified pairs with scores.

    Output: a, b, match_source, similarity (reference cosine scoring),
    jaccard (exact, on the shingle sets), keep (boolean decision).

    url_exact pairs keep similarity 1.0 and bypass the threshold, matching
    the reference short-circuit (app/hash_detector.py:263-266, :295-297);
    they never reach the scoring stage.

    Scoring runs as ONE mapInPandas stage over the natively-joined
    (pair, sig_a, sig_b) rows: per-pair np.dot on float64 (bit-identical to
    the reference formula at app/hash_detector.py:153) + exact Jaccard via
    sorted-array intersection. mapInPandas rather than a pandas_udf column
    on purpose — Catalyst re-evaluates projected UDF columns under filters
    (`where(keep)` would chain two ArrowEval stages), while a mapInPandas
    node is an optimizer barrier, so downstream filters run above the single
    Python stage.
    """
    if "match_source" not in pairs.columns:
        pairs = pairs.withColumn("match_source", F.lit("lsh"))
    # Parity (cosine) decisions never read the shingle sets, and shingle
    # arrays are 10-100x wider than the minhash signature — joining them
    # into every pair row multiplies verify-stage Arrow traffic by the mean
    # pair degree. Only engine (jaccard) mode pays for them.
    want_shingles = cfg.scoring == "jaccard"
    cols = ["url", "minhash"] + (["shingles"] if want_shingles else [])
    sig = signatures.select(*cols).where(F.col("minhash").isNotNull())
    if not want_shingles:
        sig = sig.withColumn("shingles", F.lit(None).cast("array<bigint>"))
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

    joined = (pairs.where(F.col("match_source") != "url_exact")
              .join(sa, "a").join(sb, "b"))

    scoring, threshold, j_threshold = cfg.scoring, cfg.threshold, cfg.jaccard_threshold

    def score(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            # signatures are fixed length k, so the Arrow batch is one
            # rectangular matrix: batched BLAS matmul scores every pair at
            # once and is BIT-IDENTICAL to the reference's per-pair
            # np.dot / np.linalg.norm (same BLAS kernels; verified by
            # tests/test_signature.py cosine parity and a dedicated
            # equality test) — unlike einsum/sum(axis=1), whose pairwise
            # summation differs from ddot in the last ulp.
            A = np.stack(pdf["_sig_a"].to_numpy()).astype(np.float64,
                                                          copy=False)
            B = np.stack(pdf["_sig_b"].to_numpy()).astype(np.float64,
                                                          copy=False)
            dots = np.matmul(A[:, None, :], B[:, :, None]).ravel()
            na = np.sqrt(np.matmul(A[:, None, :], A[:, :, None]).ravel())
            nb = np.sqrt(np.matmul(B[:, None, :], B[:, :, None]).ravel())
            sims = dots / (na * nb)
            jacs = np.full(n, np.nan, dtype=np.float64)
            if scoring == "jaccard":
                # shingle arrays are stored sorted+distinct, so the
                # intersection size is a binary-search count: probe the
                # smaller array into the larger one with ONE vectorized
                # searchsorted per pair instead of intersect1d (which
                # re-sorts the concatenation) — ~5x less work per pair
                for i, (ha, hb) in enumerate(zip(pdf["_sh_a"], pdf["_sh_b"])):
                    if ha is not None and hb is not None:
                        ia = np.asarray(ha, dtype=np.int64)
                        ib = np.asarray(hb, dtype=np.int64)
                        if ib.size < ia.size:
                            ia, ib = ib, ia
                        idx = np.searchsorted(ib, ia)
                        idx[idx == ib.size] = 0
                        inter = int(np.count_nonzero(ib[idx] == ia))
                        union = ia.size + ib.size - inter
                        jacs[i] = inter / union if union else 0.0
            keep = (jacs >= j_threshold if scoring == "jaccard"
                    else sims >= threshold)
            yield pd.DataFrame({
                "a": pdf["a"], "b": pdf["b"],
                "match_source": pdf["match_source"],
                "similarity": sims, "jaccard": jacs, "keep": keep,
            })

    scored = joined.mapInPandas(score, schema=_VERIFIED_SCHEMA)
    return url_exact.unionByName(scored)
