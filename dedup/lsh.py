"""LSH banding + candidate-pair generation.

Replaces the reference's remote-search candidate generation
(app/wlo_client.py:237-418) with corpus-self LSH: the MinHash signature is
split into b bands of r rows (b*r = num_hashes); each band is hashed to a
bucket key; documents sharing any (band_id, band_hash) bucket become
candidate pairs — the classic explode + groupBy plan from the north-star
spec. The norm_url equi-join reproduces the reference's URL-exact
short-circuit (app/hash_detector.py:249-266) and doubles as a recall
backstop.

Scale design (the part that must survive 100 TB):
- banding carries ONLY (url, band_id, band_hash) through the shuffle — the
  wide minhash/shingle arrays never leave the signatures table (verification
  joins them back by key).
- band_hash is a native xxhash64 over the array slice: whole-stage codegen,
  no Python.
- hot buckets (boilerplate cliques — FIXTURES.md §1.10) are detected by a
  bucket-count aggregation. Small buckets self-join all-pairs; hot buckets
  emit STAR edges (bucket-min url -> member), which preserves cluster
  connectivity with O(n) instead of O(n^2) edges per bucket. Any pair missed
  by a hot-band star has b-1 independent chances to collide in other bands,
  plus the norm_url join. The self-join itself runs under AQE skew-join.
- `a < b` canonicalization + dropDuplicates before verification mirrors the
  reference's seen-id dedup (app/hash_detector.py:290-293) and keeps the
  expensive scoring stage minimal (SURVEY §4 "dedup before scoring").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dedup.config import DedupConfig
from dedup.normalize import normalize_url_udf


def band_buckets(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """signatures -> (url, band_id, band_hash), one row per band.

    Null signatures (degenerate docs) are excluded — the reference likewise
    skips candidates whose signature is None (app/hash_detector.py:280-281).
    """
    b, r = cfg.lsh_bands, cfg.lsh_rows
    bands = F.expr(
        f"transform(sequence(0, {b - 1}), i -> xxhash64(slice(minhash, i * {r} + 1, {r})))"
    )
    return (
        signatures
        .where(F.col("minhash").isNotNull())
        .select("url", F.posexplode(bands).alias("band_id", "band_hash"))
    )


def lsh_candidate_pairs(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Emit candidate pairs (a, b, match_source='lsh'), a < b, deduplicated.

    Two-phase, skew-aware:
      phase 1: bucket sizes via groupBy count (map-side combine, tiny rows);
      phase 2: small buckets -> all-pairs self-join; hot buckets -> star
               edges around the bucket-min url.
    """
    buckets = band_buckets(signatures, cfg)
    sizes = buckets.groupBy("band_id", "band_hash").count()

    keyed = buckets.join(sizes, ["band_id", "band_hash"])
    small = keyed.where(F.col("count") <= cfg.band_bucket_cap).drop("count")
    hot = keyed.where(F.col("count") > cfg.band_bucket_cap).drop("count")

    left = small.select("band_id", "band_hash", F.col("url").alias("a"))
    right = small.select("band_id", "band_hash", F.col("url").alias("b"))
    small_pairs = (
        left.join(right, ["band_id", "band_hash"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
    )

    hot_centers = hot.groupBy("band_id", "band_hash").agg(F.min("url").alias("a"))
    hot_pairs = (
        hot.join(hot_centers, ["band_id", "band_hash"])
        .where(F.col("url") != F.col("a"))
        .select("a", F.col("url").alias("b"))
    )

    return (
        small_pairs.unionByName(hot_pairs)
        .dropDuplicates(["a", "b"])
        .withColumn("match_source", F.lit("lsh"))
    )


def url_exact_pairs(corpus: DataFrame) -> DataFrame:
    """(a, b, match_source='url_exact'): documents whose normalized URLs
    collide (parity: app/hash_detector.py:249-266 — URL-exact matches score
    1.0 and bypass the similarity threshold).

    Honors an optional `redirect_url` column: a document's match keys are
    norm(url) plus norm(redirect_url) (reference compares candidates against
    both, app/hash_detector.py:251-261).
    """
    keys = corpus.select("url", normalize_url_udf(F.col("url")).alias("norm"))
    if "redirect_url" in corpus.columns:
        redirected = (
            corpus.where(F.col("redirect_url").isNotNull())
            .select("url", normalize_url_udf(F.col("redirect_url")).alias("norm"))
        )
        keys = keys.unionByName(redirected)
    keys = keys.where(F.col("norm").isNotNull())

    left = keys.select(F.col("norm"), F.col("url").alias("a"))
    right = keys.select(F.col("norm"), F.col("url").alias("b"))
    return (
        left.join(right, "norm")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
        .withColumn("match_source", F.lit("url_exact"))
    )


def simhash_prefilter(pairs: DataFrame, signatures: DataFrame,
                      cfg: DedupConfig) -> DataFrame:
    """Engine-mode optional prefilter: drop candidate pairs whose SimHash
    Hamming distance exceeds cfg.simhash_hamming_max. Native bit_count, no
    Python. NEVER applied in parity runs (the reference has no SimHash)."""
    sim = signatures.select("url", "simhash")
    pa = sim.select(F.col("url").alias("a"), F.col("simhash").alias("_sim_a"))
    pb = sim.select(F.col("url").alias("b"), F.col("simhash").alias("_sim_b"))
    return (
        pairs.join(pa, "a").join(pb, "b")
        .where(
            (F.col("match_source") == "url_exact")
            | (F.bit_count(F.col("_sim_a").bitwiseXOR(F.col("_sim_b")))
               <= cfg.simhash_hamming_max)
        )
        .drop("_sim_a", "_sim_b")
    )


def candidate_pairs(corpus: DataFrame, signatures: DataFrame,
                    cfg: DedupConfig,
                    use_simhash_prefilter: bool = False) -> DataFrame:
    """Full candidate set: LSH ∪ url_exact, url_exact winning on overlap
    (a url_exact pair scores 1.0 regardless of text, like the reference's
    short-circuit at app/hash_detector.py:263-266)."""
    lsh = lsh_candidate_pairs(signatures, cfg)
    if use_simhash_prefilter:
        lsh = simhash_prefilter(lsh, signatures, cfg)
    exact = url_exact_pairs(corpus)
    # left-anti the lsh side so overlapping pairs keep match_source=url_exact
    lsh_only = lsh.join(exact.select("a", "b"), ["a", "b"], "left_anti")
    return exact.unionByName(lsh_only)
