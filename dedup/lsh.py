"""LSH banding + candidate-pair generation.

Replaces the reference's remote-search candidate generation
(app/wlo_client.py:237-418) with corpus-self LSH: the MinHash signature is
split into b bands of r rows (b*r = num_hashes); each band is hashed to a
bucket key; documents sharing any (band_id, band_hash) bucket become
candidate pairs — the classic explode + groupBy plan from the north-star
spec. The norm_url group-join reproduces the reference's URL-exact
short-circuit (app/hash_detector.py:249-266) and doubles as a recall
backstop.

Scale design (the part that must survive 100 TB):
- banding carries ONLY (url, band_id, band_hash) through the shuffle — the
  wide minhash/shingle arrays never leave the signatures table (verification
  joins them back by key).
- band_hash is a native xxhash64 over the array slice: whole-stage codegen,
  no Python.
- pair emission is ONE groupBy collect_set per key with NATIVE in-group
  expansion (no self-join): all pairs for groups <= cap via a codegen
  transform/flatten; star edges around the group-min member for hot
  (boilerplate) groups — O(n) edges, cluster connectivity preserved; a pair
  missed inside one hot band has b-1 other bands plus the norm_url group.
  Hot keys come from a count pre-pass whose above-cap result is tiny and
  broadcast.
- `a < b` canonicalization + one dedup pass before verification mirrors the
  reference's seen-id dedup (app/hash_detector.py:290-293) and keeps the
  expensive scoring stage minimal (SURVEY §4 "dedup before scoring").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dedup.config import DedupConfig

# all-pairs expansion over the sorted members of one group: (i, j) with i < j
_PAIR_EXPANSION = (
    "flatten(transform(us, (x, i) -> "
    "transform(slice(us, i + 2, size(us) - i - 1), y -> struct(x as a, y as b))))"
)


def pairs_within_groups(members: DataFrame, key_cols: list[str],
                        cap: int, member_col: str = "url",
                        key_out: str | None = None) -> DataFrame:
    """(key..., member) -> (a, b) pairs within each key group, skew-aware.

    Groups with <= cap members emit all pairs via native expansion; hot
    groups emit star edges around their min member (connectivity-
    preserving). Output is NOT deduplicated across keys. With `key_out`,
    the first key column rides along on every pair (callers aggregate it to
    label pair provenance)."""
    m = members.select(*key_cols, F.col(member_col).alias("url"))
    hot_keys = (m.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n"))
                .where(F.col("n") > cap).drop("n")
                .withColumn("_hot", F.lit(True)))
    marked = m.join(F.broadcast(hot_keys), key_cols, "left")

    cold_groups = (marked.where(F.col("_hot").isNull())
                   .groupBy(*key_cols)
                   .agg(F.sort_array(F.collect_set("url")).alias("us"))
                   .where(F.size("us") > 1))
    cold_pairs = (cold_groups
                  .select(*key_cols,
                          F.explode(F.expr(_PAIR_EXPANSION)).alias("p"))
                  .select(*key_cols, "p.a", "p.b"))

    hot = marked.where(F.col("_hot").isNotNull())
    hot_centers = (hot.groupBy(*key_cols).agg(F.min("url").alias("a")))
    hot_pairs = (hot.join(F.broadcast(hot_centers), key_cols)
                 .where(F.col("url") != F.col("a"))
                 .select(*key_cols, "a", F.col("url").alias("b")))

    out = cold_pairs.unionByName(hot_pairs)
    if key_out:
        return out.select(F.col(key_cols[0]).alias(key_out), "a", "b")
    return out.select("a", "b")


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
    """Candidate pairs (a, b, match_source='lsh'), a < b, deduplicated
    across bands."""
    buckets = band_buckets(signatures, cfg)
    return (pairs_within_groups(buckets, ["band_id", "band_hash"],
                                cfg.band_bucket_cap)
            .dropDuplicates(["a", "b"])
            .withColumn("match_source", F.lit("lsh")))


def url_exact_pairs(signatures: DataFrame,
                    cap: int = 100_000) -> DataFrame:
    """(a, b, match_source='url_exact'): documents whose normalized URLs
    collide (parity: app/hash_detector.py:249-266 — URL-exact matches score
    1.0 and bypass the similarity threshold).

    Keys come straight off the signatures table (norm_url + norm_redirect,
    computed in the single Arrow pass — reference matches candidates against
    both the url and the redirect, app/hash_detector.py:251-261), so this
    stage is pure JVM: explode the two key columns, group, native pair
    expansion — one shuffle, no self-join, no Python. The cap only guards
    degenerate mega-URL groups; url_exact pairs all score 1.0, so star
    edges lose nothing but redundant edges.
    """
    keys = (signatures
            .select("url", F.explode(F.array_compact(
                F.array("norm_url", "norm_redirect"))).alias("norm"))
            .where(F.col("norm").isNotNull()))
    return (pairs_within_groups(keys, ["norm"], cap)
            .dropDuplicates(["a", "b"])
            .withColumn("match_source", F.lit("url_exact")))


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


def unified_group_keys(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(url, gk): ALL blocking keys in one scan — LSH band keys
    ('<band_id>:<band_hash>') for signed documents plus normalized-URL keys
    ('u:<norm>', exact strings — never hashed, so a url_exact pair can never
    be a hash collision) for every document incl. signature-less ones."""
    b, r = cfg.lsh_bands, cfg.lsh_rows
    band_keys = (
        f"CASE WHEN minhash IS NOT NULL THEN transform(sequence(0, {b - 1}), "
        f"i -> concat(i, ':', xxhash64(slice(minhash, i * {r} + 1, {r})))) "
        "ELSE array() END"
    )
    url_keys = (
        "concat("
        "CASE WHEN norm_url IS NOT NULL THEN array(concat('u:', norm_url)) "
        "ELSE array() END, "
        "CASE WHEN norm_redirect IS NOT NULL THEN "
        "array(concat('u:', norm_redirect)) ELSE array() END)"
    )
    return signatures.select(
        "url",
        F.explode(F.expr(f"concat({band_keys}, {url_keys})")).alias("gk"))


def candidate_pairs(signatures: DataFrame,
                    cfg: DedupConfig,
                    use_simhash_prefilter: bool = False) -> DataFrame:
    """Full candidate set: LSH ∪ url_exact in ONE key-emission pass — one
    signatures scan, one grouped pair-expansion shuffle, one labeling
    aggregation (instead of separate band and url subplans + a dedup
    window). A pair seen under any 'u:' key is url_exact and wins: it scores
    1.0 regardless of text, like the reference's short-circuit at
    app/hash_detector.py:263-266."""
    keys = unified_group_keys(signatures, cfg)
    tagged = pairs_within_groups(keys, ["gk"], cfg.band_bucket_cap,
                                 key_out="gk")
    pairs = (tagged.groupBy("a", "b")
             .agg(F.max(F.col("gk").startswith("u:")).alias("_exact"))
             .select("a", "b",
                     F.when(F.col("_exact"), F.lit("url_exact"))
                     .otherwise(F.lit("lsh")).alias("match_source")))
    if use_simhash_prefilter:
        pairs = simhash_prefilter(pairs, signatures, cfg)
    return pairs
