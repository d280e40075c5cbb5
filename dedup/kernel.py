"""Per-query detection kernel — DataFrame reimplementation of the
reference's `find_duplicates` (app/hash_detector.py:167-318, operator T9).

Given one source document's metadata and a DataFrame of candidate nodes
(the reference's remote-search results, modeled as rows with the raw
edu-sharing property map), produce the same duplicates list and per-field
max-similarity stats. This is the `dedupe_one` query mode (SURVEY §3.4):
the source row is a broadcast scalar; candidates are the distributed side.

Decomposition (SURVEY §2.1 T9a-T9h):
  T9a  source text assembly from valid fields         (:189-207)
  T9b  candidate field extraction w/ key precedence   (:223-247)
  T9c  URL-exact short-circuit, threshold bypass      (:249-266, :295-297)
  T9d  candidate signature + cosine scoring           (:268-284)
  T9e  per-field max similarity (pre-dedup, 4 dp)     (:286-288, :307-309)
  T9f  first-occurrence dedup across fields           (:211-214, :290-293)
  T9g  threshold filter                               (:295-305)
  T9h  stable desc sort                               (:311-312)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import DoubleType

from dedup.coeffs import load_coeffs
from dedup.config import DedupConfig
from dedup.normalize import is_valid_field, normalize_url
from dedup.signature import compute_text_signature
from dedup.verify import cosine_similarity

# candidate DataFrame contract: one row per (search_field, candidate) in
# request order. field_priority = index of the field in the request's
# search_fields list; candidate_seq = position within that field's result
# list. Together they encode the Python dict/list insertion order the
# reference's seen-id dedup depends on (T9f).
CANDIDATE_COLUMNS = ("search_field", "field_priority", "candidate_seq",
                     "node_id", "properties")

# key precedence for candidate field extraction (hash_detector.py:229-247)
_TITLE_KEYS = ("cclom:title", "cm:name")
_DESC_KEYS = ("cclom:general_description",)
_URL_KEYS = ("ccm:wwwurl", "cclom:location")


@dataclass
class SourceMetadata:
    title: str | None = None
    description: str | None = None
    url: str | None = None
    redirect_url: str | None = None


def _require_shingles(signatures: DataFrame) -> None:
    """scoring='jaccard' needs real shingle arrays. A parity-slim table
    still carries the column (all null, keep_shingles=False), so probe one
    signed row — silently-empty results would otherwise masquerade as
    'no duplicates'."""
    if "shingles" not in signatures.columns:
        raise ValueError(
            "scoring='jaccard' needs a signatures table with shingle "
            "arrays (build it under an engine config / keep_shingles=True)")
    probe = (signatures.where(F.col("minhash").isNotNull())
             .select("shingles").first())
    if probe is None:
        return  # no signed rows at all — nothing to score, not a slim table
    if probe["shingles"] is None:
        raise ValueError(
            "scoring='jaccard' needs a signatures table with shingle "
            "arrays (build it under an engine config / keep_shingles=True)")


def _precedence_extract(props_col, keys: tuple[str, ...]):
    """First-present-KEY extraction: a present key with a null/empty value
    STOPS the chain (the reference `break`s on key presence, not on value
    validity — hash_detector.py:229-232). F.get returns NULL out-of-bounds
    (ANSI-safe, unlike element_at)."""
    expr = F.lit(None).cast("string")
    for key in reversed(keys):
        expr = F.when(F.map_contains_key(props_col, F.lit(key)),
                      F.get(props_col.getItem(key), 0)).otherwise(expr)
    return expr


def find_duplicates(source: SourceMetadata, candidates: DataFrame,
                    cfg: DedupConfig | None = None,
                    threshold: float | None = None,
                    ) -> tuple[DataFrame, DataFrame]:
    """-> (duplicates, field_max) DataFrames.

    duplicates: node_id, title, description, url, similarity_score,
                match_source — sorted by similarity desc (ties broken by
                arrival order: the reference's sort is stable, T9h).
    field_max:  search_field, max_similarity (rounded 4 dp; one row per
                field that had candidates, T9e).
    """
    cfg = cfg or DedupConfig()
    # reference quirk, replicated deliberately: `threshold or default`
    # (app/hash_detector.py:187) treats 0.0 as "unset" and silently uses the
    # default 0.9 — so does this kernel.
    threshold = threshold or cfg.threshold
    spark = candidates.sparkSession

    # --- T9a: source text from valid fields only (driver-side scalars)
    has_title = is_valid_field(source.title)
    has_description = is_valid_field(source.description)
    parts = []
    if has_title:
        parts.append(source.title)
    if has_description:
        parts.append(source.description)
    A, B = load_coeffs(cfg.num_hashes, cfg.seed)
    source_sig = compute_text_signature(" ".join(parts), A, B, cfg)
    if source_sig is None:
        empty_dups = spark.createDataFrame(
            [], "node_id string, title string, description string, "
                "url string, similarity_score double, match_source string")
        empty_max = spark.createDataFrame(
            [], "search_field string, max_similarity double")
        return empty_dups, empty_max

    src_norm_url = normalize_url(source.url)
    src_norm_redirect = (normalize_url(source.redirect_url)
                         if source.redirect_url else None)
    src_sig_f64 = source_sig.astype(np.float64)

    # --- T9b: candidate field extraction with key precedence
    c = (candidates
         .where(F.col("node_id").isNotNull() & (F.col("node_id") != ""))
         .withColumn("title", _precedence_extract(F.col("properties"), _TITLE_KEYS))
         .withColumn("description", _precedence_extract(F.col("properties"), _DESC_KEYS))
         .withColumn("url", _precedence_extract(F.col("properties"), _URL_KEYS)))

    # --- T9c: URL-exact match (vs source url AND redirect_url)
    @F.pandas_udf("boolean")
    def url_match_udf(urls: pd.Series) -> pd.Series:
        def match(u):
            n = normalize_url(u)
            if not n:
                return False
            return bool((src_norm_url and n == src_norm_url)
                        or (src_norm_redirect and n == src_norm_redirect))
        return urls.map(match)

    # --- T9d: candidate text from the SAME field subset as the source,
    # then cosine vs the broadcast source signature. A candidate field
    # contributes only if source has it AND the candidate value is truthy
    # (reference `if has_title and title:` — hash_detector.py:271-274).
    @F.pandas_udf(DoubleType())
    def score_udf(titles: pd.Series, descriptions: pd.Series) -> pd.Series:
        out = []
        for t, d in zip(titles, descriptions):
            parts = []
            if has_title and t:
                parts.append(t)
            if has_description and d:
                parts.append(d)
            sig = compute_text_signature(" ".join(parts), A, B, cfg)
            if sig is None:
                out.append(None)  # reference skips this candidate (:280-281)
            else:
                out.append(cosine_similarity(src_sig_f64,
                                             sig.astype(np.float64)))
        return pd.Series(out, dtype="float64")

    scored = (
        c.withColumn("url_match", url_match_udf(F.col("url")))
        .withColumn(
            "similarity",
            F.when(F.col("url_match"), F.lit(1.0))
            .otherwise(score_udf(F.col("title"), F.col("description"))))
        .withColumn(
            "match_source",
            F.when(F.col("url_match"), F.lit("url_exact"))
            .otherwise(F.col("search_field")))
    )

    # --- T9e: per-field max BEFORE dedup; sig-None rows excluded; fields
    # that returned candidates but produced no score report 0.0
    field_max = (
        candidates.groupBy("search_field", "field_priority")
        .agg(F.count(F.lit(1)).alias("_n"))
        .join(
            scored.groupBy("search_field")
            .agg(F.max("similarity").alias("_max")),
            "search_field", "left")
        .select(
            "search_field",
            F.round(F.coalesce(F.col("_max"), F.lit(0.0)), 4)
            .alias("max_similarity"),
            "field_priority")
        .orderBy("field_priority")
        .drop("field_priority")
    )

    # --- T9f/T9g/T9h: first-occurrence dedup, threshold, stable sort
    w = Window.partitionBy("node_id").orderBy("field_priority", "candidate_seq")
    duplicates = (
        scored.where(F.col("similarity").isNotNull())
        .withColumn("_rank", F.row_number().over(w))
        .where(F.col("_rank") == 1)
        .where(F.col("url_match") | (F.col("similarity") >= F.lit(threshold)))
        .select(
            "node_id", "title", "description", "url",
            F.round(F.col("similarity"), 4).alias("similarity_score"),
            "match_source", "field_priority", "candidate_seq")
        .orderBy(F.desc("similarity_score"), F.asc("field_priority"),
                 F.asc("candidate_seq"))
        .drop("field_priority", "candidate_seq")
    )
    return duplicates, field_max


def dedupe_metadata(signatures: DataFrame, source: SourceMetadata,
                    cfg: DedupConfig | None = None,
                    threshold: float | None = None,
                    key_index: DataFrame | None = None,
                    scoring: str | None = None) -> DataFrame:
    """Ad-hoc by-metadata query at corpus scale — the reference's
    `/detect/hash/by-metadata` (app/main.py:534-613): the source document is
    NOT in the corpus; its signature and blocking keys are computed
    driver-side from the given title/description/url (T9a semantics:
    valid fields only), candidates come from the same band-key/url-key
    semi-join as `dedupe_one`, and scoring is the reference cosine against
    the broadcast source signature.

    Returns (node_url, similarity, match_source) like `dedupe_one`.

    `scoring` mirrors dedupe_one: None/"cosine" (default) keeps the
    reference cosine decision; "jaccard" scores candidates by exact
    Jaccard of their shingle arrays against the source's shingle set
    (computed driver-side) and thresholds on cfg.jaccard_threshold —
    the similarity column then carries the Jaccard."""
    from dedup.local_oracle import xxh64_band_key
    from dedup.lsh import unified_group_keys
    from dedup.normalize import description_block_key, title_block_keys
    from dedup.signature import _shingle_array, tokenize
    from dedup.verify import cosine_similarity

    cfg = cfg or DedupConfig()
    use_jaccard = scoring == "jaccard"
    if use_jaccard:
        _require_shingles(signatures)
    # an explicit threshold of 0.0 means "keep everything" here (engine
    # API); only the parity kernel find_duplicates replicates the
    # reference's `threshold or default` quirk (app/hash_detector.py:187)
    if threshold is None:
        threshold = cfg.jaccard_threshold if use_jaccard else cfg.threshold
    spark = signatures.sparkSession

    has_title = is_valid_field(source.title)
    has_description = is_valid_field(source.description)
    parts = ([source.title] if has_title else []) + \
        ([source.description] if has_description else [])
    A, B = load_coeffs(cfg.num_hashes, cfg.seed)
    src_sig = compute_text_signature(" ".join(parts), A, B, cfg)
    src_norms = {n for n in (normalize_url(source.url),
                             normalize_url(source.redirect_url)
                             if source.redirect_url else None) if n}
    # metadata blocking keys (reference title / description-prefix
    # candidate searches, app/wlo_client.py:265-311) — only useful when the
    # corpus signatures carry the matching key columns
    txt_keys: list[str] = []
    if "title_keys" in signatures.columns:
        txt_keys = [f"t:{k}" for k in title_block_keys(source.title)]
        d = description_block_key(source.description)
        if d is not None:
            txt_keys.append(f"d:{d}")
    if src_sig is None and not src_norms and not txt_keys:
        return spark.createDataFrame(
            [], "node_url string, similarity double, match_source string")

    band_keys: list[int] = []
    if src_sig is not None:
        b, r = cfg.lsh_bands, cfg.lsh_rows
        band_keys = [xxh64_band_key(i, src_sig[i * r:(i + 1) * r])
                     for i in range(b)]
    from dedup.lsh import key_rank_col, match_source_from_rank
    keys = (key_index if key_index is not None
            else unified_group_keys(signatures, cfg))
    cands = (keys
             .where(F.col("gk_band").isin(band_keys)
                    | F.col("gk_url").isin(sorted(src_norms))
                    | F.col("gk_txt").isin(txt_keys))
             .groupBy("url")
             .agg(F.min(key_rank_col()).alias("_rank")))

    src_sig_f64 = (src_sig.astype(np.float64)
                   if src_sig is not None else None)

    @F.pandas_udf(DoubleType())
    def cos_udf(minhashes: pd.Series) -> pd.Series:
        out = []
        for mh in minhashes:
            if mh is None or src_sig_f64 is None:
                out.append(None)
            else:
                out.append(cosine_similarity(
                    src_sig_f64, np.asarray(mh, dtype=np.float64)))
        return pd.Series(out, dtype="float64")

    if use_jaccard:
        # same shingling as signatures_table (signature._shingle_array) so
        # the driver-side source set can't drift from the stored arrays;
        # values are < 2^32 so the int64 view is lossless
        words = tokenize(" ".join(parts))
        src_sh = (np.sort(_shingle_array(words, cfg).astype(np.int64))
                  if words else np.empty(0, dtype=np.int64))

        @F.pandas_udf(DoubleType())
        def jac_udf(shingle_arrays: pd.Series,
                    minhashes: pd.Series) -> pd.Series:
            out = []
            for sh, mh in zip(shingle_arrays, minhashes):
                if sh is None:
                    if mh is not None:
                        # signed row without shingles = mixed signatures
                        # table (ADVICE: the guard's single-row probe can
                        # miss these) — fail loudly, a silent None here
                        # masquerades as 'no duplicates'
                        raise ValueError(
                            "scoring='jaccard' hit a signed candidate "
                            "with NULL shingles — the signatures table "
                            "mixes keep_shingles=False rows; rebuild it "
                            "under one engine config")
                    out.append(None)
                    continue
                if src_sh.size == 0:
                    out.append(None)
                    continue
                # stored shingles are int32 bit patterns of uint32 hashes
                cand = np.asarray(sh, dtype=np.int64) & 0xFFFFFFFF
                idx = np.searchsorted(src_sh, cand)
                np.minimum(idx, src_sh.size - 1, out=idx)
                inter = int(np.count_nonzero(src_sh[idx] == cand))
                union = cand.size + src_sh.size - inter
                out.append(inter / union if union else 0.0)
            return pd.Series(out, dtype="float64")

        joined = cands.join(
            signatures.select("url", "shingles", "minhash"), "url")
        if src_sig is not None:
            # MinHash-estimate prefilter against the broadcast source
            # signature — the same native equal-component cut verify_pairs
            # applies BEFORE the shingle join, so the two per-document CLI
            # modes share one keep machinery and by-metadata stops paying
            # the full shingle-join cost the prefilter was built to avoid.
            # Rank-0 (url_exact) candidates bypass scoring and the cut;
            # the cut derives from the CALLER'S effective threshold, so an
            # explicit low threshold (0.0 = 'keep everything') relaxes the
            # prefilter with it instead of silently hiding candidates.
            from dedup.config import minhash_prefilter_min_equal
            min_eq = minhash_prefilter_min_equal(cfg, threshold=threshold)
            src_arr = F.array(*[F.lit(float(x)) for x in src_sig])
            est = F.size(F.filter(
                F.zip_with(F.col("minhash"), src_arr,
                           lambda x, y: x == y), lambda v: v))
            # NULL-shingle rows bypass the cut so they always reach
            # jac_udf's mixed-table ValueError — otherwise a slim row
            # whose estimate falls below min_eq would be dropped silently,
            # the exact failure the guard exists to make loud
            joined = joined.where(
                (F.col("_rank") == 0) | F.col("shingles").isNull()
                | (est >= F.lit(min_eq)))
        score_expr = jac_udf("shingles", "minhash")
    else:
        joined = cands.join(signatures.select("url", "minhash"), "url")
        score_expr = cos_udf("minhash")
    scored = joined.select(
        F.col("url").alias("node_url"),
        F.when(F.col("_rank") == 0, F.lit(1.0))
        .otherwise(score_expr).alias("similarity"),
        match_source_from_rank(F.col("_rank")).alias("match_source"))
    return (scored
            .where(F.col("similarity").isNotNull())
            .where((F.col("match_source") == "url_exact")
                   | (F.col("similarity") >= F.lit(threshold)))
            .select("node_url", F.round("similarity", 4).alias("similarity"),
                    "match_source")
            .orderBy(F.desc("similarity"), F.asc("node_url")))


def build_candidate_stats(search_info: DataFrame,
                          field_max: DataFrame) -> DataFrame:
    """M3 stats assembly (reference app/main.py:178-204): per-field search
    stats with search_value truncated to 80 chars and normalized_value to
    50, left-joined with the kernel's per-field max similarity (T9e).

    search_info columns: search_field, search_value, normalized_value,
    candidates_found. Output adds max_similarity (null when the field
    produced no scored candidates — the reference omits the key).

    Truncation is the reference's display form exactly: values LONGER than
    the limit become the first `limit` chars + '...' (main.py:185,192);
    values at or under the limit pass through unchanged."""
    def _trunc(col: str, limit: int):
        c = F.col(col)
        return (F.when(F.length(c) > limit,
                       F.concat(F.substring(c, 1, limit), F.lit("...")))
                .otherwise(c).alias(col))

    truncated = search_info.select(
        "search_field",
        _trunc("search_value", 80),
        _trunc("normalized_value", 50),
        F.col("candidates_found").cast("int").alias("candidates_found"))
    return truncated.join(
        field_max.select("search_field", "max_similarity"),
        "search_field", "left")


def dedupe_one(signatures: DataFrame, url: str,
               cfg: DedupConfig | None = None,
               key_index: DataFrame | None = None,
               scoring: str | None = None) -> DataFrame:
    """Per-key corpus query — the reference's `/detect/hash/by-node`
    (app/main.py:499-531) against the corpus signatures table: point-lookup
    the source row, restrict candidates to documents sharing any LSH band
    key or normalized-URL key with it (the band-key semi-join replaces the
    reference's remote candidate search, SURVEY §3.4), score with the
    reference cosine kernel, and exclude the source itself
    (app/wlo_client.py:377-381 semantics).

    Returns (node_url, similarity, match_source) for candidates that are
    url_exact or score >= threshold, similarity rounded to 4 dp like the
    reference boundary (app/hash_detector.py:303).

    Scale shape: the source's ~b+2 keys are computed driver-side from the
    single collected row (band hashes via the same xxHash64 the executors
    use) and pushed into a key-list filter over the exploded key table —
    one scan, no join against the full signatures table carries arrays.
    Pass `key_index` (the persisted inverted key table built by
    DedupPipeline.run(build_key_index=True) — range-partitioned and sorted
    by key, so the IN-list filter prunes parquet row groups via min/max
    stats) to skip re-exploding the signatures per query; without it the
    keys are derived on the fly.

    `scoring` picks the keep semantics: None/"cosine" (default) is the
    reference cosine decision regardless of cfg.scoring, so the two
    per-document CLI modes stay consistent under --engine-mode;
    "jaccard" opts into engine exact-Jaccard keep semantics (requires a
    signatures table that kept the shingle arrays) and then the returned
    `similarity` column carries the exact Jaccard, rounded to 4 dp.
    """
    from dataclasses import replace

    from dedup.local_oracle import xxh64_band_key
    from dedup.lsh import (key_rank_col, match_source_from_rank,
                           unified_group_keys)
    from dedup.verify import verify_pairs

    cfg = cfg or DedupConfig()
    # project the source row down to the key-derivation columns before the
    # collect — the full row would drag the shingle array (the widest
    # column by far) to the driver just to be ignored
    src_cols = ["minhash", "norm_url", "norm_redirect"]
    if "title_keys" in signatures.columns:
        src_cols += ["title_keys", "desc_key"]
    src_rows = (signatures.where(F.col("url") == url)
                .select(*src_cols).collect())
    if not src_rows:
        return signatures.sparkSession.createDataFrame(
            [], "node_url string, similarity double, match_source string")
    src = src_rows[0]

    band_keys: list[int] = []
    if src["minhash"] is not None:
        b, r = cfg.lsh_bands, cfg.lsh_rows
        mh = src["minhash"]
        band_keys = [xxh64_band_key(i, mh[i * r:(i + 1) * r])
                     for i in range(b)]
    url_keys = sorted({n for n in (src["norm_url"], src["norm_redirect"])
                       if n is not None})
    txt_keys: list[str] = []
    if "title_keys" in signatures.columns:
        txt_keys = [f"t:{k}" for k in (src["title_keys"] or [])]
        if src["desc_key"] is not None:
            txt_keys.append(f"d:{src['desc_key']}")

    keys = (key_index if key_index is not None
            else unified_group_keys(signatures, cfg))
    cands = (keys
             .where(F.col("gk_band").isin(band_keys)
                    | F.col("gk_url").isin(url_keys)
                    | F.col("gk_txt").isin(txt_keys))
             .where(F.col("url") != url)
             .groupBy("url")
             .agg(F.min(key_rank_col()).alias("_rank")))
    pairs = cands.select(
        F.lit(url).alias("a"), F.col("url").alias("b"),
        match_source_from_rank(F.col("_rank")).alias("match_source"))
    # keep-decision DEFAULTS to reference cosine regardless of engine
    # scoring mode — dedupe_metadata filters by cosine too, so the two
    # per-document query modes stay consistent under --engine-mode; an
    # explicit scoring="jaccard" opts both modes into exact-Jaccard keeps
    use_jaccard = scoring == "jaccard"
    if use_jaccard:
        _require_shingles(signatures)
    verified = verify_pairs(
        pairs, signatures,
        replace(cfg, scoring="jaccard" if use_jaccard else "cosine")
    ).where("keep")
    score_col = "jaccard" if use_jaccard else "similarity"
    return (verified.select(
        F.col("b").alias("node_url"),
        F.round(score_col, 4).alias("similarity"),
        "match_source")
        .orderBy(F.desc("similarity"), F.asc("node_url")))


def candidates_df_from_pools(spark, pools: dict[str, list[dict]]) -> DataFrame:
    """Build the candidate DataFrame from the reference's candidate-pool
    shape (Dict[search_field, List[node-dict]], app/wlo_client.py:243) —
    used by parity tests and the compat API."""
    rows = []
    for prio, (field, nodes) in enumerate(pools.items()):
        for seq, node in enumerate(nodes):
            ref = node.get("ref") or {}
            props_in = node.get("properties") or {}
            props = {
                k: [str(x) for x in v] if isinstance(v, list) else [str(v)]
                for k, v in props_in.items()
            }
            rows.append((field, prio, seq, ref.get("id"), props))
    return spark.createDataFrame(
        rows,
        "search_field string, field_priority int, candidate_seq long, "
        "node_id string, properties map<string, array<string>>")
