"""Metadata enrichment — DataFrame port of the reference's
`enrich_metadata_from_candidates` (app/main.py:251-386, operator M6).

The reference fills a request's missing title/description from a candidate
node that matches by normalized URL (preferred) or by exact lowercase title,
then re-searches. In the batch engine web pages carry full text, so this is
out of the hot path (SURVEY §2.4) — it exists as a tested transform for the
metadata-sparse mode: given a `sparse` table of records with possibly-missing
fields and a `reference_table` of complete records, fill ONLY the missing
fields (the reference never overwrites present ones, app/main.py:350-368).

Matching precedence mirrors the reference: url match first
(app/main.py:289-313), then exact lowercase-title match (app/main.py:315-334).
Placeholder values ("string", blank) count as missing (app/main.py:273-274).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from dedup.normalize import normalize_url_udf, valid_field_col


def enrich_from_reference(sparse: DataFrame, reference_table: DataFrame,
                          key_col: str = "record_id") -> DataFrame:
    """sparse(record_id, title, description, url) + reference(title,
    description, url) -> sparse with missing fields filled.

    Output adds `enrichment_source` ('url' | 'title' | null) naming the
    match rule that supplied values — the reference's EnrichmentInfo analog
    (app/models.py:514-518).
    """
    ref = (reference_table
           .select(F.col("title").alias("_r_title"),
                   F.col("description").alias("_r_description"),
                   normalize_url_udf(F.col("url")).alias("_r_norm_url"),
                   F.lower(F.trim(F.col("title"))).alias("_r_title_key"))
           .where(F.col("_r_norm_url").isNotNull()
                  | F.col("_r_title_key").isNotNull()))

    s = (sparse
         .withColumn("_norm_url", normalize_url_udf(F.col("url")))
         .withColumn("_title_key", F.lower(F.trim(F.col("title"))))
         .withColumn("_has_title", valid_field_col("title"))
         .withColumn("_has_description", valid_field_col("description")))

    needs = F.col("_has_title") & F.col("_has_description")

    # url-match enrichment (one deterministic match per record: min by title)
    url_matches = (
        s.where(~needs & F.col("_norm_url").isNotNull())
        .join(ref.where(F.col("_r_norm_url").isNotNull()),
              F.col("_norm_url") == F.col("_r_norm_url"))
    )
    # informative candidates first: Spark's ascending sort is nulls-FIRST,
    # so a bare orderBy would deterministically pick the least-informative
    # (null-field) reference row and discard fillable values
    w = Window.partitionBy(key_col).orderBy(
        F.col("_r_title").isNull(), F.col("_r_description").isNull(),
        "_r_title", "_r_description")
    url_matches = (url_matches.withColumn("_rn", F.row_number().over(w))
                   .where("_rn = 1")
                   .select(key_col, F.col("_r_title").alias("_u_title"),
                           F.col("_r_description").alias("_u_desc")))

    # title-match enrichment for records a url match did not resolve
    title_matches = (
        s.where(~needs & F.col("_has_title"))
        .join(ref.where(F.col("_r_title_key").isNotNull()),
              F.col("_title_key") == F.col("_r_title_key"))
    )
    title_matches = (title_matches.withColumn("_rn", F.row_number().over(w))
                     .where("_rn = 1")
                     .select(key_col, F.col("_r_title").alias("_t_title"),
                             F.col("_r_description").alias("_t_desc")))

    out = (s.join(url_matches, key_col, "left")
           .join(title_matches, key_col, "left"))
    fill_title = F.when(F.col("_has_title"), F.col("title")).otherwise(
        F.coalesce(F.col("_u_title"), F.col("_t_title"), F.col("title")))
    fill_desc = F.when(F.col("_has_description"), F.col("description")
                       ).otherwise(
        F.coalesce(F.col("_u_desc"), F.col("_t_desc"), F.col("description")))
    # provenance names the rule(s) whose values were actually APPLIED to a
    # missing field — 'url' alone would mislabel a description that the
    # coalesce drew from the title match because the url match's was null
    used_url = ((~F.col("_has_title") & F.col("_u_title").isNotNull())
                | (~F.col("_has_description") & F.col("_u_desc").isNotNull()))
    used_title = ((~F.col("_has_title") & F.col("_u_title").isNull()
                   & F.col("_t_title").isNotNull())
                  | (~F.col("_has_description") & F.col("_u_desc").isNull()
                     & F.col("_t_desc").isNotNull()))
    source = (F.when(needs, F.lit(None).cast("string"))
              .when(used_url & used_title, F.lit("url+title"))
              .when(used_url, F.lit("url"))
              .when(used_title, F.lit("title"))
              .otherwise(F.lit(None).cast("string")))
    return (out.withColumn("title", fill_title)
            .withColumn("description", fill_desc)
            .withColumn("enrichment_source", source)
            .select(key_col, "title", "description", "url",
                    "enrichment_source"))
