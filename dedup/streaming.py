"""Structured Streaming surface (engine extra).

The reference and the north rule are batch-only (SURVEY §2.5: no watermarks,
no state). This module exists because a production ingest pipeline usually
lands crawl batches continuously: it provides the streaming equivalents of
the first pipeline stages so the batch engine's tables can be maintained
incrementally.

- `stream_signatures`: readStream-compatible transform — the same single
  Arrow pass as the batch signatures stage (mapInPandas works unchanged on
  streaming DataFrames).
- `stream_exact_dedup`: drop exact-duplicate urls within a watermark via
  dropDuplicatesWithinWatermark (state-bounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dedup.config import DedupConfig
from dedup.signature import signatures_table


def stream_signatures(stream_corpus: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Streaming corpus(url, warc_ts, text) -> streaming signatures rows.
    Append-mode friendly: stateless per-row transform."""
    return signatures_table(stream_corpus, cfg)


def stream_exact_dedup(stream_corpus: DataFrame,
                       watermark: str = "1 hour",
                       key: str = "url") -> DataFrame:
    """Keep the first occurrence per key within the watermark window —
    bounded state, late rows beyond the watermark are dropped by the engine.
    """
    return (stream_corpus
            .withWatermark("warc_ts", watermark)
            .dropDuplicatesWithinWatermark([key]))


def run_file_stream_dedup(spark, source_dir: str, checkpoint_dir: str,
                          output_dir: str, cfg: DedupConfig,
                          schema: str = ("url string, warc_ts timestamp, "
                                         "html binary, text string, "
                                         "lang string")):
    """File-source ingest: watch a directory of parquet drops, dedup
    exact urls within the watermark, append signatures to `output_dir`.
    Returns the StreamingQuery (caller stops it)."""
    src = (spark.readStream.schema(schema).parquet(source_dir))
    deduped = stream_exact_dedup(src, watermark="30 minutes")
    sigs = stream_signatures(deduped.select("url", "text"), cfg)
    return (sigs.writeStream
            .format("parquet")
            .option("path", output_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start())
