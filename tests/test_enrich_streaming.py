"""M6 enrichment transform + streaming ingest smoke tests."""

from __future__ import annotations

import time

from dedup.config import PARITY_CONFIG
from dedup.enrich import enrich_from_reference


class TestEnrich:
    def test_fill_missing_only(self, spark):
        sparse = spark.createDataFrame(
            [("r1", None, "has description", "https://www.a.com/x/"),
             ("r2", "string", None, "https://b.com/y"),
             ("r3", "Known Title", None, None),
             ("r4", "Full Title", "full description", "https://c.com/z"),
             ("r5", None, None, "https://nowhere.com/q")],
            "record_id string, title string, description string, url string")
        ref = spark.createDataFrame(
            [("Title A", "Desc A", "http://a.com/x"),
             ("Title B", "Desc B", "https://b.com/y"),
             ("known title", "Desc K", "https://k.com/k")],
            "title string, description string, url string")
        got = {r["record_id"]: r for r in
               enrich_from_reference(sparse, ref).collect()}

        # r1: url match fills title, keeps its own description
        assert got["r1"]["title"] == "Title A"
        assert got["r1"]["description"] == "has description"
        assert got["r1"]["enrichment_source"] == "url"
        # r2: placeholder title counts as missing; url match fills both
        assert got["r2"]["title"] == "Title B"
        assert got["r2"]["description"] == "Desc B"
        # r3: no url -> exact lowercase-title match fills description only
        assert got["r3"]["title"] == "Known Title"
        assert got["r3"]["description"] == "Desc K"
        assert got["r3"]["enrichment_source"] == "title"
        # r4: complete -> untouched, no source
        assert got["r4"]["title"] == "Full Title"
        assert got["r4"]["enrichment_source"] is None
        # r5: nothing matches -> unchanged nulls
        assert got["r5"]["title"] is None
        assert got["r5"]["enrichment_source"] is None


class TestStreaming:
    def test_stateful_candidate_pairs_across_batches(self, spark, tmp_path):
        """Custom stateful operator (applyInPandasWithState): a duplicate
        arriving in a LATER file drop must pair with the original seen in an
        earlier drop — the bucket membership lives in checkpointed state."""
        from dedup.streaming import run_stream_candidate_pairs
        from dedup.synth import corpus_pdf

        pdf = corpus_pdf(80, seed=33)
        # cross-batch planted duplicate: row 45 (drop 2) = text of row 5 (drop 1)
        pdf.loc[45, "text"] = pdf.loc[5, "text"]
        cols = ["url", "warc_ts", "html", "text", "lang"]
        src = tmp_path / "incoming"
        src.mkdir()
        ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "pairs")

        spark.createDataFrame(pdf.iloc[:40][cols]).coalesce(1) \
            .write.mode("append").parquet(str(src))
        q = run_stream_candidate_pairs(spark, str(src), ckpt, out,
                                       PARITY_CONFIG)
        q.awaitTermination(120)

        spark.createDataFrame(pdf.iloc[40:][cols]).coalesce(1) \
            .write.mode("append").parquet(str(src))
        q = run_stream_candidate_pairs(spark, str(src), ckpt, out,
                                       PARITY_CONFIG)
        q.awaitTermination(120)

        pairs = spark.read.parquet(out)
        a, b = sorted([pdf.loc[5, "url"], pdf.loc[45, "url"]])
        cross = pairs.where((pairs.a == a) & (pairs.b == b))
        assert cross.count() >= 1
        # identical text -> every band collides -> 'lsh' provenance
        assert {r["match_source"] for r in cross.collect()} == {"lsh"}

    def test_file_stream_dedup_signatures(self, spark, tmp_path, detector):
        import numpy as np

        from dedup.streaming import run_file_stream_dedup
        from dedup.synth import corpus_pdf

        pdf = corpus_pdf(80, seed=31)
        src = tmp_path / "incoming"
        src.mkdir()
        # two drops; second re-delivers the first 20 urls (late duplicates)
        spark.createDataFrame(
            pdf[["url", "warc_ts", "html", "text", "lang"]]
        ).write.mode("overwrite").parquet(str(src))
        q = run_file_stream_dedup(
            spark, str(src), str(tmp_path / "ckpt"), str(tmp_path / "out"),
            PARITY_CONFIG)
        q.awaitTermination(120)
        out = spark.read.parquet(str(tmp_path / "out"))
        n_unique = pdf["url"].nunique()
        assert out.count() == n_unique
        # spot-check signature parity through the streaming path
        row = out.where("minhash is not null").orderBy("url").first()
        text = pdf.set_index("url").loc[row["url"], "text"]
        if isinstance(text, str):
            expect = detector.compute_text_signature(text)
            np.testing.assert_array_equal(
                np.array(row["minhash"], dtype=np.float64), expect)


class TestWindowedCounts:
    def test_watermarked_window_finalizes_and_drops_late(self, spark,
                                                         tmp_path):
        """Append-mode windowed agg: a window emits once its end passes
        the watermark, and a row later than the watermark is DROPPED (the
        late-data contract)."""
        import datetime as dt

        from dedup.streaming import stream_windowed_counts

        def ts(h, m=0):
            return dt.datetime(2026, 1, 1, h, m)

        src = tmp_path / "src"
        src.mkdir()
        ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
        schema = "url string, warc_ts timestamp, lang string"

        def run_drop(rows, name):
            spark.createDataFrame(rows, schema).coalesce(1) \
                .write.parquet(str(tmp_path / name))
            import glob
            import shutil
            part = glob.glob(str(tmp_path / name / "part-*.parquet"))[0]
            shutil.copy(part, str(src / f"{name}.parquet"))
            q = (stream_windowed_counts(
                spark.readStream.schema(schema).parquet(str(src)),
                watermark="30 minutes", window="1 hour")
                .writeStream.format("parquet")
                .option("path", out).option("checkpointLocation", ckpt)
                .outputMode("append").trigger(availableNow=True).start())
            q.awaitTermination(120)

        # drop 1: two full hours of data; watermark advances to 11:30
        run_drop([(f"u{i}", ts(9, 5 * i), "en") for i in range(4)]
                 + [("v0", ts(10, 10), "de"), ("w0", ts(12, 0), "en")],
                 "d1")
        # drop 2: a LATE row at 9:40 (before watermark 11:30) must be
        # dropped; a fresh 12:30 row keeps the 12:00 window open
        run_drop([("late", ts(9, 40), "en"), ("x0", ts(12, 30), "en")],
                 "d2")
        got = {(r["win_start"].hour, r["lang"]): r["n_docs"]
               for r in spark.read.parquet(out).collect()}
        # 9:00 and 10:00 windows finalized with drop-1 counts only
        assert got[(9, "en")] == 4
        assert got[(10, "de")] == 1
        # the 12:00 window has not finalized (watermark <= its end)
        assert (12, "en") not in got


class TestStreamingStateTTL:
    def test_window_expiry_drops_stale_members_and_repairs(self, spark,
                                                           tmp_path):
        """With state_ttl_ms set, bucket membership is a rolling window:
        a duplicate arriving AFTER the window expired does NOT pair with the
        stale member (it re-seeds the bucket), and a further duplicate
        arriving WITHIN the new window pairs normally — eviction is
        recoverable. (Engine-timeout row eviction is blocked by an upstream
        PySpark bug, see tools/repro_state_timeout_bug.py; member lists are
        still TTL-bounded.)"""
        import time

        from dedup.streaming import run_stream_candidate_pairs
        from dedup.synth import corpus_pdf

        pdf = corpus_pdf(12, seed=44)
        cols = ["url", "warc_ts", "html", "text", "lang"]
        src = tmp_path / "incoming"
        src.mkdir()
        ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "pairs")
        ttl = 8000

        def drop(frame):
            spark.createDataFrame(frame[cols]).coalesce(1) \
                .write.mode("append").parquet(str(src))
            q = run_stream_candidate_pairs(spark, str(src), ckpt, out,
                                           PARITY_CONFIG, state_ttl_ms=ttl)
            q.awaitTermination(120)

        drop(pdf.iloc[:10])              # originals seed their buckets
        time.sleep(12.0)                 # > ttl: every bucket expires

        # two duplicates of doc 1 arrive together AFTER expiry: the stale
        # original must not pair; the re-seeded bucket pairs them with
        # each other
        dups = pdf.iloc[[1, 1]].copy()
        dups["url"] = ["https://late.example.org/dup-a",
                       "https://late.example.org/dup-b"]
        drop(dups)

        pairs = spark.read.parquet(out)
        late = pairs.where("a LIKE 'https://late%' OR b LIKE 'https://late%'")
        got = {(r["a"], r["b"]) for r in late.collect()}
        # no pair reaches back across the expired window...
        assert all("late" in a and "late" in b for a, b in got), got
        # ...and the re-seeded bucket pairs the fresh arrivals
        assert ("https://late.example.org/dup-a",
                "https://late.example.org/dup-b") in got


class TestEnrichSelection:
    def test_informative_candidate_preferred_over_null_fields(self, spark):
        """Among several url-matched reference rows the one WITH values
        must win — Spark's nulls-first ascending sort otherwise picks the
        null-field candidate and discards fillable values (round-5 review
        finding)."""
        sparse = spark.createDataFrame(
            [("r1", None, None, "https://www.site.com/p")],
            "record_id string, title string, description string, url string")
        ref = spark.createDataFrame(
            [(None, "x-desc", "https://site.com/p"),
             ("Real Title", "y-desc", "https://site.com/p/")],
            "title string, description string, url string")
        got = {r["record_id"]: r for r in
               enrich_from_reference(sparse, ref).collect()}
        assert got["r1"]["title"] == "Real Title"
        assert got["r1"]["description"] == "y-desc"
        assert got["r1"]["enrichment_source"] == "url"

    def test_mixed_rule_fill_labels_both_sources(self, spark):
        """Description drawn from the title rule because the url match's
        was null must not be labeled plain 'url' — provenance names every
        rule that actually supplied an applied value."""
        sparse = spark.createDataFrame(
            [("r1", "Known Title", None, "https://www.only.com/a")],
            "record_id string, title string, description string, url string")
        ref = spark.createDataFrame(
            [("U-title", None, "https://only.com/a"),
             ("known title", "T-desc", "https://elsewhere.com/b")],
            "title string, description string, url string")
        got = {r["record_id"]: r for r in
               enrich_from_reference(sparse, ref).collect()}
        # record HAS a title; only description is missing. url match can't
        # fill it (null desc), title match can -> source is 'title'
        assert got["r1"]["description"] == "T-desc"
        assert got["r1"]["enrichment_source"] == "title"
