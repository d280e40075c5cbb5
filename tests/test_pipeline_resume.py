"""Pipeline checkpoint/resume (SURVEY §5.7): interrupting after an early
stage and re-running must (a) skip the completed stages, (b) produce final
tables identical to an uninterrupted run; a config change must invalidate
all checkpoints (content-addressed job key)."""

from __future__ import annotations

from dataclasses import replace

import pytest

from dedup.config import PARITY_CONFIG
from dedup.pipeline import DedupPipeline, dedupe_corpus
from dedup.synth import corpus_pdf


@pytest.fixture(scope="module")
def corpus_df(spark):
    pdf = corpus_pdf(150, seed=21)
    return spark.createDataFrame(
        pdf[["url", "warc_ts", "html", "text", "lang"]]).cache()


def _clusters(tables):
    return sorted((r["url"], r["cluster_id"])
                  for r in tables["clusters"].collect())


class TestResume:
    def test_interrupt_and_resume(self, spark, corpus_df, tmp_path):
        wd = str(tmp_path / "job")

        # fresh full run for the expected result
        full = dedupe_corpus(spark, corpus_df, str(tmp_path / "ref"),
                             PARITY_CONFIG)
        expect = _clusters(full)

        # simulate a crash after 'signatures': run fully, then erase the
        # lineage manifests of the later stages (their outputs may be
        # partial/absent after a real crash; missing manifest = not done)
        dedupe_corpus(spark, corpus_df, wd, PARITY_CONFIG)
        for stage in ("pairs", "verified", "clusters"):
            (tmp_path / "job" / "_lineage" / f"{stage}.json").unlink()

        p2 = DedupPipeline(spark, wd, PARITY_CONFIG)
        tables = p2.run(corpus_df)
        skipped = {s.name for s in p2.stage_infos if s.skipped}
        assert skipped == {"signatures"}
        assert _clusters(tables) == expect

    def test_config_change_invalidates(self, spark, corpus_df, tmp_path):
        wd = str(tmp_path / "job2")
        dedupe_corpus(spark, corpus_df, wd, PARITY_CONFIG)
        cfg2 = replace(PARITY_CONFIG, threshold=0.95)
        p = DedupPipeline(spark, wd, cfg2)
        p.run(corpus_df)
        assert all(not s.skipped for s in p.stage_infos)

    def test_metrics_lineage_rows(self, spark, corpus_df, tmp_path):
        wd = str(tmp_path / "job3")
        tables = dedupe_corpus(spark, corpus_df, wd, PARITY_CONFIG)
        m = tables["metrics"]
        stages = {r["stage"] for r in m.select("stage").distinct().collect()}
        assert stages == {"signatures", "pairs", "verified", "clusters"}
        # per-partition rows sum to stage totals
        import json
        from pathlib import Path
        for stage in stages:
            man = json.loads(
                (Path(wd) / "_lineage" / f"{stage}.json").read_text())
            total = (m.where(f"stage = '{stage}'")
                     .groupBy().sum("rows").first()[0])
            assert total == man["rows"]
