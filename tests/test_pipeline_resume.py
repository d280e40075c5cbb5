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

    def test_metrics_task_telemetry_on_by_default(self, spark, corpus_df,
                                                  tmp_path):
        """build_session enables the UI (ephemeral port) by default, so a
        DEFAULT pipeline run lands real task telemetry on every computed
        stage's metrics rows — the M12 columns must be non-null."""
        wd = str(tmp_path / "job4")
        tables = dedupe_corpus(spark, corpus_df, wd, PARITY_CONFIG)
        m = tables["metrics"]
        assert {"executor_run_time_ms", "shuffle_read_bytes",
                "shuffle_write_bytes", "num_tasks"} <= set(m.columns)
        assert m.where("executor_run_time_ms IS NULL").count() == 0
        assert m.where("num_tasks IS NULL OR num_tasks <= 0").count() == 0

    def test_metrics_degrade_to_null_without_rest(self):
        """With no REST snapshot (UI off / unreachable) the telemetry
        aggregation degrades to None instead of crashing."""
        from dedup.metrics import stage_ids, task_totals
        assert task_totals(None) is None
        assert stage_ids(None) == set()


_UI_METRICS_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from dedup.config import PARITY_CONFIG
from dedup.pipeline import dedupe_corpus
from dedup.session import build_session
from dedup.synth import corpus_pdf

spark = build_session(
    "metrics-ui", master="local[4]", shuffle_partitions=8,
    extra_conf={{"spark.ui.enabled": "true", "spark.ui.port": "0"}})
corpus = spark.createDataFrame(corpus_pdf(80, seed=21))
tables = dedupe_corpus(spark, corpus, {workdir!r}, PARITY_CONFIG)
by_stage = {{}}
for r in tables["metrics"].collect():
    by_stage.setdefault(r["stage"], r)
for stage, row in by_stage.items():
    assert row["executor_run_time_ms"] is not None, stage
    assert row["num_tasks"] and row["num_tasks"] > 0, stage
assert by_stage["pairs"]["shuffle_write_bytes"] > 0
spark.stop()
print("UI_METRICS_OK")
"""


def test_metrics_rest_telemetry_with_ui_enabled(tmp_path):
    """M12 for real: a UI-enabled session exposes the monitoring REST API
    and every non-skipped stage lands task-level telemetry (executor run
    time, shuffle bytes) in the metrics table. Runs in a subprocess: the
    suite's shared session (getOrCreate) pins spark.ui.enabled=false."""
    import subprocess
    import sys
    from pathlib import Path

    repo = str(Path(__file__).resolve().parent.parent)
    script = _UI_METRICS_SCRIPT.format(repo=repo,
                                       workdir=str(tmp_path / "job"))
    proc = subprocess.run([sys.executable, "-c", script],
                          capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "UI_METRICS_OK" in proc.stdout
