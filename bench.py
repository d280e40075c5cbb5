"""Bench harness: headline dedup pipeline + operator queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(_REPO))


def _time(fn) -> float:
    t0 = time.monotonic()
    fn()
    return round(time.monotonic() - t0, 3)


def run_bench(sf_dir: str, cpus: int, shuffle_partitions: int | None = None):
    from pyspark.sql import functions as F

    from dedup.cluster import assign_clusters
    from dedup.config import PARITY_CONFIG
    from dedup.lsh import candidate_pairs
    from dedup.queries import QUERIES, docs_as_corpus
    from dedup.session import build_session
    from dedup.signature import signatures_table
    from dedup.verify import verify_pairs

    spark = build_session(
        "dedup-bench", master=f"local[{cpus}]",
        shuffle_partitions=shuffle_partitions or min(2 * cpus, 64))
    timings: dict[str, float] = {}

    corpus = docs_as_corpus(spark, sf_dir)
    corpus = corpus.repartition(cpus).persist()
    n_docs = corpus.count()

    t0 = time.monotonic()
    sigs = signatures_table(corpus, PARITY_CONFIG).persist()
    sigs.count()
    timings["p1_signatures"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    pairs = candidate_pairs(sigs, PARITY_CONFIG).persist()
    n_pairs = pairs.count()
    timings["p2_candidate_pairs"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    verified = verify_pairs(pairs, sigs, PARITY_CONFIG).where("keep").persist()
    n_edges = verified.count()
    timings["p3_verify"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    clusters = assign_clusters(corpus.select("url"), verified.select("a", "b"))
    n_assign = clusters.count()
    timings["p4_cluster"] = round(time.monotonic() - t0, 3)

    pipeline_sec = sum(timings.values())

    for name in ("token_count", "text_quality", "exact_dup_groups",
                 "ngram_jaccard_pairs", "embedding_knn", "events_agg",
                 "events_user_rank"):
        fn = QUERIES[name]
        timings[name] = _time(lambda fn=fn: fn(spark, sf_dir).count())

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "dedup_pipeline_plus_operators_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "n_docs": n_docs,
        "n_candidate_pairs": n_pairs,
        "n_dup_edges": n_edges,
        "n_assignments": n_assign,
        "docs_per_sec": round(n_docs / pipeline_sec, 2) if pipeline_sec else None,
        "cpus": cpus,
    }
    spark.stop()
    return result


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    result = run_bench(sf_dir, cpus)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
