"""Round-6 isolation benchmarks (guide §1.4): per-stage noop-sink timings
and old-vs-new A/B harnesses backing the numbers in OPTIMIZATION_r06.md.

NOT the driver bench — bench.py stays frozen. This file exists so the
measurements cited in OPTIMIZATION_r06.md are reproducible:

    python bench_extra.py [sf_dir]          # default /root/testdata/sf1.0

Prints one JSON line with per-stage noop timings for the pipeline stages
and the restructured operator queries, each labeled in the Spark UI via
setJobDescription.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(_REPO))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, fn, out, trials=3):
    walls = []
    for _ in range(trials):
        spark.sparkContext.setJobDescription(f"bench_extra: {label}")
        t0 = time.monotonic()
        fn()
        walls.append(round(time.monotonic() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    out[label] = {"min": min(walls), "all": walls}


def main():
    sf_dir = (sys.argv[1] if len(sys.argv) > 1
              else os.environ.get("SPARK_GRAFT_SF_DIR",
                                  "/root/testdata/sf1.0"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    import dedup.lsh as L
    from dedup.cluster import assign_clusters
    from dedup.config import PARITY_CONFIG
    from dedup.queries import (QUERIES, docs_as_corpus)
    from dedup.session import build_session
    from dedup.signature import signatures_table
    from dedup.verify import verify_pairs

    spark = build_session("bench-extra", master=f"local[{cpus}]",
                          shuffle_partitions=min(2 * cpus, 64))
    out: dict = {"sf_dir": sf_dir, "cpus": cpus}

    corpus = docs_as_corpus(spark, sf_dir).repartition(cpus).persist()
    corpus.count()
    timed(spark, "p1_signatures(noop)",
          lambda: noop(signatures_table(corpus, PARITY_CONFIG)), out)
    sigs = signatures_table(corpus, PARITY_CONFIG).persist()
    sigs.count()

    # p2 stage splits
    def m_mat():
        noop(L.unified_group_keys(sigs, PARITY_CONFIG)
             .localCheckpoint(eager=False))
    timed(spark, "p2.keys_materialize(noop)", m_mat, out)
    timed(spark, "p2.full(count)",
          lambda: L.candidate_pairs(sigs, PARITY_CONFIG).count(), out)
    pairs = L.candidate_pairs(sigs, PARITY_CONFIG).persist()
    pairs.count()

    # p3 splits: joins only vs full scoring
    sig = sigs.select("url", "minhash").where(F.col("minhash").isNotNull())
    sa = sig.select(F.col("url").alias("a"), F.col("minhash").alias("_sig_a"))
    sb = sig.select(F.col("url").alias("b"), F.col("minhash").alias("_sig_b"))
    joined = (pairs.where(F.col("match_source") != "url_exact")
              .join(sa, "a").join(sb, "b"))
    timed(spark, "p3.joins_only(noop)", lambda: noop(joined), out)
    timed(spark, "p3.full(count)",
          lambda: verify_pairs(pairs, sigs, PARITY_CONFIG)
          .where("keep").count(), out)
    verified = verify_pairs(pairs, sigs, PARITY_CONFIG).where("keep").persist()
    verified.count()
    timed(spark, "p4.full(count)",
          lambda: assign_clusters(corpus.select("url"),
                                  verified.select("a", "b")).count(), out)

    for q in ("line_dedup", "embedding_knn", "ngram_jaccard_pairs"):
        timed(spark, f"{q}(count)",
              lambda q=q: QUERIES[q](spark, sf_dir).count(), out)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
