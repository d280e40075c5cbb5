"""Reference-parity dup-pair recall at scale (north rule: >= 0.99 vs the
reference's assignments at identical config).

Planted-truth recall alone under-reports parity: the synth corpus plants
near-edit families at 1-5% token edits, some of which the REFERENCE's own
cosine-0.9 threshold rejects — those are not engine misses. This tool
therefore measures, over a finished pipeline run:

1. planted-truth recall: fraction of ground-truth duplicate pairs
   (truth_cluster >= 0, globally-unique ids) co-clustered by the engine;
2. for every truth pair the engine did NOT co-cluster, whether a LIVE
   import of the reference kernel (k=100, seed 42, threshold 0.9) would
   keep it — pairs the reference also rejects are parity-consistent;
3. reference-parity recall: kept_by_engine / (kept_by_engine + missed
   pairs the reference WOULD keep).

Usage:
    python tools/parity_recall.py --corpus /tmp/..._corpus --clusters
        /tmp/dedup_scaling_job_32/clusters
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import types
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
REFERENCE_PATH = "/root/reference"


def load_reference_detector():
    if "loguru" not in sys.modules:
        stub = types.ModuleType("loguru")

        class _Noop:
            def __getattr__(self, name):
                return lambda *a, **k: None

        stub.logger = _Noop()
        sys.modules["loguru"] = stub
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import app.hash_detector as hash_detector
    return hash_detector.MinHashDetector(num_hashes=100, seed=42)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--clusters", required=True)
    ap.add_argument("--threshold", type=float, default=0.9)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dedup.session import build_session

    spark = build_session("parity-recall", master="local[8]",
                          shuffle_partitions=16)
    corpus = spark.read.parquet(args.corpus)
    clusters = spark.read.parquet(args.clusters)
    j = (corpus.select("url", "truth_cluster", "text")
         .where("truth_cluster >= 0").join(clusters, "url"))
    found = (j.groupBy("truth_cluster", "cluster_id")
             .agg(F.count("*").alias("m"))
             .select(F.sum(F.expr("m * (m - 1) / 2")).alias("p"))
             .collect()[0]["p"])
    total = (j.groupBy("truth_cluster").agg(F.count("*").alias("s"))
             .select(F.sum(F.expr("s * (s - 1) / 2")).alias("p"))
             .collect()[0]["p"])
    per = j.groupBy("truth_cluster").agg(
        F.countDistinct("cluster_id").alias("k"))
    split_rows = (j.join(per.where("k > 1").select("truth_cluster"),
                         "truth_cluster")
                  .select("truth_cluster", "url", "cluster_id", "text")
                  .collect())
    spark.stop()

    det = load_reference_detector()
    fams: dict = defaultdict(list)
    for r in split_rows:
        fams[r["truth_cluster"]].append((r["url"], r["cluster_id"],
                                         r["text"]))
    sig_cache: dict = {}

    def sig(url, text):
        if url not in sig_cache:
            sig_cache[url] = det.compute_text_signature(text)
        return sig_cache[url]

    missed = ref_keeps = 0
    for members in fams.values():
        for i in range(len(members)):
            for k in range(i + 1, len(members)):
                ua, ca, ta = members[i]
                ub, cb, tb = members[k]
                if ca == cb:
                    continue
                missed += 1
                sa, sb = sig(ua, ta), sig(ub, tb)
                if (sa is not None and sb is not None
                        and det.compute_similarity(sa, sb) >= args.threshold):
                    ref_keeps += 1

    engine_pairs = int(found)
    parity_recall = (engine_pairs / (engine_pairs + ref_keeps)
                     if engine_pairs + ref_keeps else 1.0)
    print(json.dumps({
        "truth_pairs": int(total),
        "engine_copaired": engine_pairs,
        "planted_truth_recall": round(engine_pairs / total, 5) if total else 1.0,
        "missed_pairs": missed,
        "missed_pairs_reference_would_keep": ref_keeps,
        "reference_parity_recall": round(parity_recall, 5),
    }))


if __name__ == "__main__":
    main()
