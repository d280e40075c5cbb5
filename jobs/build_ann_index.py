"""spark-submit entry for the ANN index PREPROCESSING job: train the IVF
coarse quantizer over an embeddings table and persist it as a fixed-size
artifact (dedup/ann_index.py — deterministic seeded spherical kmeans over a
bounded hash-ordered sample, manifest-guarded load).

    spark-submit --py-files dist/dedup.zip jobs/build_ann_index.py \\
        --embeddings <parquet with (vec_id BIGINT, embedding ARRAY<...>)> \\
        --out <index dir> [--k 4096] [--sample-cap 16384] [--iters 8]

    # query-time consumers:
    #   from dedup.ann_index import load_ivf_index, ivf_pairs, ivf_index_config
    #   C = load_ivf_index(spark, out, ivf_index_config(0, 0, 0))
    #   pairs = ivf_pairs(e, C, cos_min, bucket_cap)

Prints one JSON line with the trained shape and the artifact path.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser(description="Train + persist IVF quantizer")
    ap.add_argument("--embeddings", required=True,
                    help="parquet with (vec_id BIGINT, embedding ARRAY)")
    ap.add_argument("--out", required=True, help="index artifact dir")
    ap.add_argument("--k", type=int, default=None,
                    help="centroid count (default: sqrt(n) clamped to "
                         "[16, 4096])")
    ap.add_argument("--sample-cap", type=int, default=None)
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dedup.ann_index import (IVF_TRAIN_ITERS, IVF_TRAIN_SAMPLE,
                                 build_ivf_index)
    from dedup.session import build_session

    spark = build_session("build-ann-index", master=args.master)
    e = (spark.read.parquet(args.embeddings)
         .select(F.col("vec_id").cast("bigint").alias("vec_id"),
                 F.col("embedding").cast("array<double>").alias("v")))
    C = build_ivf_index(
        spark, e, args.out, k=args.k,
        sample_cap=args.sample_cap or IVF_TRAIN_SAMPLE,
        iters=args.iters or IVF_TRAIN_ITERS)
    print(json.dumps({"k": int(C.shape[0]), "dim": int(C.shape[1]),
                      "path": args.out}))
    spark.stop()


if __name__ == "__main__":
    main()
