"""spark-submit entry point for the corpus dedup pipeline.

Cluster usage (north rule: ships as spark-submit --py-files):

    python jobs/package.py                       # builds dist/dedup.zip
    spark-submit --py-files dist/dedup.zip \\
        jobs/dedupe_corpus.py \\
        --corpus s3://bucket/corpus \\
        --workdir s3://bucket/dedup-run-1 \\
        [--engine-mode] [--no-resume] [--threshold 0.9]

Local sandbox usage (synthesizes a corpus when --synth N is given):

    python jobs/dedupe_corpus.py --synth 5000 --workdir /tmp/run1
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser(description="Corpus near-dup detection")
    ap.add_argument("--corpus", help="path to corpus parquet/Iceberg table")
    ap.add_argument("--synth", type=int, default=0,
                    help="synthesize N docs instead of reading --corpus")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--threshold", type=float, default=None)
    ap.add_argument("--num-hashes", type=int, default=None)
    ap.add_argument("--engine-mode", action="store_true",
                    help="128 perms, char shingles, SimHash prefilter, "
                         "exact-Jaccard decisions (default: parity mode)")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from dataclasses import replace

    from dedup.config import ENGINE_CONFIG, PARITY_CONFIG, with_num_hashes
    from dedup.pipeline import dedupe_corpus
    from dedup.session import build_session

    cfg = ENGINE_CONFIG if args.engine_mode else PARITY_CONFIG
    if args.threshold is not None:
        cfg = replace(cfg, threshold=args.threshold)
    if args.num_hashes is not None:
        # re-derives a consistent lsh_bands/lsh_rows split — a bare
        # replace(num_hashes=N) violates the bands*rows == num_hashes
        # invariant and raises in __post_init__
        cfg = with_num_hashes(cfg, args.num_hashes)

    spark = build_session("dedupe-corpus", master=args.master)
    if args.synth:
        from dedup.synth import write_corpus
        corpus_path = f"{args.workdir}/_synth_corpus"
        write_corpus(spark, corpus_path, n_docs=args.synth)
    else:
        if not args.corpus:
            ap.error("--corpus or --synth required")
        corpus_path = args.corpus

    t0 = time.monotonic()
    tables = dedupe_corpus(spark, corpus_path, args.workdir, cfg,
                           resume=not args.no_resume)
    n_docs = tables["clusters"].count()
    n_clusters = tables["clusters"].select("cluster_id").distinct().count()
    wall = time.monotonic() - t0
    print(json.dumps({
        "job_key": cfg.job_key(),
        "n_docs": n_docs,
        "n_clusters": n_clusters,
        "n_dup_docs": n_docs - n_clusters,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_docs / wall, 2) if wall else None,
        "workdir": args.workdir,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
