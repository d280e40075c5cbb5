"""Capture physical plans for the engine's main operators into
BENCH/PLANS.md — the `.explain("formatted")` evidence that scans prune
columns/push filters, pair emission stays JVM-side, and Python appears in
exactly one stage per pass.

Usage: python tools/dump_plans.py
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    # keep the plan tree + the interesting node details
    keep, in_tree = [], True
    for line in text.splitlines():
        if line.startswith("== Physical Plan =="):
            keep.append(line)
            continue
        if line.strip().startswith("(") and ") " in line[:8]:
            in_tree = False
        if in_tree:
            keep.append(line)
        elif any(k in line for k in ("PushedFilters", "ReadSchema",
                                     "WholeStageCodegen", "Arguments: [")):
            keep.append(line.rstrip()[:160])
    return "\n".join(keep[:80])


def main() -> None:
    from dedup.config import ENGINE_CONFIG, PARITY_CONFIG
    from dedup.lsh import candidate_pairs
    from dedup.queries import QUERIES, docs_as_corpus
    from dedup.session import build_session
    from dedup.signature import signatures_table
    from dedup.verify import verify_pairs

    spark = build_session("plan-dump", master="local[4]",
                          shuffle_partitions=8)
    sf = "/root/testdata/sf0.01"
    corpus = docs_as_corpus(spark, sf)
    sigs = signatures_table(corpus, PARITY_CONFIG,
                            extract_html_col=None, emit_text=False)
    pairs = candidate_pairs(sigs, PARITY_CONFIG)
    verified = verify_pairs(pairs, sigs, PARITY_CONFIG).where("keep")
    eng_sigs = signatures_table(corpus, ENGINE_CONFIG)
    eng_verified = verify_pairs(
        candidate_pairs(eng_sigs, ENGINE_CONFIG, use_simhash_prefilter=True),
        eng_sigs, ENGINE_CONFIG).where("keep")

    sections = {
        "signatures (one Arrow pass: normalize+shingle+MinHash+SimHash)":
            sigs,
        "candidate pairs (unified band+url keys, grouped native expansion — "
        "no self-join)": pairs,
        "verification (single mapInPandas barrier; filter stays above "
        "Python)": verified,
        "engine verification (NATIVE minhash-estimate prefilter below the "
        "shingle join: rejected pairs never carry arrays or enter Python)":
            eng_verified,
        "token_count (native tokenization — pushed projection)":
            QUERIES["token_count"](spark, sf),
        "events_agg (hash aggregate, whole-stage codegen)":
            QUERIES["events_agg"](spark, sf),
        "embedding_knn (native fold dot product + window top-k)":
            QUERIES["embedding_knn"](spark, sf),
        "semantic_dedup (broadcast-matmul cell assign, ONE join-free "
        "groupBy shuffle into the greedy sweep)":
            QUERIES["semantic_dedup"](spark, sf),
        "quality_filter (pure CASE over integer counters — codegen)":
            QUERIES["quality_filter"](spark, sf),
        "line_dedup (map-side-combined first-occurrence agg on 8-byte "
        "line hashes — no per-line window)":
            QUERIES["line_dedup"](spark, sf),
        "domain_stats (two partial aggs on (domain, md5) — digest rides "
        "the shuffle, not the text; AQE-broadcast domain join)":
            QUERIES["domain_stats"](spark, sf),
        "sample_split (hash-keyed split + sampling decisions entirely in "
        "codegen — no RNG, no UDF, one partial agg)":
            QUERIES["sample_split"](spark, sf),
        "cluster_representatives (argmax via min(struct) partial agg — "
        "no window over cluster members)":
            QUERIES["cluster_representatives"](spark, sf),
    }
    out = ["# Physical plans (captured by tools/dump_plans.py)", ""]
    for title, df in sections.items():
        out += [f"## {title}", "", "```", _plan(df), "```", ""]
    path = REPO / "BENCH" / "PLANS.md"
    path.write_text("\n".join(out))
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
