"""Freeze VALUES-fixture oracles for the non-SQL-expressible driver queries.

Computes, at sf0.01, the expected output of every hash-pipeline query with
the INDEPENDENT single-node implementation in dedup/local_oracle.py (pure
Python/numpy — no Spark execution anywhere in the computation), plus the
reference's own kernel for `kernel_detect`, and writes them to
dedup/fixtures/oracle_sf001.json. dedup/queries.fixture_oracle_sql() turns
the file into DuckDB `SELECT ... FROM (VALUES ...)` oracle SQL.

Usage:
    python tools/gen_oracle_fixtures.py [--sf-dir /root/testdata/sf0.01]
                                        [--check]

--check additionally spins up a local SparkSession, runs each corresponding
Spark query, and asserts set-equality with the frozen fixture (catches any
single-node/distributed divergence before the driver does).
"""

from __future__ import annotations

import argparse
import json
import sys
import types
from pathlib import Path

import duckdb
import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from dedup import local_oracle as lo  # noqa: E402
from dedup.config import ENGINE_CONFIG, PARITY_CONFIG  # noqa: E402

OUT_PATH = REPO / "dedup" / "fixtures" / "oracle_sf001.json"
REFERENCE_PATH = "/root/reference"


def corpus_rows(sf_dir: str) -> list[tuple[str, str, int]]:
    """(url, text, doc_id) rows — same construction as
    dedup.queries.docs_as_corpus (planted mirrors for doc_id < 50)."""
    con = duckdb.connect()
    df = con.execute(
        f"SELECT doc_id, text, source FROM '{sf_dir}/documents.parquet' "
        "ORDER BY doc_id").df()
    rows = []
    for doc_id, text, source in zip(df["doc_id"], df["text"], df["source"]):
        rows.append((f"https://www.{source}.example.com/docs/{doc_id}",
                     text, int(doc_id)))
    for doc_id, text, source in zip(df["doc_id"], df["text"], df["source"]):
        if int(doc_id) < 50:
            rows.append((f"https://mirror.net/copy/{doc_id}", text,
                         int(doc_id)))
    return rows


def metadata_corpus_rows(sf_dir: str) -> list[tuple]:
    """(url, text, redirect, title, description) rows — same construction
    as dedup.queries.docs_as_metadata_corpus (A/B/C families)."""
    con = duckdb.connect()
    df = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        "ORDER BY doc_id").df()
    def title(d):
        return f"Topic d{d}a curriculum d{d}b unit"

    def desc(d):
        return f"Catalog d{d}a entry d{d}b annotation d{d}c body"

    rows = []
    for doc_id, text in zip(df["doc_id"], df["text"]):
        d = int(doc_id)
        rows.append((f"https://site-a.example.org/{d}", text, None,
                     title(d), desc(d)))
    for doc_id in df["doc_id"]:
        d = int(doc_id)
        if d < 40:
            rows.append((f"https://site-b.example.org/{d}", "", None,
                         title(d) + " - Wikipedia", None))
    for doc_id in df["doc_id"]:
        d = int(doc_id)
        if 40 <= d < 60:
            rows.append((f"https://site-c.example.org/{d}", "", None,
                         None, desc(d)))
    return rows


def gen_fixtures(sf_dir: str) -> dict:
    cfg = PARITY_CONFIG
    rows = corpus_rows(sf_dir)
    sigs = lo.local_signatures([(u, t) for u, t, _ in rows], cfg)
    fixtures: dict[str, dict] = {}

    # --- minhash_signatures
    fixtures["minhash_signatures"] = {
        "columns": [["url", "VARCHAR"], ["sig_len", "BIGINT"],
                    ["n_tokens", "BIGINT"], ["sig0", "BIGINT"],
                    ["simhash", "BIGINT"]],
        "rows": [[s.url,
                  len(s.minhash) if s.minhash is not None else None,
                  s.n_tokens,
                  int(s.minhash[0]) if s.minhash is not None else None,
                  s.simhash]
                 for s in sigs],
    }

    # --- lsh_candidate_pairs
    pairs = lo.local_candidate_pairs(sigs, cfg)
    fixtures["lsh_candidate_pairs"] = {
        "columns": [["a", "VARCHAR"], ["b", "VARCHAR"],
                    ["match_source", "VARCHAR"]],
        "rows": [list(p) for p in sorted(pairs)],
    }

    # --- dup_clusters (full pipeline: verify + union-find)
    verified = lo.local_verify(pairs, sigs, cfg)
    keep_edges = [(a, b) for a, b, _, _, _, keep in verified if keep]
    assign = lo.union_find_clusters([s.url for s in sigs], keep_edges)
    fixtures["dup_clusters"] = {
        "columns": [["url", "VARCHAR"], ["cluster_id", "VARCHAR"]],
        "rows": [list(t) for t in assign],
    }

    # --- cluster_representatives (argmax-by-(n_tokens, url) per
    # non-singleton cluster, same ordering the Spark min(struct) uses)
    toks = {s.url: int(s.n_tokens or 0) for s in sigs}
    members: dict[str, list[str]] = {}
    for url, cid in assign:
        members.setdefault(cid, []).append(url)
    rep_rows = []
    for cid, urls in members.items():
        if len(urls) < 2:
            continue
        best = min(urls, key=lambda u: (-toks.get(u, 0), u))
        rep_rows.append([cid, best, toks.get(best, 0),
                         len(urls), len(urls) - 1])
    fixtures["cluster_representatives"] = {
        "columns": [["cluster_id", "VARCHAR"], ["rep_url", "VARCHAR"],
                    ["rep_n_tokens", "BIGINT"], ["n_members", "BIGINT"],
                    ["n_dropped", "BIGINT"]],
        "rows": sorted(rep_rows),
    }

    # --- simhash_hamming (non-mirror docs, distance to first url)
    plain = sorted((s for s in sigs
                    if not s.url.startswith("https://mirror.net/")
                    and s.simhash is not None), key=lambda s: s.url)
    ref_sim = plain[0].simhash
    fixtures["simhash_hamming"] = {
        "columns": [["url", "VARCHAR"], ["simhash", "BIGINT"],
                    ["hamming", "BIGINT"]],
        "rows": [[s.url, s.simhash,
                  bin((s.simhash ^ ref_sim) & lo._M64).count("1")]
                 for s in plain],
    }

    # --- doc_fingerprints (corpus doc_id < 100, grouped per url)
    sub_rows = [(u, t) for u, t, d in rows if d < 100]
    fps = lo.local_substring_fingerprints(sub_rows, cfg, k=64)
    agg: dict[str, list[int]] = {}
    for url, fp, _ in fps:
        cur = agg.setdefault(url, [0, fp])
        cur[0] += 1
        cur[1] = min(cur[1], fp)
    fixtures["doc_fingerprints"] = {
        "columns": [["url", "VARCHAR"], ["n_fingerprints", "BIGINT"],
                    ["min_fp", "BIGINT"]],
        "rows": [[u, n, m] for u, (n, m) in sorted(agg.items())],
    }

    # --- substring_pairs (full corpus)
    sp = lo.local_substring_pairs([(u, t) for u, t, _ in rows], cfg)
    fixtures["substring_pairs"] = {
        "columns": [["a", "VARCHAR"], ["b", "VARCHAR"],
                    ["substr_len", "BIGINT"], ["match_source", "VARCHAR"]],
        "rows": [list(t) for t in sp],
    }

    # --- media_features / media_dup_pairs (synthetic media table, n=60)
    items = lo.local_media_items(60)
    feats = lo.local_media_features(items)
    fixtures["media_features"] = {
        "columns": [["url", "VARCHAR"], ["media_type", "VARCHAR"],
                    ["byte_len", "BIGINT"], ["sha256", "VARCHAR"],
                    ["fingerprint", "BIGINT"]],
        "rows": [list(t) for t in feats],
    }
    fixtures["media_dup_pairs"] = {
        "columns": [["a", "VARCHAR"], ["b", "VARCHAR"],
                    ["match_source", "VARCHAR"]],
        "rows": [list(t) for t in lo.local_media_dup_pairs(feats)],
    }

    # --- embedding_knn_lsh
    from dedup.queries import ANN_BUCKET_CAP, ANN_COS_MIN
    con = duckdb.connect()
    emb = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id").fetchall()
    ann = lo.local_ann_pairs(emb, ANN_COS_MIN, ANN_BUCKET_CAP)
    fixtures["embedding_knn_lsh"] = {
        "columns": [["a", "BIGINT"], ["b", "BIGINT"], ["cos_sim", "DOUBLE"]],
        "rows": [list(t) for t in ann],
    }
    ivf = lo.local_ivf_pairs(emb, ANN_COS_MIN, ANN_BUCKET_CAP)
    fixtures["embedding_knn_ivf"] = {
        "columns": [["a", "BIGINT"], ["b", "BIGINT"], ["cos_sim", "DOUBLE"]],
        "rows": [list(t) for t in ivf],
    }
    ivf_tr = lo.local_ivf_trained_pairs(emb, ANN_COS_MIN, ANN_BUCKET_CAP)
    fixtures["embedding_knn_ivf_trained"] = {
        "columns": [["a", "BIGINT"], ["b", "BIGINT"], ["cos_sim", "DOUBLE"]],
        "rows": [list(t) for t in ivf_tr],
    }

    # --- dedupe_one_url
    one = lo.local_dedupe_one(sigs, "https://mirror.net/copy/7", cfg)
    fixtures["dedupe_one_url"] = {
        "columns": [["node_url", "VARCHAR"], ["similarity", "DOUBLE"],
                    ["match_source", "VARCHAR"]],
        "rows": [list(t) for t in one],
    }

    # --- dedupe_by_metadata (source = text of doc 3 as the title)
    doc3_text = next(t for _, t, d in rows if d == 3)
    meta = lo.local_dedupe_metadata(sigs, doc3_text, None, None, cfg)
    fixtures["dedupe_by_metadata"] = {
        "columns": [["node_url", "VARCHAR"], ["similarity", "DOUBLE"],
                    ["match_source", "VARCHAR"]],
        "rows": [list(t) for t in meta],
    }

    # --- metadata_block_pairs: candidate pairs over the metadata corpus
    # (title / normalized-title / description-prefix blocking keys)
    meta_sigs = lo.local_signatures(metadata_corpus_rows(sf_dir), cfg)
    fixtures["metadata_block_pairs"] = {
        "columns": [["a", "VARCHAR"], ["b", "VARCHAR"],
                    ["match_source", "VARCHAR"]],
        "rows": [list(t) for t in lo.local_candidate_pairs(meta_sigs, cfg)],
    }

    # --- kernel_detect: oracle is the REFERENCE's own kernel output
    fixtures["kernel_detect"] = {
        "columns": [["node_id", "VARCHAR"], ["similarity_score", "DOUBLE"],
                    ["match_source", "VARCHAR"]],
        "rows": kernel_detect_expected(sf_dir),
    }

    # --- url_normalize_youtube: oracle is the REFERENCE's own normalize_url
    # (live import), run over the same deterministic URL families the Spark
    # query constructs — a true parity fixture, not shared-function plumbing.
    ref_models = load_reference_models()
    from dedup.queries import youtube_raw_urls
    yt_rows = []
    n_docs = len({d for _, _, d in rows})
    for doc_id in range(min(150, n_docs)):
        for fam, raw in enumerate(youtube_raw_urls(doc_id)):
            yt_rows.append([doc_id, fam, raw, ref_models.normalize_url(raw)])
    fixtures["url_normalize_youtube"] = {
        "columns": [["doc_id", "BIGINT"], ["fam", "BIGINT"],
                    ["raw_url", "VARCHAR"], ["norm_url", "VARCHAR"]],
        "rows": yt_rows,
    }

    # --- permutation_coeffs: oracle is the LIVE reference detector's (a, b)
    fixtures["permutation_coeffs"] = {
        "columns": [["i", "BIGINT"], ["a", "BIGINT"], ["b", "BIGINT"]],
        "rows": reference_coeffs(),
    }

    # --- minhash_signatures_engine: 128-perm + k-char shingling config
    eng_sigs = lo.local_signatures([(u, t) for u, t, _ in rows],
                                   ENGINE_CONFIG)
    fixtures["minhash_signatures_engine"] = {
        "columns": [["url", "VARCHAR"], ["sig_len", "BIGINT"],
                    ["n_tokens", "BIGINT"], ["sig0", "BIGINT"],
                    ["simhash", "BIGINT"]],
        "rows": [[s.url,
                  len(s.minhash) if s.minhash is not None else None,
                  s.n_tokens,
                  int(s.minhash[0]) if s.minhash is not None else None,
                  s.simhash]
                 for s in eng_sigs],
    }

    # --- dup_clusters_engine: FULL engine-mode pipeline (128-perm char
    # shingles, SimHash prefilter, exact-Jaccard verify, union-find)
    sim_of = {s.url: s.simhash for s in eng_sigs}
    eng_pairs = []
    for a, b, src in lo.local_candidate_pairs(eng_sigs, ENGINE_CONFIG):
        if src != "url_exact":
            sa, sb = sim_of.get(a), sim_of.get(b)
            if sa is None or sb is None:
                continue  # Spark prefilter inner-joins the simhash table
            if bin((sa ^ sb) & lo._M64).count("1") > \
                    ENGINE_CONFIG.simhash_hamming_max:
                continue
        eng_pairs.append((a, b, src))
    eng_verified = lo.local_verify(eng_pairs, eng_sigs, ENGINE_CONFIG)
    eng_edges = [(a, b) for a, b, _, _, _, keep in eng_verified if keep]
    fixtures["dup_clusters_engine"] = {
        "columns": [["url", "VARCHAR"], ["cluster_id", "VARCHAR"]],
        "rows": [list(t) for t in lo.union_find_clusters(
            [s.url for s in eng_sigs], eng_edges)],
    }

    # --- candidate_stats: field similarities from the LIVE reference
    # kernel; stats layer per app/main.py:178-204
    fixtures["candidate_stats"] = {
        "columns": [["search_field", "VARCHAR"], ["search_value", "VARCHAR"],
                    ["normalized_value", "VARCHAR"],
                    ["candidates_found", "INTEGER"],
                    ["max_similarity", "DOUBLE"]],
        "rows": candidate_stats_expected(sf_dir),
    }

    # --- clusters_incremental: must equal the BATCH clustering exactly
    # (merge_assignments over a split edge set is equivalence-tested
    # against the full recompute)
    fixtures["clusters_incremental"] = {
        "columns": [["url", "VARCHAR"], ["cluster_id", "VARCHAR"]],
        "rows": fixtures["dup_clusters"]["rows"],
    }

    # The streaming driver queries run at a corpus SUBSET (see
    # dedup.queries.STREAM_QUERY_DOC_BOUND — per-micro-batch overhead
    # dominates, so the driver rows don't need the full corpus); the
    # fixtures are generated at the same bound.
    from dedup.queries import STREAM_QUERY_DOC_BOUND
    sub = [r for r in rows if r[2] < STREAM_QUERY_DOC_BOUND]

    # --- ingest_two_drops: the incremental-ingest composition over two
    # ordered drops must land at the BATCH clustering of the union (subset)
    # corpus (equivalence pytest-asserted; the oracle is therefore the
    # single-node batch clustering of the same subset)
    sub_sigs = lo.local_signatures([(u, t) for u, t, _ in sub], cfg)
    sub_pairs = lo.local_candidate_pairs(sub_sigs, cfg)
    sub_keep = [(a, b) for a, b, _, _, _, keep
                in lo.local_verify(sub_pairs, sub_sigs, cfg) if keep]
    fixtures["ingest_two_drops"] = {
        "columns": [["url", "VARCHAR"], ["cluster_id", "VARCHAR"]],
        "rows": [list(t) for t in lo.union_find_clusters(
            [s.url for s in sub_sigs], sub_keep)],
    }

    # --- stream_pairs: two ordered drops (even doc_ids, then odd) through
    # the single-node replica of the stateful-streaming bucket machine
    drops = [[(u, t) for u, t, d in sub if d % 2 == 0],
             [(u, t) for u, t, d in sub if d % 2 == 1]]
    fixtures["stream_pairs"] = {
        "columns": [["a", "VARCHAR"], ["b", "VARCHAR"],
                    ["match_source", "VARCHAR"]],
        "rows": [list(t) for t in lo.local_stream_pairs(drops, cfg)],
    }

    # --- stream_state_evict: drop A, evict ALL bucket state rows (ttl=0),
    # drop B — with the state store compacted between drops, drop B pairs
    # ONLY within itself. Oracle = union of the two drops run through
    # FRESH replicas (state reset models the eviction).
    evicted = sorted(set(lo.local_stream_pairs([drops[0]], cfg))
                     | set(lo.local_stream_pairs([drops[1]], cfg)))
    fixtures["stream_state_evict"] = {
        "columns": [["a", "VARCHAR"], ["b", "VARCHAR"],
                    ["match_source", "VARCHAR"]],
        "rows": [list(t) for t in evicted],
    }

    # --- semantic_dedup (SemDeDup-style greedy keep/drop per IVF cell);
    # input = embeddings + planted exact clones (vec_id < 50 -> +100000)
    from dedup.queries import SEM_CELL_CAP, SEM_DEDUP_T
    emb_planted = list(emb) + [(vid + 100000, v)
                               for vid, v in emb if vid < 50]
    fixtures["semantic_dedup"] = {
        "columns": [["vec_id", "BIGINT"], ["cell", "INTEGER"],
                    ["keep", "BOOLEAN"], ["rep_id", "BIGINT"]],
        "rows": [list(t) for t in lo.local_semantic_dedup(
            emb_planted, SEM_DEDUP_T, SEM_CELL_CAP)],
    }
    return fixtures


def reference_coeffs() -> list[list[int]]:
    """(i, a, b) from a LIVE import of the reference MinHashDetector
    (app/hash_detector.py:26-40) at the parity config (k=100, seed=42)."""
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
    det = hash_detector.MinHashDetector(num_hashes=PARITY_CONFIG.num_hashes,
                                        seed=PARITY_CONFIG.seed)
    return [[i, int(a), int(b)]
            for i, (a, b) in enumerate(zip(det.coeff_a, det.coeff_b))]


def candidate_stats_expected(sf_dir: str) -> list[list]:
    """Expected candidate-stats rows: run the reference's find_duplicates
    on the kernel_detect pool for the per-field max similarities, then
    apply the response-layer assembly semantics of app/main.py:178-204
    (transcribed here — app.main itself imports fastapi, absent in this
    sandbox): search_value > 80 chars -> first 80 + '...', normalized
    value > 50 -> first 50 + '...', highest similarity joined per field,
    absent (None) for fields without scored candidates."""
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
    import app.models as models

    from dedup.normalize import normalize_title

    con = duckdb.connect()
    df = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        "WHERE doc_id < 60 ORDER BY doc_id").df()
    pools = {"title": [
        {"ref": {"id": f"n{int(doc_id)}"},
         "properties": {"cclom:title": [text]}}
        for doc_id, text in zip(df["doc_id"], df["text"])
    ]}
    detector = hash_detector.MinHashDetector(num_hashes=100, seed=42)
    source_text = df["text"].iloc[0]
    meta = models.ContentMetadata(title=source_text)
    _, field_sims = detector.find_duplicates(meta, pools, threshold=0.8)

    search_info = {
        "title": {"search_value": source_text,
                  "normalized_search": normalize_title(
                      source_text + " - Wikipedia"),
                  "count": len(df)},
        "url": {"search_value": "https://example.org/unmatched",
                "normalized_search": None, "count": 0},
    }
    rows = []
    for field, info in search_info.items():
        sv = info["search_value"]
        if sv and len(sv) > 80:
            sv = sv[:80] + "..."
        ns = info["normalized_search"]
        if ns and len(ns) > 50:
            ns = ns[:50] + "..."
        rows.append([field, sv, ns, info["count"], field_sims.get(field)])
    return sorted(rows)


def load_reference_models():
    """Import /root/reference/app/models.py with the loguru stub installed."""
    if "loguru" not in sys.modules:
        stub = types.ModuleType("loguru")

        class _Noop:
            def __getattr__(self, name):
                return lambda *a, **k: None

        stub.logger = _Noop()
        sys.modules["loguru"] = stub
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import app.models as models
    return models


def kernel_detect_expected(sf_dir: str) -> list[list]:
    """Run the reference's find_duplicates in-process on the same pool the
    Spark query builds (documents doc_id < 60, title field, threshold 0.8)."""
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
    import app.models as models

    con = duckdb.connect()
    df = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        "WHERE doc_id < 60 ORDER BY doc_id").df()
    pools = {"title": [
        {"ref": {"id": f"n{int(doc_id)}"},
         "properties": {"cclom:title": [text]}}
        for doc_id, text in zip(df["doc_id"], df["text"])
    ]}
    detector = hash_detector.MinHashDetector(num_hashes=100, seed=42)
    meta = models.ContentMetadata(title=df["text"].iloc[0])
    dups, _ = detector.find_duplicates(meta, pools, threshold=0.8)
    return [[d.node_id, d.similarity_score, d.match_source] for d in dups]


def check_against_spark(fixtures: dict, sf_dir: str) -> int:
    """Run each Spark query and compare row SETS with the fixture."""
    from dedup.session import build_session
    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entry

    spark = build_session("fixture-check", master="local[8]",
                          shuffle_partitions=8)
    queries = entry.queries()
    failures = 0
    for name, data in fixtures.items():
        got = queries[name](spark, sf_dir).collect()
        got_set = {tuple(r) for r in got}
        exp_set = {tuple(r) for r in data["rows"]}
        if got_set != exp_set:
            failures += 1
            extra = list(got_set - exp_set)[:3]
            missing = list(exp_set - got_set)[:3]
            print(f"MISMATCH {name}: spark={len(got_set)} fixture="
                  f"{len(exp_set)}\n  spark-only: {extra}\n"
                  f"  fixture-only: {missing}")
        else:
            print(f"ok {name}: {len(exp_set)} rows")
    spark.stop()
    return failures


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    fixtures = gen_fixtures(args.sf_dir)
    OUT_PATH.write_text(json.dumps(fixtures, indent=0))
    total = sum(len(d["rows"]) for d in fixtures.values())
    print(f"wrote {OUT_PATH} ({len(fixtures)} queries, {total} rows)")
    if args.check:
        failures = check_against_spark(fixtures, args.sf_dir)
        if failures:
            sys.exit(f"{failures} fixture/spark mismatches")
        print("all fixtures match the Spark queries")


if __name__ == "__main__":
    main()
