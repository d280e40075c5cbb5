"""Round-3 coverage queries: incremental clustering, semantic dedup,
streaming pairs as a driver row, checkpoint-resume as a driver row, M3/M5
response-layer parity, engine-config signatures, T4 coefficients.

All at sf0.001 for speed; the sf0.01 driver-gate equivalents are frozen by
tools/gen_oracle_fixtures.py --check.
"""

from __future__ import annotations

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


def test_clusters_incremental_equals_batch(spark):
    """merge_assignments over a split edge set must equal the full batch
    recompute exactly (url -> cluster_id, component-minimum ids)."""
    from dedup.queries import q_clusters_incremental, q_dup_clusters

    batch = {(r["url"], r["cluster_id"])
             for r in q_dup_clusters(spark, SF).collect()}
    incr = {(r["url"], r["cluster_id"])
            for r in q_clusters_incremental(spark, SF).collect()}
    assert incr == batch


def test_clusters_incremental_merges_two_clusters(spark):
    """A later edge bridging two existing clusters merges them under the
    min member id, and untouched clusters pass through unchanged."""
    from dedup.cluster import assign_clusters, merge_assignments

    urls = spark.createDataFrame([(u,) for u in "abcdefg"], "url string")
    first = spark.createDataFrame([("a", "b"), ("c", "d"), ("e", "f")],
                                  "a string, b string")
    base = assign_clusters(urls, first)
    bridge = spark.createDataFrame([("b", "c")], "a string, b string")
    merged = {r["url"]: r["cluster_id"]
              for r in merge_assignments(base, bridge).collect()}
    assert merged == {"a": "a", "b": "a", "c": "a", "d": "a",
                      "e": "e", "f": "e", "g": "g"}


def test_semantic_dedup_matches_local_replica(spark):
    from dedup import local_oracle as lo
    from dedup.queries import SEM_CELL_CAP, SEM_DEDUP_T, q_semantic_dedup

    got = {(r["vec_id"], r["cell"], r["keep"], r["rep_id"])
           for r in q_semantic_dedup(spark, SF).collect()}
    con = duckdb.connect()
    emb = con.execute(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet' "
        "ORDER BY vec_id").fetchall()
    emb_planted = list(emb) + [(vid + 100000, v) for vid, v in emb
                               if vid < 50]
    want = set(lo.local_semantic_dedup(emb_planted, SEM_DEDUP_T,
                                       SEM_CELL_CAP))
    assert got == want
    # every planted clone is dropped with its original as representative
    dropped = {vid: rep for vid, _, keep, rep in got if not keep}
    for vid in range(50):
        assert dropped.get(100000 + vid) == vid


def test_stream_pairs_matches_replica(spark):
    from dedup import local_oracle as lo
    from dedup.config import PARITY_CONFIG
    from dedup.queries import q_stream_pairs

    from dedup.queries import STREAM_QUERY_DOC_BOUND

    got = [(r["a"], r["b"], r["match_source"])
           for r in q_stream_pairs(spark, SF).collect()]
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text, source FROM '{SF}/documents.parquet' "
        "ORDER BY doc_id").fetchall()
    corpus = [(f"https://www.{src}.example.com/docs/{d}", t, int(d))
              for d, t, src in rows]
    corpus += [(f"https://mirror.net/copy/{d}", t, d)
               for _, t, d in [(u, t, d) for u, t, d in corpus if d < 50]]
    corpus = [(u, t, d) for u, t, d in corpus
              if d < STREAM_QUERY_DOC_BOUND]
    drops = [[(u, t) for u, t, d in corpus if d % 2 == 0],
             [(u, t) for u, t, d in corpus if d % 2 == 1]]
    want = lo.local_stream_pairs(drops, PARITY_CONFIG)
    assert sorted(got) == want
    # cross-drop recall: an even/odd pair can only exist via persisted state
    assert any((a.endswith("/0") and b.endswith("/1")) or "copy" in a
               for a, b, _ in got)


@pytest.mark.parametrize("name", ["config_clamp", "pipeline_resume",
                                  "quality_filter", "top_terms",
                                  "stream_windowed_counts", "line_dedup",
                                  "domain_stats", "sample_split"])
def test_inline_sql_oracles_match(spark, name):
    """The two new inline-VALUES oracles replicate the driver compare."""
    from tests.harness_oracle import compare_query, duck_connection

    from dedup.queries import ORACLE_SQL, QUERIES

    con = duck_connection(SF)
    problems = compare_query(spark, con, name, QUERIES[name],
                             ORACLE_SQL[name], SF)
    assert not problems, problems


def test_permutation_coeffs_match_reference(spark, detector):
    from dedup.queries import q_permutation_coeffs

    rows = q_permutation_coeffs(spark, SF).collect()
    assert [(r["a"], r["b"]) for r in rows] == list(
        zip(detector.coeff_a, detector.coeff_b))


def test_candidate_stats_reference_semantics(spark):
    from dedup.queries import q_candidate_stats

    rows = {r["search_field"]: r
            for r in q_candidate_stats(spark, SF).collect()}
    t = rows["title"]
    # display truncation with '...' (app/main.py:185,192)
    assert t["search_value"].endswith("...") and \
        len(t["search_value"]) == 83
    assert t["normalized_value"].endswith("...") and \
        len(t["normalized_value"]) == 53
    # the source doc itself is in the pool -> field max similarity is 1.0
    assert t["max_similarity"] == 1.0
    assert rows["url"]["max_similarity"] is None


def test_dup_clusters_engine_mirrors_cluster_together(spark):
    """Engine-mode e2e (char shingles + SimHash prefilter + exact Jaccard):
    every planted mirror must land in its original's cluster, and the
    cluster id is the component minimum url."""
    from dedup.queries import q_dup_clusters_engine

    assign = {r["url"]: r["cluster_id"]
              for r in q_dup_clusters_engine(spark, SF).collect()}
    for url, cid in assign.items():
        if url.startswith("https://mirror.net/copy/"):
            doc_id = url.rsplit("/", 1)[1]
            twins = [u for u in assign
                     if u.endswith(f"/docs/{doc_id}")
                     and assign[u] == cid]
            assert twins, f"mirror {url} not clustered with its original"
        assert cid <= url  # component-minimum id


def test_key_index_stage_and_point_queries(spark, tmp_path):
    """DedupPipeline(build_key_index=True) persists the inverted key table;
    dedupe_one / dedupe_metadata through it return the same rows as the
    on-the-fly key derivation, and resume skips the extra stage."""
    from dedup.config import PARITY_CONFIG
    from dedup.kernel import SourceMetadata, dedupe_metadata, dedupe_one
    from dedup.pipeline import DedupPipeline
    from dedup.queries import docs_as_corpus

    corpus = docs_as_corpus(spark, SF)
    wd = str(tmp_path / "wd")
    p = DedupPipeline(spark, wd, PARITY_CONFIG)
    tables = p.run(corpus, build_key_index=True)
    assert "keys" in tables
    assert [s.name for s in p.stage_infos] == [
        "signatures", "keys", "pairs", "verified", "clusters"]

    sigs = tables["signatures"]
    keys = tables["keys"]
    url = "https://mirror.net/copy/7"
    direct = {tuple(r) for r in dedupe_one(sigs, url, PARITY_CONFIG).collect()}
    indexed = {tuple(r) for r in dedupe_one(
        sigs, url, PARITY_CONFIG, key_index=keys).collect()}
    assert direct == indexed and direct

    doc_text = corpus.where("doc_id = 3").limit(1).collect()[0]["text"]
    src = SourceMetadata(title=doc_text)
    direct_m = {tuple(r) for r in dedupe_metadata(
        sigs, src, PARITY_CONFIG).collect()}
    indexed_m = {tuple(r) for r in dedupe_metadata(
        sigs, src, PARITY_CONFIG, key_index=keys).collect()}
    assert direct_m == indexed_m and direct_m

    # resume skips the keys stage too; invalidate clears its manifest
    p2 = DedupPipeline(spark, wd, PARITY_CONFIG)
    p2.run(corpus, build_key_index=True)
    assert all(s.skipped for s in p2.stage_infos)
    p2.invalidate()
    p3 = DedupPipeline(spark, wd, PARITY_CONFIG)
    p3.run(corpus, build_key_index=True)
    assert not any(s.skipped for s in p3.stage_infos)


def test_ingest_drop_incremental_equals_batch(spark, tmp_path):
    """Two crawl drops through streaming.ingest_drop (signatures append ->
    stateful pairs -> verify -> merge_assignments) must end at EXACTLY the
    batch pipeline's clustering of the union corpus — cross-drop dups only
    co-cluster if bucket state and the incremental merge both work."""
    import glob
    import shutil

    from dedup.config import PARITY_CONFIG
    from dedup.queries import docs_as_corpus, q_dup_clusters
    from dedup.streaming import ingest_drop

    c = docs_as_corpus(spark, SF).select("url", "text", "doc_id")
    src = str(tmp_path / "src")
    wd = str(tmp_path / "wd")
    (tmp_path / "src").mkdir()
    results = []
    for drop_no, pred in enumerate(("doc_id % 2 = 0", "doc_id % 2 = 1")):
        tmp = str(tmp_path / f"tmp{drop_no}")
        c.where(pred).select("url", "text").coalesce(1).write.parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        shutil.copy(part, f"{src}/drop{drop_no}.parquet")
        # collect eagerly: the returned frame is a live view of the
        # assignments dir, which the next drop overwrites
        results.append({(r["url"], r["cluster_id"])
                        for r in ingest_drop(
                            spark, src, wd, PARITY_CONFIG,
                            schema="url string, text string").collect()})

    want = {(r["url"], r["cluster_id"])
            for r in q_dup_clusters(spark, SF).collect()}
    assert results[-1] == want
    # intermediate state after drop 1 covered only the even docs
    assert len(results[0]) < len(results[-1])


def test_minhash_signatures_engine_matches_local(spark):
    from dedup import local_oracle as lo
    from dedup.config import ENGINE_CONFIG
    from dedup.queries import q_minhash_signatures_engine

    got = {(r["url"], r["sig_len"], r["n_tokens"], r["sig0"], r["simhash"])
           for r in q_minhash_signatures_engine(spark, SF).collect()}
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text, source FROM '{SF}/documents.parquet' "
        "ORDER BY doc_id").fetchall()
    corpus = [(f"https://www.{src}.example.com/docs/{d}", t)
              for d, t, src in rows]
    corpus += [(f"https://mirror.net/copy/{d}", t)
               for d, t, _ in rows if int(d) < 50]
    want = {(s.url,
             len(s.minhash) if s.minhash is not None else None,
             s.n_tokens,
             int(s.minhash[0]) if s.minhash is not None else None,
             s.simhash)
            for s in lo.local_signatures(corpus, ENGINE_CONFIG)}
    assert got == want
