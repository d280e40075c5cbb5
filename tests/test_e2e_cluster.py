"""End-to-end cluster parity (SURVEY §5.3): the engine's cluster assignments
vs a brute-force oracle built from the reference's own scoring — all-pairs
cosine >= 0.9 OR normalized-URL equality, union-find closure. The BASELINE
gate: dup-pair recall >= 0.99 at identical config; engine edges are a subset
of oracle edges by construction, so precision must be 1.0.
"""

from __future__ import annotations

import numpy as np
import pytest

from dedup.cluster import assign_clusters
from dedup.config import PARITY_CONFIG
from dedup.lsh import candidate_pairs
from dedup.normalize import normalize_url
from dedup.signature import signatures_table
from dedup.synth import corpus_pdf
from tests.test_cluster import union_find


def reference_oracle_pairs(pdf, detector, threshold=0.9):
    """All-pairs reference scoring -> set of dup edges (url_exact OR
    cosine >= threshold), exactly the reference kernel's decision rule
    (app/hash_detector.py:249-305)."""
    urls = list(pdf["url"])
    sigs = [detector.compute_text_signature(t) for t in pdf["text"]]
    norms = [normalize_url(u) for u in urls]

    edges = set()
    # url-exact edges
    by_norm = {}
    for u, n in zip(urls, norms):
        if n:
            by_norm.setdefault(n, []).append(u)
    for group in by_norm.values():
        group = sorted(group)
        for i in range(len(group)):
            for j in range(i + 1, len(group)):
                edges.add((group[i], group[j]))

    # cosine edges (vectorized matrix product; boundary re-checked per-pair
    # with the reference's own np.dot formula)
    idx = [i for i, s in enumerate(sigs) if s is not None]
    if idx:
        M = np.stack([sigs[i] for i in idx])
        Nm = M / np.linalg.norm(M, axis=1, keepdims=True)
        C = Nm @ Nm.T
        for ii in range(len(idx)):
            for jj in range(ii + 1, len(idx)):
                c = C[ii, jj]
                if abs(c - threshold) < 1e-9:
                    c = detector.compute_similarity(M[ii], M[jj])
                if c >= threshold:
                    a, b = urls[idx[ii]], urls[idx[jj]]
                    edges.add((min(a, b), max(a, b)))
    return edges


def same_cluster_pairs(assignment: dict) -> set:
    clusters = {}
    for u, c in assignment.items():
        clusters.setdefault(c, []).append(u)
    pairs = set()
    for members in clusters.values():
        members = sorted(members)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                pairs.add((members[i], members[j]))
    return pairs


@pytest.mark.parametrize("seed,n_docs", [(42, 400), (1234, 300)])
def test_e2e_recall(spark, detector, seed, n_docs):
    pdf = corpus_pdf(n_docs, seed=seed)
    # oracle clusters from reference scoring
    oracle_edges = reference_oracle_pairs(pdf, detector)
    oracle_assign = union_find(oracle_edges, vertices=pdf["url"])
    oracle_pairs = same_cluster_pairs(oracle_assign)

    # engine pipeline: signatures -> LSH+url pairs -> verify -> cluster
    corpus = spark.createDataFrame(pdf[["url", "text"]])
    sigs = signatures_table(corpus, PARITY_CONFIG).cache()
    pairs = candidate_pairs(sigs, PARITY_CONFIG)
    from dedup.verify import verify_pairs
    verified = verify_pairs(pairs, sigs, PARITY_CONFIG)
    edges = verified.where("keep").select("a", "b")
    assignment = {
        r["url"]: r["cluster_id"]
        for r in assign_clusters(corpus.select("url"), edges).collect()
    }
    engine_pairs = same_cluster_pairs(assignment)

    missed = oracle_pairs - engine_pairs
    extra = engine_pairs - oracle_pairs
    recall = (1.0 if not oracle_pairs
              else len(oracle_pairs & engine_pairs) / len(oracle_pairs))
    assert not extra, f"engine merged non-dup pairs: {sorted(extra)[:5]}"
    assert recall >= 0.99, (
        f"recall {recall:.4f} < 0.99; missed {len(missed)}: "
        f"{sorted(missed)[:5]}")


def test_verified_scores_match_reference(spark, detector):
    """Every engine-kept LSH edge's similarity equals the reference cosine
    on the same two documents (4-dp rounding happens only at the output
    boundary, like app/hash_detector.py:303)."""
    pdf = corpus_pdf(200, seed=77)
    texts = dict(zip(pdf["url"], pdf["text"]))
    corpus = spark.createDataFrame(pdf[["url", "text"]])
    sigs = signatures_table(corpus, PARITY_CONFIG).cache()
    pairs = candidate_pairs(sigs, PARITY_CONFIG)
    from dedup.verify import verify_pairs
    rows = (verify_pairs(pairs, sigs, PARITY_CONFIG)
            .where("keep and match_source = 'lsh'").collect())
    assert rows, "no lsh edges kept — fixture too sparse"
    for r in rows:
        s1 = detector.compute_text_signature(texts[r["a"]])
        s2 = detector.compute_text_signature(texts[r["b"]])
        assert r["similarity"] == detector.compute_similarity(s1, s2)
