"""The native (codegen) URL-normalization branch must agree exactly with the
Python `normalize_url` (itself parity-tested against the reference) — on
curated cases and on hypothesis-generated URL-ish strings, through Spark."""

from __future__ import annotations

import random
import string

from dedup.normalize import normalize_url, with_norm_url


def _random_urls(n=400, seed=7):
    rng = random.Random(seed)
    hosts = ["example.com", "www.Example.com", "sub.domain.org", "x.y.z.de",
             "youtube.com", "youtu.be", "m.youtube.com", "a-b.net",
             "host:8080", "user@host.com", "wwww.odd.com", "www.x.com"]
    paths = ["", "/", "/a", "/A/B/", "/a/b/c///", "/watch?v=dQw4w9WgXcQ",
             "/embed/dQw4w9WgXcQ", "/p;params", "/p a t h", "/ümlaut",
             "/a?utm=1&b=2", "/a#frag", "/a?q=1#frag", "/@handle/x",
             "/shorts/abcdefghijk"]
    schemes = ["https://", "http://", "HTTPS://", "ftp://", "", "//"]
    out = []
    for _ in range(n):
        u = (rng.choice(schemes) + rng.choice(hosts) + rng.choice(paths))
        if rng.random() < 0.15:
            u = "".join(rng.choice(string.printable[:70]) for _ in range(12))
        if rng.random() < 0.05:
            u = "  " + u + "  "
        out.append(u)
    out.extend([None, "", "   "])
    return out


def test_native_branch_matches_python(spark):
    urls = _random_urls()
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r["url"]: r["norm"]
           for r in with_norm_url(df, "url", "norm").collect()}
    for u in urls:
        assert got[u] == normalize_url(u), repr(u)


def test_every_row_appears_exactly_once(spark):
    urls = [f"https://site{i}.com/p{i}" for i in range(50)] + \
           ["https://youtu.be/dQw4w9WgXcQ", "junk :::", None]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = with_norm_url(df, "url", "norm").collect()
    assert len(rows) == len(urls)


def test_youtube_query_construction_matches_python_families(spark):
    """The Spark-native URL construction inside q_url_normalize_youtube must
    stay in lockstep with youtube_raw_urls (the fixture generator feeds the
    Python list to the REFERENCE's normalize_url; the query normalizes the
    Spark-built strings — any drift would silently decouple them)."""
    from dedup.queries import q_url_normalize_youtube, youtube_raw_urls

    rows = q_url_normalize_youtube(spark, "/root/testdata/sf0.001").collect()
    assert rows, "query returned nothing"
    by_doc_fam = {(r["doc_id"], r["fam"]): r["raw_url"] for r in rows}
    doc_ids = sorted({d for d, _ in by_doc_fam})
    for d in doc_ids:
        expect = youtube_raw_urls(d)
        for fam, url in enumerate(expect):
            assert by_doc_fam[(d, fam)] == url


def test_youtube_query_matches_reference_normalizer(spark, ref):
    from dedup.queries import q_url_normalize_youtube

    rows = q_url_normalize_youtube(spark, "/root/testdata/sf0.001").collect()
    for r in rows:
        assert r["norm_url"] == ref.models.normalize_url(r["raw_url"]), r
