"""Kernel parity (SURVEY §5.2): the DataFrame `find_duplicates` vs the
reference kernel run in-process on identical candidate pools — thresholds
0.0/0.5/0.9/1.0, url-exact, placeholder fields, short texts, sig-None
candidates, key-precedence traps, repeated node ids across fields."""

from __future__ import annotations

import pytest

from dedup.kernel import SourceMetadata, candidates_df_from_pools, find_duplicates


def _node(nid, **props):
    properties = {}
    for k, v in props.items():
        key = {
            "cclom_title": "cclom:title",
            "cm_name": "cm:name",
            "desc": "cclom:general_description",
            "wwwurl": "ccm:wwwurl",
            "location": "cclom:location",
        }[k]
        properties[key] = v
    node = {"properties": properties}
    if nid is not None:
        node["ref"] = {"id": nid}
    return node


BASE_TEXT = ("Photosynthese ist der biologische Prozess bei dem Pflanzen "
             "Lichtenergie in chemische Energie umwandeln und dabei "
             "Sauerstoff freisetzen")
NEAR_TEXT = ("Photosynthese ist der biologische Prozess bei dem Pflanzen "
             "Lichtenergie in chemische Energie umwandeln und dabei "
             "Kohlendioxid verbrauchen")
OTHER_TEXT = ("Die franzoesische Revolution begann im Jahr 1789 und "
              "veraenderte die politische Landschaft Europas fundamental")

POOLS = {
    "title": [
        _node("n1", cclom_title=BASE_TEXT),
        _node("n2", cclom_title=NEAR_TEXT),
        _node("n3", cm_name=[BASE_TEXT]),          # lower-precedence key, list value
        _node("n4", cclom_title="xx"),             # single short token -> sig None? (len 2 token kept)
        _node("n5", cclom_title="  "),             # blank -> sig None
        _node(None, cclom_title=BASE_TEXT),        # missing ref.id -> skipped
        _node("n7", cclom_title=[OTHER_TEXT, "second ignored"]),
        _node("n1", cclom_title=OTHER_TEXT),       # repeated node id in same field
    ],
    "description": [
        _node("n2", desc=NEAR_TEXT),               # repeat across fields
        _node("n8", desc=BASE_TEXT),
        _node("n9", cclom_title=BASE_TEXT),        # no description key at all
    ],
    "url": [
        _node("n10", wwwurl="https://www.example.com/page/?utm_source=x",
              cclom_title=OTHER_TEXT),
        _node("n11", location=["http://example.com/page"]),
        _node("n12", wwwurl="https://youtu.be/dQw4w9WgXcQ",
              cclom_title="totally unrelated words here"),
        _node("n13", wwwurl="https://other.org/else", cclom_title=OTHER_TEXT),
    ],
}

SOURCES = [
    dict(title=BASE_TEXT, description=None,
         url="https://example.com/page",
         redirect_url="https://www.youtube.com/watch?v=dQw4w9WgXcQ"),
    dict(title=BASE_TEXT, description=OTHER_TEXT, url=None, redirect_url=None),
    dict(title=None, description=BASE_TEXT,
         url="https://example.com/page", redirect_url=None),
    dict(title="string", description="  ", url=None, redirect_url=None),  # invalid
    dict(title="string", description=BASE_TEXT, url=None, redirect_url=None),
]


def _reference_result(ref, detector, source_kwargs, pools, threshold):
    meta = ref.models.ContentMetadata(**source_kwargs)
    dups, fmax = detector.find_duplicates(meta, pools, threshold=threshold)
    dup_set = {(d.node_id, d.similarity_score, d.match_source, d.title,
                d.description, d.url) for d in dups}
    order = [d.node_id for d in dups]
    return dup_set, fmax, order


@pytest.mark.parametrize("threshold", [0.0, 0.5, 0.9, 1.0])
@pytest.mark.parametrize("src_i", range(len(SOURCES)))
def test_kernel_parity(spark, ref, detector, threshold, src_i):
    source_kwargs = SOURCES[src_i]
    expect_dups, expect_fmax, expect_order = _reference_result(
        ref, detector, source_kwargs, POOLS, threshold)

    cands = candidates_df_from_pools(spark, POOLS)
    dups_df, fmax_df = find_duplicates(
        SourceMetadata(**source_kwargs), cands, threshold=threshold)
    got_rows = dups_df.collect()
    got_dups = {(r["node_id"], r["similarity_score"], r["match_source"],
                 r["title"], r["description"], r["url"]) for r in got_rows}
    got_fmax = {r["search_field"]: r["max_similarity"]
                for r in fmax_df.collect()}

    assert got_dups == expect_dups
    assert got_fmax == expect_fmax
    # similarity ordering must agree (ties may permute; compare score seq)
    got_scores = [r["similarity_score"] for r in got_rows]
    assert got_scores == sorted(got_scores, reverse=True)
    assert len(got_rows) == len(expect_order)


def test_kernel_invalid_source_returns_empty(spark, ref, detector):
    cands = candidates_df_from_pools(spark, POOLS)
    dups, fmax = find_duplicates(
        SourceMetadata(title="string", description=None), cands)
    assert dups.count() == 0 and fmax.count() == 0
    meta = ref.models.ContentMetadata(title="string", description=None)
    rd, rf = detector.find_duplicates(meta, POOLS, threshold=0.9)
    assert rd == [] and rf == {}


def test_kernel_empty_pools(spark):
    cands = candidates_df_from_pools(spark, {"title": []})
    dups, fmax = find_duplicates(SourceMetadata(title=BASE_TEXT), cands)
    assert dups.count() == 0
    assert fmax.count() == 0
