"""Substring pass: rolling-hash correctness, winnowing guarantee, and
end-to-end detection of the planted shared-substring family (truth_cluster
== -2 docs share one long paragraph but are globally dissimilar)."""

from __future__ import annotations

import numpy as np
import pytest

from dedup.config import PARITY_CONFIG
from dedup.substring import _window_hashes, _winnow, substring_pairs
from dedup.synth import corpus_pdf


def _naive_hash(data: bytes, B: int = 1000003) -> int:
    h = 0
    for c in data:
        h = (h * B + c) % (1 << 64)
    return h


class TestRollingHash:
    @pytest.mark.parametrize("text,k", [
        ("abcdefg", 3), ("aaaaaaaa", 4), ("x" * 100 + "y", 64),
        ("the quick brown fox " * 10, 17), ("ü" * 40, 8),
    ])
    def test_matches_naive(self, text, k):
        got = _window_hashes(text, k)
        data = text.encode("utf-8", errors="replace")
        want = [_naive_hash(data[i:i + k]) for i in range(len(data) - k + 1)]
        assert got.astype(object).tolist() == want

    def test_short_text_empty(self):
        assert _window_hashes("ab", 5).size == 0

    def test_equal_windows_equal_hashes(self):
        h = _window_hashes("abcXabcYabc", 3)
        assert h[0] == h[4] == h[8]  # the three 'abc' windows


class TestWinnow:
    def test_guarantee(self):
        # any window of w consecutive hashes contributes >= 1 selection
        rng = np.random.RandomState(0)
        h = rng.randint(0, 2**63, size=500).astype(np.uint64)
        w = 37
        sel = set(_winnow(h, w).tolist())
        for start in range(0, len(h) - w + 1):
            assert any(i in sel for i in range(start, start + w))

    def test_short(self):
        h = np.array([5, 3, 9], dtype=np.uint64)
        assert _winnow(h, 10).tolist() == [1]


class TestSubstringPairs:
    def test_planted_family_detected(self, spark):
        pdf = corpus_pdf(300, seed=42)
        corpus = spark.createDataFrame(pdf[["url", "text"]])
        pairs = {(r["a"], r["b"]): r["substr_len"]
                 for r in substring_pairs(corpus, PARITY_CONFIG).collect()}

        # ground truth: consecutive -2 docs were planted in pairs sharing a
        # ~250-token paragraph
        planted = []
        rows = pdf[pdf["truth_cluster"] == -2].reset_index()
        for i in range(0, len(rows) - 1, 2):
            u1, u2 = rows.loc[i, "url"], rows.loc[i + 1, "url"]
            if u1.rsplit("-", 1)[0] == u2.rsplit("-", 1)[0]:
                planted.append((min(u1, u2), max(u1, u2)))
        assert planted, "fixture contains no planted substring family"
        found = sum(1 for p in planted if p in pairs)
        assert found / len(planted) >= 0.99, (found, len(planted))
        for p in planted:
            if p in pairs:
                assert pairs[p] >= PARITY_CONFIG.substring_min_len

    def test_no_false_long_matches(self, spark):
        # unrelated docs (truth -1, no planted substring) must not produce
        # >= L exact matches beyond coincidence
        pdf = corpus_pdf(200, seed=9)
        sub = pdf[pdf["truth_cluster"] == -1]
        corpus = spark.createDataFrame(sub[["url", "text"]])
        rows = substring_pairs(corpus, PARITY_CONFIG).collect()
        # token-soup texts can coincide briefly but never for 200+ chars
        # except the -alt near-threshold family (edited copies share runs)
        for r in rows:
            assert (r["a"].rsplit("-", 1)[0] == r["b"].rsplit("-", 1)[0]
                    ), f"unexpected substring pair {r}"


class TestRepeatedFingerprintWitness:
    def test_early_decoy_occurrence_does_not_hide_shared_run(self, spark):
        """A doc whose selected k-grams ALSO occur early in unshared junk
        must still pair with a doc sharing the long run: the witness must
        come from INSIDE the run, not the first occurrence (round-5 review
        finding — single-position fingerprints relocated the witness and
        dropped the pair). MAX_POS_PER_FP=1 replicates the old first-
        position-only behavior and must miss the planted pair, proving the
        multi-position emission is what finds it."""
        import random

        import dedup.substring as sub
        from dedup import local_oracle as lo
        from dedup.config import PARITY_CONFIG

        from collections import defaultdict

        rng = random.Random(99)
        alpha = "abcdefghijklmnopqrstuvwxyz "
        S = "".join(rng.choice(alpha) for _ in range(300))
        B = "".join(rng.choice(alpha) for _ in range(150)) + S
        k = 64

        def shared_fps_first_seen_in_run(A):
            """Shared selected fps whose EARLIEST selected occurrence in A
            still lies inside the shared run (i.e. not yet decoyed)."""
            orig = sub.MAX_POS_PER_FP
            try:
                sub.MAX_POS_PER_FP = 1  # old first-position-only view
                fps = lo.local_substring_fingerprints(
                    [("a", A), ("b", B)], PARITY_CONFIG)
            finally:
                sub.MAX_POS_PER_FP = orig
            fa, fb = defaultdict(list), defaultdict(list)
            for url, fp, pos in fps:
                (fa if url == "a" else fb)[fp].append(pos)
            run_start = len(A) - len(S)
            return [(fp, fa[fp][0]) for fp in set(fa) & set(fb)
                    if fa[fp][0] >= run_start]

        # prepend isolated random-flanked decoy copies of each still-bad
        # selected window until every shared fp's first SELECTED occurrence
        # sits in non-extending junk (fresh random flanks each round give
        # the decoy an independent chance of being the winnow local min)
        A = "".join(rng.choice(alpha) for _ in range(80)) + S
        for _ in range(80):
            bad = shared_fps_first_seen_in_run(A)
            if not bad:
                break
            A = "".join(
                "".join(rng.choice(alpha) for _ in range(150)) + A[p:p + k]
                + "".join(rng.choice(alpha) for _ in range(150))
                for _, p in bad) + A
        else:
            raise AssertionError("decoy construction did not converge")

        rows = [("https://x.org/a", A), ("https://x.org/b", B)]

        # old behavior (first position only) misses the pair
        orig = sub.MAX_POS_PER_FP
        try:
            sub.MAX_POS_PER_FP = 1
            old = lo.local_substring_pairs(rows, PARITY_CONFIG)
            assert old == [], f"decoy construction failed to hide: {old}"
        finally:
            sub.MAX_POS_PER_FP = orig

        # new behavior finds it, single-node and Spark agreeing
        want = lo.local_substring_pairs(rows, PARITY_CONFIG)
        assert [(a, b) for a, b, _, _ in want] == [
            ("https://x.org/a", "https://x.org/b")]
        assert want[0][2] >= PARITY_CONFIG.substring_min_len

        c = spark.createDataFrame(rows, "url string, text string")
        got = [(r["a"], r["b"], r["substr_len"], r["match_source"])
               for r in sub.substring_pairs(c, PARITY_CONFIG).collect()]
        assert sorted(got) == sorted(want)
