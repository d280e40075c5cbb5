"""Function-level parity: engine pure functions vs the reference executed
in-process (SURVEY §5.1). Bit-exact assertions."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from dedup import normalize as dn
from dedup import signature as ds
from dedup.coeffs import generate_coeffs, load_coeffs
from dedup.config import PARITY_CONFIG

TEXTS = [
    "",
    "   ",
    "a",
    "ab",
    "one two",
    "one two three",
    "one two three four five",
    "The Quick   Brown Fox\njumps over\tthe lazy DOG",
    "Die Photosynthese ist ein biologischer Prozess der Pflanzen",
    "中文 文本 测试 near duplicate detection",
    "x " * 500,
    "word" + " word" * 999,
    "a b c d",  # all length-1 tokens dropped except none (len>1 filter)
    "aa bb",    # two tokens -> short-text fallback single shingle
    "string",
    "ümläutößé tëxt nörmâlizatioñ test case",
]

URLS = [
    None,
    "",
    "   ",
    "https://www.Example.com/Page/",
    "http://example.com/page?utm_source=x&utm_medium=y",
    "https://example.com",
    "https://example.com/",
    "HTTPS://WWW.EXAMPLE.COM/A/B/C///",
    "example.com/no-scheme",
    "https://youtu.be/dQw4w9WgXcQ?t=60",
    "https://www.youtube.com/watch?v=dQw4w9WgXcQ&list=PL123&index=2",
    "https://www.youtube.com/embed/dQw4w9WgXcQ",
    "https://www.youtube.com/v/dQw4w9WgXcQ",
    "https://www.youtube.com/shorts/dQw4w9WgXcQ",
    "https://www.youtube.com/live/dQw4w9WgXcQ",
    "https://m.youtube.com/watch?v=dQw4w9WgXcQ",
    "https://www.youtube.com/playlist?list=PL0123456789",
    "https://www.youtube.com/watch?list=PL0123456789",  # /watch without v
    "https://www.youtube.com/@SomeHandle/videos",
    "https://www.youtube.com/channel/UC0123456789/live",
    "https://www.youtube.com/c/SomeName/featured",
    "https://www.youtube.com/user/SomeUser",
    "https://www.youtube.com/results?search_query=abc",
    "https://youtu.be/short",        # id not 11 chars
    "https://www.youtube.com/embed/tooshortid",
    "not a url at all ::: %%%",
    "ftp://example.com/file",
    "https://example.com/page#fragment",
    "https://www.wikipedia.org/wiki/Islam?oldid=5",
]

TITLES = [
    None,
    "",
    "   ",
    "Islam - Wikipedia",
    "Mathematik | Klexikon",
    "Geschichte (planet-schule.de)",
    "Plain Title",
    "Brüche addieren – Lernhelfer und mehr",
    "Etwas : serlo Kurs",
    "Title | Publisher Name",
    "Title | a | b",
    "x" * 1500,
    ("x" * 990) + " - Wikipedia",
    "Dash - NotAPublisher",
    "Name (example.io)",   # tld not in list
    "Name (sub.example.de)",
]


class TestTokenizeShingle:
    @pytest.mark.parametrize("text", TEXTS)
    def test_tokenize(self, detector, text):
        assert ds.tokenize(text) == detector._tokenize(text)

    @pytest.mark.parametrize("text", TEXTS)
    def test_shingles(self, detector, text):
        words = detector._tokenize(text)
        assert ds.shingle_hashes(words, 3) == detector._create_shingles(words, 3)

    @given(st.text(max_size=300))
    @settings(max_examples=200, deadline=None)
    def test_tokenize_prop(self, detector, text):
        assert ds.tokenize(text) == detector._tokenize(text)


class TestCoefficients:
    def test_fixture_matches_reference(self, detector):
        a, b = generate_coeffs(100, 42)
        assert a == detector.coeff_a
        assert b == detector.coeff_b
        A, B = load_coeffs(100, 42)
        assert A.tolist() == detector.coeff_a
        assert B.tolist() == detector.coeff_b


class TestMinHash:
    @pytest.mark.parametrize("text", [t for t in TEXTS])
    def test_signature_bit_exact(self, detector, text):
        A, B = load_coeffs(100, 42)
        ours = ds.compute_text_signature(text, A, B, PARITY_CONFIG)
        theirs = detector.compute_text_signature(text)
        if theirs is None:
            assert ours is None
        else:
            # reference stores float64; every value < 2^33 is exact there
            assert ours is not None
            np.testing.assert_array_equal(ours.astype(np.float64), theirs)

    @given(st.lists(st.integers(0, 2**32 - 1), min_size=1, max_size=200))
    @settings(max_examples=100, deadline=None)
    def test_signature_from_shingles_prop(self, detector, shingles):
        A, B = load_coeffs(100, 42)
        ours = ds.minhash_signature(
            np.array(sorted(set(shingles)), dtype=np.uint64), A, B)
        theirs = detector._compute_signature(set(shingles))
        np.testing.assert_array_equal(ours.astype(np.float64), theirs)

    def test_signature_order_invariant(self):
        A, B = load_coeffs(100, 42)
        sh = np.array([5, 99, 12345, 2**31], dtype=np.uint64)
        a = ds.minhash_signature(sh, A, B)
        b = ds.minhash_signature(sh[::-1].copy(), A, B)
        np.testing.assert_array_equal(a, b)


class TestCosine:
    @pytest.mark.parametrize("t1", TEXTS[4:10])
    @pytest.mark.parametrize("t2", TEXTS[4:10])
    def test_cosine_parity(self, detector, t1, t2):
        from dedup.verify import cosine_similarity
        A, B = load_coeffs(100, 42)
        s1 = ds.compute_text_signature(t1, A, B, PARITY_CONFIG)
        s2 = ds.compute_text_signature(t2, A, B, PARITY_CONFIG)
        if s1 is None or s2 is None:
            return
        ours = cosine_similarity(s1, s2)
        theirs = detector.compute_similarity(
            s1.astype(np.float64), s2.astype(np.float64))
        assert ours == theirs  # identical formula on identical float64 inputs


class TestNormalizeUrl:
    @pytest.mark.parametrize("url", URLS)
    def test_url_parity(self, ref, url):
        assert dn.normalize_url(url) == ref.models.normalize_url(url)

    @pytest.mark.parametrize("url", URLS)
    def test_variants_parity(self, ref, url):
        ours = dn.url_search_variants(url)
        theirs = ref.models.generate_url_search_variants(url)
        assert sorted(ours) == sorted(theirs)

    @given(st.text(max_size=150))
    @settings(max_examples=300, deadline=None)
    def test_url_prop(self, ref, url):
        assert dn.normalize_url(url) == ref.models.normalize_url(url)

    @pytest.mark.parametrize("url", URLS)
    def test_idempotent_on_plain_urls(self, url):
        # normalized non-youtube keys are stable under re-normalization
        n = dn.normalize_url(url)
        if n and "youtube.com" not in n:
            assert dn.normalize_url(n) == n


class TestNormalizeTitle:
    @pytest.mark.parametrize("title", TITLES)
    def test_title_parity(self, ref, title):
        assert dn.normalize_title(title) == ref.models.normalize_title(title)

    @given(st.text(max_size=300))
    @settings(max_examples=300, deadline=None)
    def test_title_prop(self, ref, title):
        assert dn.normalize_title(title) == ref.models.normalize_title(title)


class TestValidity:
    CASES = [None, "", " ", "string", " STRING ", "n/a", "unknown", "ok",
             "ab", "a", ["string"], ["string", "real"], [], [None], 7, 0.5]

    @pytest.mark.parametrize("v", CASES)
    def test_field_validity_parity(self, detector, v):
        assert dn.is_valid_field(v) == detector._is_valid_field(v)

    @pytest.mark.parametrize("v", CASES)
    def test_search_value_validity(self, ref, v):
        from app.wlo_client import WLOClient
        theirs = WLOClient._is_valid_search_value(
            WLOClient.__new__(WLOClient), v)
        assert dn.is_valid_search_value(v) == theirs
