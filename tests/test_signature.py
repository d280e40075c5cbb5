"""Signature-stage parity through Spark: the mapInPandas signatures table
must equal the reference's per-document signatures bit-for-bit (SURVEY §5.1-2),
plus SimHash sanity (engine extra)."""

from __future__ import annotations

import numpy as np

from dedup.config import PARITY_CONFIG, DedupConfig
from dedup.signature import (char_shingle_hashes, signatures_table, simhash64,
                             tokenize)
from dedup.synth import corpus_pdf


class TestSignatureStage:
    def test_stage_matches_reference(self, spark, detector):
        pdf = corpus_pdf(120, seed=3)
        df = spark.createDataFrame(pdf[["url", "text"]])
        rows = signatures_table(df, PARITY_CONFIG).collect()
        assert len(rows) == len(pdf)
        by_url = {r["url"]: r for r in rows}
        for _, doc in pdf.iterrows():
            ref_sig = detector.compute_text_signature(doc["text"])
            got = by_url[doc["url"]]
            if ref_sig is None:
                assert got["minhash"] is None
            else:
                np.testing.assert_array_equal(
                    np.array(got["minhash"], dtype=np.float64), ref_sig)

    def test_shingles_column_matches_reference_set(self, spark, detector):
        pdf = corpus_pdf(60, seed=5)
        df = spark.createDataFrame(pdf[["url", "text"]])
        rows = signatures_table(df, PARITY_CONFIG, keep_shingles=True).collect()
        by_url = {r["url"]: r for r in rows}
        for _, doc in pdf.iterrows():
            words = detector._tokenize(doc["text"])
            expect = detector._create_shingles(words, 3)
            got = by_url[doc["url"]]["shingles"]
            if not words:
                assert got is None
            else:
                # stored as int32 bit patterns of the uint32 crc32 values,
                # sorted in the unsigned domain
                unsigned = [v & 0xFFFFFFFF for v in got]
                assert set(unsigned) == expect
                assert unsigned == sorted(unsigned)

    def test_n_tokens(self, spark, detector):
        pdf = corpus_pdf(40, seed=9)
        df = spark.createDataFrame(pdf[["url", "text"]])
        rows = signatures_table(df, PARITY_CONFIG).collect()
        by_url = {r["url"]: r["n_tokens"] for r in rows}
        for _, doc in pdf.iterrows():
            assert by_url[doc["url"]] == len(detector._tokenize(doc["text"]))


class TestSimHash:
    @staticmethod
    def _sim(text):
        from dedup.signature import shingle_hashes
        sh = shingle_hashes(tokenize(text), 3)
        return simhash64(np.fromiter(sh, dtype=np.uint64, count=len(sh)))

    def test_deterministic_and_locality(self):
        t1 = "the quick brown fox jumps over the lazy dog " * 20
        t2 = t1.replace("lazy", "sleepy", 3)
        t3 = "completely different content about mathematics " * 20
        s1, s1b = self._sim(t1), self._sim(t1)
        s2, s3 = self._sim(t2), self._sim(t3)
        assert s1 == s1b

        def ham(a, b):
            return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

        assert ham(s1, s2) < ham(s1, s3)

    def test_empty(self):
        assert simhash64(np.array([], dtype=np.uint64)) == 0

    def test_char_shingle_mode(self):
        """The vectorized rolling hash must equal the per-window spec:
        fmix32(sum_{j<k} byte[i+j] * B^j mod 2^32)."""
        M = 1 << 32
        B = 0x9E3779B1

        def fmix(x):
            x ^= x >> 16
            x = (x * 0x85EBCA6B) % M
            x ^= x >> 13
            x = (x * 0xC2B2AE35) % M
            x ^= x >> 16
            return x

        def slow(s: bytes, k: int):
            k = min(k, len(s))
            return sorted({
                fmix(sum(s[i + j] * pow(B, j, M) for j in range(k)) % M)
                for i in range(len(s) - k + 1)})

        words = tokenize("hello world again and again")
        got = char_shingle_hashes(words, 9)
        assert got.dtype == np.uint64
        assert got.tolist() == slow(" ".join(words).encode(), 9)
        short = char_shingle_hashes(tokenize("hi yo"), 9)
        assert short.tolist() == slow(b"hi yo", 9)
        assert char_shingle_hashes([], 9).size == 0

    def test_minhash_fast_mod_equals_division(self):
        """The strength-reduced mod-p must equal literal (a*s+b) % p."""
        from dedup.config import MINHASH_PRIME
        from dedup.signature import minhash_signature

        rng = np.random.RandomState(9)
        A = rng.randint(0, 2**32, size=64, dtype=np.uint64)
        B = rng.randint(0, 2**32, size=64, dtype=np.uint64)
        s = rng.randint(0, 2**32, size=500, dtype=np.uint64)
        # include extremes
        s[:3] = [0, 1, 2**32 - 1]
        A[:2] = [2**32 - 1, 0]
        B[:2] = [2**32 - 1, 0]
        got = minhash_signature(s, A, B)
        want = ((A[:, None] * s[None, :] + B[:, None])
                % np.uint64(MINHASH_PRIME)).min(axis=1).astype(np.int64)
        assert np.array_equal(got, want)
