"""Long exact-substring duplicate pass (north-star component; no reference
counterpart — the reference scores whole-document similarity only).

Finds document pairs sharing an exact substring of length >= L even when
global similarity is low (licensing boilerplate, quoted passages, syndicated
article bodies). Design is winnowing fingerprints (Schleimer/Wilkerson/
Aiken, SIGMOD'03) rather than a monolithic suffix array: a suffix array
over concatenated shards cannot scale past one partition's memory, while
winnowing is embarrassingly parallel and reuses the engine's grouped
pair-emission shuffle:

  1. per doc (one Arrow pass): rolling polynomial hashes of all k-char
     windows (numpy, mod 2^64), winnowed by a sliding-min of width w —
     the winnowing guarantee: any shared substring of length >= k + w - 1
     yields at least one shared selected fingerprint;
  2. explode (url, fp, pos) -> grouped pair emission on fp (same skew-aware
     native expansion as LSH banding, dedup/lsh.pairs_within_groups);
  3. exact verification (one Arrow pass over pairs joined with both texts):
     extend the match around the shared fingerprint position by direct
     character comparison -> exact shared-substring length; keep >= L.

Guarantee: L = cfg.substring_min_len, k = window k below, w = L - k + 1.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from dedup.config import DedupConfig
from dedup.lsh import pairs_within_groups

_B = np.uint64(1000003)       # odd base for mod-2^64 polynomial hashing
_FP_SCHEMA = "url string, fp bigint, pos int"
_VERIFY_SCHEMA = "a string, b string, substr_len int, keep boolean"


def _window_hashes(text: str, k: int) -> np.ndarray:
    """uint64 rolling polynomial hashes of every k-byte window, fully
    vectorized. H(i) = sum_{j<k} x[i+j] * B^(k-1-j)  (mod 2^64).

    Identity used: with W[j] = x[j] * B^(n-1-j) and S = prefix-sums of W,
    S[i+k] - S[i] = B^(n-k-i) * H(i); B is odd so B^-1 exists mod 2^64 and
    H(i) recovers exactly via multiplication by inverse powers — all in
    wrapping uint64 arithmetic, no Python loop.
    """
    b = np.frombuffer(text.encode("utf-8", errors="replace"), dtype=np.uint8)
    n = b.size
    if n < k:
        return np.empty(0, dtype=np.uint64)
    x = b.astype(np.uint64)
    powers = np.empty(n, dtype=np.uint64)       # powers[m] = B^m
    powers[0] = np.uint64(1)
    if n > 1:
        np.multiply.accumulate(np.full(n - 1, _B, dtype=np.uint64),
                               out=powers[1:])
    w_all = x * powers[::-1]                     # x[j] * B^(n-1-j)
    S = np.concatenate(([np.uint64(0)], np.cumsum(w_all, dtype=np.uint64)))
    diff = S[k:] - S[:-k]                        # B^(n-k-i) * H(i)
    inv = pow(int(_B), -1, 1 << 64)
    m = n - k + 1
    inv_pows = np.empty(m, dtype=np.uint64)      # inv_pows[i] = B^-(n-k-i)
    inv_pows[0] = np.uint64(pow(inv, n - k, 1 << 64))
    if m > 1:
        np.multiply.accumulate(np.full(m - 1, _B, dtype=np.uint64),
                               out=inv_pows[1:])
        inv_pows[1:] *= inv_pows[0]
    return diff * inv_pows


def _winnow(hashes: np.ndarray, w: int) -> np.ndarray:
    """Indices of sliding-window minima (rightmost-min per window, deduped)."""
    if hashes.size == 0:
        return np.empty(0, dtype=np.int64)
    if hashes.size <= w:
        return np.array([int(np.argmin(hashes))], dtype=np.int64)
    win = np.lib.stride_tricks.sliding_window_view(hashes, w)
    idx = win.argmin(axis=1) + np.arange(win.shape[0])
    return np.unique(idx)


MAX_POS_PER_FP = 8


def _positions_per_fp(h: np.ndarray, sel: np.ndarray) -> np.ndarray:
    """Indices into (h, sel) keeping the earliest MAX_POS_PER_FP positions
    of every distinct fingerprint value, in position order (deterministic)."""
    # stable sort by hash: ties (repeated fingerprints) stay in position
    # order, so each group's first MAX_POS_PER_FP are its earliest
    order = np.argsort(h, kind="stable")
    hs = h[order]
    starts = np.flatnonzero(np.r_[True, hs[1:] != hs[:-1]])
    ends = np.r_[starts[1:], hs.size]
    keep = np.concatenate([order[s:min(e, s + MAX_POS_PER_FP)]
                           for s, e in zip(starts, ends)])
    return np.sort(keep)


def substring_fingerprints(corpus: DataFrame, cfg: DedupConfig,
                           k: int = 64) -> DataFrame:
    """corpus(url, text) -> (url, fp, pos): winnowed k-char fingerprints.
    A within-doc repeated fingerprint emits up to MAX_POS_PER_FP rows (one
    per position) so verification can find a witness INSIDE the shared
    run; pair generation dedupes to (url, fp) first, so the group cap
    semantics are position-count independent."""
    w = max(1, cfg.substring_min_len - k + 1)

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, fps, poss = [], [], []
            for url, text in zip(pdf["url"], pdf["text"]):
                if not text or len(text) < k:
                    continue
                hashes = _window_hashes(text, k)
                sel = _winnow(hashes, w)
                h = hashes[sel].astype(np.int64)
                # keep up to MAX_POS_PER_FP earliest positions per repeated
                # within-doc fingerprint — keeping only the FIRST would
                # relocate the verify witness outside a shared run whenever
                # the selected k-gram also occurs earlier in unshared text,
                # silently dropping a pair the winnowing guarantee promises
                # (the bound keeps pathological self-repetition from
                # exploding the table; beyond it the guarantee degrades
                # like group_cap does)
                for j in _positions_per_fp(h, sel):
                    urls.append(url)
                    fps.append(int(h[j]))
                    poss.append(int(sel[j]))
            yield pd.DataFrame({"url": urls, "fp": fps,
                                "pos": pd.array(poss, dtype="int32")})

    return corpus.select("url", "text").mapInPandas(compute, schema=_FP_SCHEMA)


def substring_pairs(corpus: DataFrame, cfg: DedupConfig,
                    k: int = 64, group_cap: int = 500) -> DataFrame:
    """Exact-substring duplicate edges: (a, b, substr_len,
    match_source='substring'), verified by direct extension around a shared
    fingerprint, keeping pairs with a common substring >= cfg.substring_min_len.
    """
    fps = substring_fingerprints(corpus, cfg, k)
    # candidate pairs + ALL shared witness fingerprint positions per pair
    # (bounded to max_witnesses after a deterministic sort — F.first() here
    # would make the chosen witness, and hence substr_len, run-dependent,
    # and extending a single witness could miss the longest shared run when
    # a pair shares both a short and a long substring).
    max_witnesses = 32
    cand = (pairs_within_groups(fps.select("fp", "url").distinct(),
                                ["fp"], group_cap)
            .join(fps.select(F.col("url").alias("a"), "fp",
                             F.col("pos").alias("pos_a")), ["a"])
            .join(fps.select(F.col("url").alias("b"), F.col("fp").alias("fp_b"),
                             F.col("pos").alias("pos_b")), ["b"])
            .where(F.col("fp") == F.col("fp_b"))
            .groupBy("a", "b")
            .agg(F.slice(
                F.sort_array(F.collect_set(F.struct("pos_a", "pos_b"))),
                1, max_witnesses).alias("witnesses")))

    texts_a = corpus.select(F.col("url").alias("a"), F.col("text").alias("_ta"))
    texts_b = corpus.select(F.col("url").alias("b"), F.col("text").alias("_tb"))
    joined = cand.join(texts_a, "a").join(texts_b, "b")
    min_len = cfg.substring_min_len

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def extend(ba: bytes, bb: bytes, pa: int, pb: int) -> int:
            lo = 0
            while pa - lo > 0 and pb - lo > 0 and ba[pa - lo - 1] == bb[pb - lo - 1]:
                lo += 1
            hi = 0
            while (pa + k + hi < len(ba) and pb + k + hi < len(bb)
                   and ba[pa + k + hi] == bb[pb + k + hi]):
                hi += 1
            return lo + k + hi

        for pdf in batches:
            lens = []
            for ta, tb, wits in zip(pdf["_ta"], pdf["_tb"], pdf["witnesses"]):
                ba = ta.encode("utf-8", errors="replace")
                bb = tb.encode("utf-8", errors="replace")
                best = 0
                for w in wits:
                    best = max(best, extend(ba, bb,
                                            int(w["pos_a"]), int(w["pos_b"])))
                lens.append(best)
            out = pd.DataFrame({
                "a": pdf["a"], "b": pdf["b"],
                "substr_len": pd.array(lens, dtype="int32"),
            })
            out["keep"] = out["substr_len"] >= min_len
            yield out

    return (joined.mapInPandas(verify, schema=_VERIFY_SCHEMA)
            .where("keep")
            .select("a", "b", "substr_len")
            .withColumn("match_source", F.lit("substring")))
