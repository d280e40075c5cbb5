"""Tokenize / shingle / MinHash / SimHash — one vectorized Arrow pass.

Parity targets (tested bit-exact vs a live reference import):
- tokenize   — reference app/hash_detector.py:42-50
- shingles   — reference app/hash_detector.py:52-79 (incl. the <3-word
               whole-text single-shingle fallback at :68-72)
- minhash    — reference app/hash_detector.py:81-103: for each permutation i,
               min((a_i * s + b_i) mod p) over the shingle set,
               p = 4294967311. The reference stores float64; every value is
               < p < 2^33 and therefore exact in float64, so we compute and
               store int64 — numerically identical.
- coefficients are NEVER derived on executors; they come from the frozen
  fixture (dedup/coeffs.py) and ride along via closure capture, which Spark
  serializes once per task set (equivalent to an explicit broadcast for
  arrays this small: 2 * num_hashes * 8 bytes).

Engine extras (no reference counterpart; north-star spec):
- SimHash 64-bit fingerprint over the shingle strings (blake2b-64 per
  shingle, sign-summed), Hamming distance via native bit_count(a ^ b).
- optional k-char shingling mode.

Scale notes: the heavy math is numpy inside mapInPandas (Arrow batches,
no per-row Python UDF). The signatures table keeps the shingle array for
exact-Jaccard verification, but downstream stages project it away before
any shuffle — LSH banding and pair shuffles carry only (url, band hashes);
verification joins shingles back by key (SURVEY §4 "spill-aware").
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from dedup.config import MINHASH_PRIME, DedupConfig
from dedup.coeffs import load_coeffs

_P = np.uint64(MINHASH_PRIME)

SIGNATURE_SCHEMA = (
    "url string, norm_url string, norm_redirect string, "
    "minhash array<bigint>, simhash bigint, "
    "shingles array<bigint>, n_tokens int"
)


# --- pure per-document functions (shared with the single-node oracle) --------

def tokenize(text: str | None) -> list[str]:
    """Lowercase whitespace tokens, length > 1 (parity: hash_detector.py:42-50)."""
    if not text:
        return []
    return [w for w in text.lower().split() if len(w) > 1]


def shingle_hashes(words: list[str], shingle_size: int = 3) -> set[int]:
    """CRC32 hashes of word n-grams; texts with < shingle_size words collapse
    to one whole-text shingle (parity: hash_detector.py:52-79).

    Implementation slices ONE pre-joined byte string by token offsets
    instead of join()ing every window — identical bytes reach crc32 (the
    window `" ".join(words[i:i+k])` is exactly the substring of
    `" ".join(words)` spanning those tokens), ~3x faster per doc."""
    if not words:
        return set()
    if len(words) < shingle_size:
        return {zlib.crc32(" ".join(words).encode()) & 0xFFFFFFFF}
    joined = " ".join(words).encode()
    # byte offsets of each token in the joined encoding
    starts = np.empty(len(words), dtype=np.int64)
    pos = 0
    for i, w in enumerate(words):
        starts[i] = pos
        pos += len(w.encode()) + 1
    ends = np.concatenate([starts[shingle_size:] - 1,
                           [len(joined)]])  # end of window i = start of
    view = memoryview(joined)               # token i+k minus the space
    n = len(words) - shingle_size + 1
    return {zlib.crc32(view[int(starts[i]):int(ends[i])]) & 0xFFFFFFFF
            for i in range(n)}


def char_shingle_hashes(words: list[str], k: int) -> set[int]:
    """Engine mode: CRC32 of k-char sliding windows over the space-joined
    token stream (shorter texts collapse to one whole-text shingle)."""
    if not words:
        return set()
    s = " ".join(words)
    if len(s) <= k:
        return {zlib.crc32(s.encode()) & 0xFFFFFFFF}
    enc = s.encode()
    # windows over bytes of the encoded string; ascii-safe for synth corpora,
    # deterministic for any input
    return {
        zlib.crc32(enc[i:i + k]) & 0xFFFFFFFF for i in range(len(enc) - k + 1)
    }


def minhash_signature(shingles: np.ndarray, A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Vectorized MinHash: ((A ⊗ S + B) mod p).min(axis=shingles).

    uint64 arithmetic is exact here: max(a)*max(s) + max(b)
    = (2^32-1)^2 + (2^32-1) < 2^64, so no wraparound — results match the
    reference's arbitrary-precision Python ints bit-for-bit.
    Returns int64 values in [0, p).
    """
    s = shingles.astype(np.uint64, copy=False)
    h = (A[:, None] * s[None, :] + B[:, None]) % _P
    return h.min(axis=1).astype(np.int64)


def simhash64(shingle_hashes_arr: np.ndarray) -> int:
    """64-bit SimHash over the document's shingle hash set: each 32-bit
    shingle hash is expanded to 64 bits with the splitmix64 finalizer
    (fully vectorized — no per-shingle Python), then the classic bit-wise
    sign sum, msb-first. Returned as signed int64 (Spark BIGINT)."""
    if shingle_hashes_arr is None or len(shingle_hashes_arr) == 0:
        return 0
    x = np.asarray(shingle_hashes_arr, dtype=np.uint64).copy()
    # splitmix64 finalizer (public-domain mixing constants)
    x += np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    bits = np.unpackbits(
        x.astype(">u8").view(np.uint8).reshape(-1, 8), axis=1).astype(np.int32)
    votes = (2 * bits - 1).sum(axis=0)           # (64,) sign sums
    out = 0
    for v in votes:
        out = (out << 1) | (1 if v > 0 else 0)
    return int(np.uint64(out).astype(np.int64))


def compute_text_signature(text: str | None, A: np.ndarray, B: np.ndarray,
                           cfg: DedupConfig) -> np.ndarray | None:
    """tokenize -> shingle -> minhash; None for empty/blank text
    (parity: hash_detector.py:105-123)."""
    words = tokenize(text)
    if not words:
        return None
    sh = (char_shingle_hashes(words, cfg.char_shingle_size) if cfg.char_shingles
          else shingle_hashes(words, cfg.shingle_size))
    if not sh:
        return None
    return minhash_signature(np.fromiter(sh, dtype=np.uint64, count=len(sh)), A, B)


# --- Spark stage ---------------------------------------------------------------

def signatures_table(corpus, cfg: DedupConfig, text_col: str = "text",
                     key_col: str = "url", keep_shingles: bool | None = None,
                     extract_html_col: str | None = None,
                     emit_text: bool = False):
    """corpus -> signatures(url, norm_url, norm_redirect, minhash, simhash,
    shingles, n_tokens) — ONE Arrow pass for normalization + tokenize +
    shingle + MinHash + SimHash. Folding norm_url into this mapInPandas
    stage keeps the corpus hot path at exactly one Python stage: standalone
    UDF stages each pay python-worker acquisition per task, which measurably
    stalls wide plans (chained ArrowEval tasks block at ~0% CPU waiting on
    worker spawn).

    Rows whose text yields no signature (empty/blank) are emitted with null
    minhash so callers can count/inspect them; norm keys are still present
    (the reference scores URL-exact matches without a signature,
    app/hash_detector.py:263-266). Filter `minhash IS NOT NULL` before
    banding.

    Shingle arrays are 10-100x wider than everything else combined and only
    exact-Jaccard (engine) mode reads them downstream, so they are emitted
    only when keep_shingles (default: cfg.scoring == "jaccard") — parity
    pipelines write and shuffle a 10x slimmer table.

    With extract_html_col set, HTML-to-text extraction happens INSIDE this
    same pass (one materialization for extract+normalize+sign instead of
    two stage round-trips); emit_text additionally writes the extracted
    text column, which columnar projection serves as the `extracted` table.
    """
    from dedup.extract import extract_text
    from dedup.normalize import (description_block_key, is_valid_field,
                                 normalize_url, title_block_keys)

    if keep_shingles is None:
        keep_shingles = cfg.scoring == "jaccard"
    A, B = load_coeffs(cfg.num_hashes, cfg.seed)
    has_redirect = "redirect_url" in corpus.columns
    # Metadata blocking keys (reference candidate search by title /
    # normalized title / description prefix, app/wlo_client.py:265-311) are
    # emitted only when the corpus actually carries those columns, so
    # text-only corpora keep the slim schema. A document whose text yields
    # no signature falls back to the reference's metadata signature
    # (title + " " + description over the VALID fields — T6,
    # app/hash_detector.py:105-123 via main.py's by-metadata path), so
    # metadata-only records can still be cosine-scored.
    has_title = "title" in corpus.columns
    has_desc = "description" in corpus.columns

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_rows = len(pdf)
            redirects = (pdf["redirect_url"] if has_redirect
                         else pd.Series([None] * n_rows))
            titles = (pdf["title"] if has_title
                      else pd.Series([None] * n_rows))
            descs = (pdf["description"] if has_desc
                     else pd.Series([None] * n_rows))
            if extract_html_col is not None:
                texts = pdf[extract_html_col].map(extract_text)
            else:
                texts = pdf[text_col]
            out_texts = []
            urls, norms, norm_redirs = [], [], []
            sigs, simhashes, shingles_out, ntoks = [], [], [], []
            title_keys_out, desc_keys_out = [], []
            for url, text, redir, title, desc in zip(
                    pdf[key_col], texts, redirects, titles, descs):
                if emit_text:
                    out_texts.append(text)
                urls.append(url)
                norms.append(normalize_url(url))
                norm_redirs.append(normalize_url(redir) if redir else None)
                if has_title or has_desc:
                    title_keys_out.append(title_block_keys(title) or None)
                    desc_keys_out.append(description_block_key(desc))
                words = tokenize(text)
                if not words and (has_title or has_desc):
                    # T6 metadata fallback: sign title + " " + description
                    parts = [v for v in (title, desc) if is_valid_field(v)]
                    words = tokenize(" ".join(parts))
                ntoks.append(len(words))
                if not words:
                    sigs.append(None)
                    simhashes.append(None)
                    shingles_out.append(None)
                    continue
                if cfg.char_shingles:
                    sh = char_shingle_hashes(words, cfg.char_shingle_size)
                else:
                    sh = shingle_hashes(words, cfg.shingle_size)
                arr = np.fromiter(sh, dtype=np.uint64, count=len(sh))
                sigs.append(minhash_signature(arr, A, B))
                simhashes.append(simhash64(arr))
                if keep_shingles:
                    shingles_out.append(np.sort(arr).astype(np.int64))
                else:
                    shingles_out.append(None)
            out = {
                "url": urls,
                "norm_url": norms,
                "norm_redirect": norm_redirs,
                "minhash": sigs,
                "simhash": pd.array(simhashes, dtype="Int64"),
                "shingles": shingles_out,
                "n_tokens": pd.array(ntoks, dtype="int32"),
            }
            if has_title or has_desc:
                out["title_keys"] = title_keys_out
                out["desc_key"] = desc_keys_out
            if emit_text:
                out["text"] = out_texts
            yield pd.DataFrame(out)

    cols = [key_col,
            extract_html_col if extract_html_col is not None else text_col]
    if has_redirect:
        cols.append("redirect_url")
    if has_title:
        cols.append("title")
    if has_desc:
        cols.append("description")
    schema = SIGNATURE_SCHEMA
    if has_title or has_desc:
        schema += ", title_keys array<string>, desc_key string"
    if emit_text:
        schema += ", text string"
    return corpus.select(*cols).mapInPandas(compute, schema=schema)
