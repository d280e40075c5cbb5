"""dedup — a PySpark-native near-duplicate detection + clustering engine.

From-scratch Spark implementation of the query/data-processing capabilities
of openeduhub/duplicate-detection (reference, read-only at /root/reference).
The reference is a single-process FastAPI MinHash service; this engine is a
batch pipeline over DataFrames designed for Common-Crawl-scale corpora:

    corpus(url, warc_ts, html, text, lang)
      -> extract (pandas UDF, byte-identical text per url)
      -> signatures (MinHash k perms + SimHash 64-bit, one Arrow pass)
      -> LSH banding (explode + groupBy, AQE/salt-aware)  + norm_url equi-join
      -> verification (cosine parity scoring / exact Jaccard)
      -> connected components (large-star/small-star label propagation)
      -> clusters + metrics + lineage tables (checkpoint/resume)

Parity config mirrors the reference exactly: 100 permutations, seed 42,
word-3-shingles, CRC32 shingle hashing, cosine-of-signature scoring with
threshold 0.9 (reference: app/config.py:37-38, app/hash_detector.py:16,25,52,153).
"""

__version__ = "0.1.0"
