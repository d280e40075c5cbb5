"""Streaming state-ROW compaction (evict_expired_pair_state): the one
unbounded-growth path left at 100x on a continuous stream was the state
store's bucket-row count (the in-stream TTL empties member LISTS, but rows
lived until checkpoint reset). The offline evict pass must (a) bound the
row count across >= 3 drops, (b) leave live buckets pairing across drops,
(c) refuse to run over unprocessed drops (shared sources log)."""

from __future__ import annotations

import glob
import shutil
import time

import pytest

from dedup.config import PARITY_CONFIG
from dedup.streaming import (evict_expired_pair_state, read_pair_state,
                             run_stream_candidate_pairs)


def _land_drop(spark, base, src, i, lo, hi, prefix="x"):
    rows = [(f"https://{prefix}{j}.org/a",
             "alpha beta gamma delta epsilon zeta eta theta "
             + f"word{j} " * 5)
            for j in range(lo, hi)]
    tmp = f"{base}/tmp{i}"
    (spark.createDataFrame(rows, "url string, text string")
     .coalesce(1).write.parquet(tmp))
    shutil.copy(glob.glob(f"{tmp}/part-*.parquet")[0],
                f"{src}/drop{i}.parquet")


def _run(spark, src, ckpt, out):
    q = run_stream_candidate_pairs(spark, src, ckpt, out, PARITY_CONFIG,
                                   schema="url string, text string")
    q.awaitTermination()


def test_state_rows_bounded_across_drops_with_eviction(spark, tmp_path):
    base, src = str(tmp_path), str(tmp_path / "src")
    ckpt, out = f"{base}/ckpt", f"{base}/out"
    (tmp_path / "src").mkdir()

    # drop 0
    _land_drop(spark, base, src, 0, 0, 20)
    _run(spark, src, ckpt, out)
    rows0 = read_pair_state(spark, ckpt).count()
    assert rows0 > 0

    # a huge TTL evicts nothing and the stream keeps pairing across drops
    assert evict_expired_pair_state(spark, src, ckpt, 10**12,
                                    output_dir=out) == 0
    # new urls y15..y24 carrying the SAME text as x15..x19 (and new texts):
    # y16 can only pair with x16 through bucket state persisted in drop 0
    _land_drop(spark, base, src, 1, 15, 25, prefix="y")
    _run(spark, src, ckpt, out)
    pairs = {(r["a"], r["b"])
             for r in spark.read.parquet(out).collect()}
    assert any({"https://x16.org/a", "https://y16.org/a"} == {a, b}
               for a, b in pairs)

    # ttl=0 evicts EVERY bucket row: state store row count resets instead
    # of accumulating keys-ever-seen
    time.sleep(0.05)
    evicted = evict_expired_pair_state(spark, src, ckpt, 0, output_dir=out)
    assert evicted > 0
    assert read_pair_state(spark, ckpt).count() == 0

    # drop 2 repopulates only with ITS OWN keys -> bounded by live set
    _land_drop(spark, base, src, 2, 100, 110)
    _run(spark, src, ckpt, out)
    rows2 = read_pair_state(spark, ckpt).count()
    assert 0 < rows2 < rows0
    # the sink metadata stayed contiguous: output still readable, and the
    # new drop's intra-drop pairs landed
    pairs = {(r["a"], r["b"]) for r in spark.read.parquet(out).collect()}
    assert any("x100" in a or "x100" in b for a, b in pairs)


def test_evict_refuses_pending_drops(spark, tmp_path):
    base, src = str(tmp_path), str(tmp_path / "src")
    ckpt, out = f"{base}/ckpt", f"{base}/out"
    (tmp_path / "src").mkdir()
    _land_drop(spark, base, src, 0, 0, 10)
    _run(spark, src, ckpt, out)
    _land_drop(spark, base, src, 1, 20, 30)   # landed but NOT processed
    with pytest.raises(RuntimeError, match="unprocessed"):
        evict_expired_pair_state(spark, src, ckpt, 0, output_dir=out)
