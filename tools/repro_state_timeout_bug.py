"""Repro: applyInPandasWithState + ProcessingTimeTimeout kills the worker.

Vanilla PySpark (no dedup code in the stateful function): a stateful
counter that sets a 500 ms timeout. On the first batch where a key times
out, every Python worker dies with "Python worker exited unexpectedly
(crashed)" and an availableNow query re-fires the same timeouts forever.

Root cause (pyspark/worker.py, wrap_grouped_map_pandas_udf_with_state):

    if state.hasTimedOut:
        values = [pd.DataFrame(columns=pd.concat(next(value_series_gen),
                                                 axis=1).columns)]

The hasTimedOut branch infers the input columns by pulling the FIRST data
chunk from `value_series_gen` — but a timed-out key has no data chunks, so
`next()` raises StopIteration straight through the worker main loop.

This is why dedup/streaming.py implements TTL as in-state window expiry
(members list + last_seen_ms) instead of engine timeouts, and why
transformWithStateInPandas (native TTL) is not an option in this sandbox
(its state server requires google.protobuf, which is not installed).

Usage: python tools/repro_state_timeout_bug.py
Expect: "Python worker exited unexpectedly (crashed)" errors in the log and
a query that never terminates (ctrl-C / the 60 s awaitTermination stops it).
"""

from __future__ import annotations

import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from dedup.session import build_session

    spark = build_session("timeout-repro", master="local[2]",
                          shuffle_partitions=2)
    tmp = pathlib.Path(tempfile.mkdtemp())
    (tmp / "in").mkdir()
    spark.createDataFrame([("k1", 1), ("k2", 2)], "k string, v int") \
        .write.parquet(str(tmp / "in" / "d1"))
    src = spark.readStream.schema("k string, v int").parquet(
        str(tmp / "in" / "*"))

    def fn(key, pdfs, state):
        if state.hasTimedOut:  # never reached: the wrapper crashes first
            state.remove()
            yield pd.DataFrame({"k": pd.Series([], dtype="str"),
                                "n": pd.Series([], dtype="int64")})
            return
        n = sum(len(p) for p in pdfs)
        cur = state.get[0] if state.exists else 0
        state.update((cur + n,))
        state.setTimeoutDuration(500)
        yield pd.DataFrame({"k": [key[0]], "n": [cur + n]})

    q = (src.groupBy("k").applyInPandasWithState(
            fn, "k string, n long", "n long", "append",
            GroupStateTimeout.ProcessingTimeTimeout)
         .writeStream.format("parquet")
         .option("path", str(tmp / "out"))
         .option("checkpointLocation", str(tmp / "ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    terminated = q.awaitTermination(60)
    print("terminated within 60s:", terminated,
          "(False + crash errors above = bug reproduced)")
    q.stop()
    spark.stop()


if __name__ == "__main__":
    main()
