"""Port of the reference's only assert-based test program
(examples/test_datetime.py) to this engine: generates the same three
timestamped parquet tables, then asserts the same four properties —
dtype round-trip, filters vs datetime/np.datetime64 literals, join on
a timestamp key, groupby on a timestamp key with a known group count.
"""

import datetime
import os
import sys
import tempfile

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import charmpandas_spark as cps  # noqa: E402


def generate(tmp: str) -> dict[str, str]:
    """Reference test_datetime.py:18-53 data shapes."""
    n = 1000
    times = pd.Timestamp("2024-01-01") + pd.to_timedelta(range(n), "D")
    paths = {}
    events = pd.DataFrame({
        "event_id": np.arange(n, dtype="int32"),
        "event_time": times,
        "value": np.random.RandomState(7).randint(1, 100, n).astype("int32"),
    })
    paths["events"] = os.path.join(tmp, "dt_events.parquet")
    events.to_parquet(paths["events"])
    scores = pd.DataFrame({
        "event_time": times,
        "score": np.random.RandomState(8).randint(1, 50, n).astype("int32"),
    })
    paths["scores"] = os.path.join(tmp, "dt_scores.parquet")
    scores.to_parquet(paths["scores"])
    grouped = pd.DataFrame({
        "event_time": np.tile(times[:100], 10),
        "amount": np.random.RandomState(9).randint(1, 10, n).astype("int32"),
    })
    paths["grouped"] = os.path.join(tmp, "dt_grouped.parquet")
    grouped.to_parquet(paths["grouped"])
    return paths


def main():
    spark = cps.get_spark(master="local[4]", shuffle_partitions=4)
    with tempfile.TemporaryDirectory() as tmp:
        paths = generate(tmp)

        # 1. dtype preservation through read -> fetch (ref lines 69-71)
        ev = cps.read_parquet(spark, paths["events"])
        pdf = ev.get()
        assert pd.api.types.is_datetime64_any_dtype(pdf["event_time"])
        assert pdf["event_id"].dtype == np.int32

        # 2. filter vs datetime and np.datetime64 literals (74-91)
        cut = datetime.datetime(2024, 6, 1)
        got = ev[ev["event_time"] >= cut].get()
        want = pdf[pdf["event_time"] >= cut]
        assert len(got) == len(want)
        assert sorted(got["event_id"]) == sorted(want["event_id"])
        cut64 = np.datetime64("2024-03-15")
        got64 = ev[ev["event_time"] < cut64.astype(datetime.datetime)].get()
        assert len(got64) == int((pdf["event_time"]
                                  < pd.Timestamp(cut64)).sum())

        # 3. inner join on a timestamp key keeps both payloads (94-102)
        sc = cps.read_parquet(spark, paths["scores"])
        j = ev.merge(sc, on="event_time", how="inner")
        jp = j.get()
        assert len(jp) == 1000
        assert {"value", "score"} <= set(jp.columns)

        # 4. groupby on timestamp key -> exactly 100 groups (105-113)
        g = cps.read_parquet(spark, paths["grouped"])
        out = g.groupby("event_time")["amount"].sum().get()
        assert len(out) == 100
        assert out["sum(amount)"].sum() == g.get()["amount"].sum()

    print("all datetime assertions passed")
    spark.stop()


if __name__ == "__main__":
    main()
