"""Sessionization tests: batch parity against an independent pandas
gaps-and-islands implementation, gap boundary semantics, rollup
consistency, and the streaming session-window path."""

import random
from datetime import datetime, timedelta

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hooqu_spark.ops import session_stats, sessionize, streaming_sessions

GAP = timedelta(minutes=30)


def _pandas_sessions(rows, gap=GAP):
    """Independent reference: gaps-and-islands in pandas.  Spark
    merges session windows that touch, so an event at exactly
    ``prev + gap`` EXTENDS the session; only a strictly larger gap
    starts a new one."""
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"]).dropna()
    out = []
    for uid, grp in pdf.groupby("user_id"):
        ts = sorted(grp["ts"])
        start, last, n = ts[0], ts[0], 1
        for t in ts[1:]:
            if t - last > gap:
                out.append((uid, start, last + gap, n,
                            int((last - start) / timedelta(microseconds=1))))
                start, n = t, 0
            n += 1
            last = t
        out.append((uid, start, last + gap, n,
                    int((last - start) / timedelta(microseconds=1))))
    return sorted(out)


class TestSessionize:
    def test_parity_random_frames(self, spark):
        rng = random.Random(42)
        base = datetime(2024, 3, 1)
        rows = []
        for i in range(400):
            uid = rng.randrange(8)
            # cluster timestamps so sessions genuinely merge: bursts
            # with sub-gap spacing separated by super-gap jumps
            t = base + timedelta(
                hours=rng.randrange(72),
                minutes=rng.randrange(60),
                seconds=rng.randrange(60),
                microseconds=rng.randrange(1_000_000),
            )
            rows.append((uid, t))
        rows.append((0, None))  # null ts dropped
        rows.append((None, base))  # null user dropped
        rows.append((3, rows[5][1]))  # exact duplicate timestamp

        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        got = sorted(
            (
                r.user_id,
                r.session_start,
                r.session_end,
                r.n_events,
                r.session_micros,
            )
            for r in sessionize(df, gap="30 minutes").collect()
        )
        assert got == _pandas_sessions(rows)

    def test_gap_boundary_touching_windows_merge(self, spark):
        base = datetime(2024, 1, 1)
        rows = [
            (1, base),
            (1, base + timedelta(minutes=30)),  # exactly gap -> MERGES
            (2, base),
            (2, base + timedelta(minutes=30, microseconds=1)),  # > gap
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        per_user = {
            r.user_id: r.cnt
            for r in sessionize(df, gap="30 minutes")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        assert per_user == {1: 1, 2: 2}

    def test_session_stats_consistency(self, spark):
        base = datetime(2024, 1, 1)
        rows = [
            (u, base + timedelta(minutes=m))
            for u in (1, 2)
            for m in (0, 10, 90, 95, 200)
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        stats = {
            r.user_id: (r.n_sessions, r.total_events)
            for r in session_stats(df, gap="30 minutes").collect()
        }
        # sessions: {0,10}, {90,95}, {200} -> 3 sessions, 5 events
        assert stats == {1: (3, 5), 2: (3, 5)}


class TestStreamingSessions:
    def test_append_mode_emits_finalized_batch_sessions(
        self, spark, tmp_path
    ):
        """availableNow file stream: sessions whose end falls behind
        the final watermark emit exactly once and match the batch
        sessionize result restricted to that horizon."""
        src = str(tmp_path / "sess_src")
        chk = str(tmp_path / "sess_chk")
        base = datetime(2024, 1, 1, 8, 0)
        rows = [
            (1, base),
            (1, base + timedelta(minutes=10)),  # same session
            (1, base + timedelta(hours=2)),  # new session
            (2, base + timedelta(minutes=5)),
            # late tail event far ahead: advances the watermark past
            # every earlier session's end
            (2, base + timedelta(hours=30)),
        ]
        spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(
            1
        ).write.mode("append").parquet(src)

        stream = spark.readStream.schema("user_id long, ts timestamp").parquet(
            src
        )
        out = streaming_sessions(
            stream, gap="30 minutes", watermark="1 hour"
        )
        q = (
            out.writeStream.format("memory")
            .queryName("sess_out")
            .outputMode("append")
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        emitted = {
            (r.user_id, r.session_start, r.n_events)
            for r in spark.sql("select * from sess_out").collect()
        }
        batch = sessionize(
            spark.read.parquet(src), gap="30 minutes"
        ).collect()
        horizon = base + timedelta(hours=29)  # max ts - 1h watermark
        expect = {
            (r.user_id, r.session_start, r.n_events)
            for r in batch
            if r.session_end <= horizon
        }
        assert emitted == expect
        assert len(expect) == 3  # both of user 1's + user 2's first
