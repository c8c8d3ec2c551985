"""Streaming verification + metrics repository tests."""

import time

import pytest
from pyspark.sql import functions as F

from hooqu_spark.analyzers import Completeness, Maximum, Mean, Minimum, Size
from hooqu_spark.checks import Check, CheckLevel, CheckStatus
from hooqu_spark.repository import MetricsRepository
from hooqu_spark.streaming import StreamingVerification


class TestStreamingVerification:
    def test_incremental_states_match_global(self, spark, tmp_path):
        src = str(tmp_path / "stream_src")
        chk = str(tmp_path / "chk")

        # three "arriving" files
        all_rows = []
        for batch in range(3):
            rows = [
                (batch * 100 + i, float(batch * 100 + i) if i % 5 else None)
                for i in range(100)
            ]
            all_rows += rows
            spark.createDataFrame(rows, "id long, v double").coalesce(
                1
            ).write.mode("append").parquet(src)

        analyzers = [Size(), Minimum("v"), Maximum("v"), Mean("v"), Completeness("v")]
        checks = [
            Check(CheckLevel.ERROR, "stream gate").has_size(lambda n: n > 0)
        ]
        seen_batches = []
        sv = StreamingVerification(
            analyzers, checks, on_batch=lambda bid, res: seen_batches.append(bid)
        )

        stream = spark.readStream.schema("id long, v double").parquet(src)
        q = (
            sv.attach(stream)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        assert sv.batches_processed() >= 1
        metrics = {a.name: m for a, m in sv.current_metrics().items()}

        # cumulative streaming metrics == batch metrics over all data
        batch_df = spark.createDataFrame(all_rows, "id long, v double")
        from hooqu_spark.analyzers import do_analysis_run

        direct = do_analysis_run(batch_df, analyzers)
        for a in analyzers:
            want = direct.metric(a).value.get()
            got = metrics[a.name].value.get()
            assert got == pytest.approx(want, rel=1e-12), a.name

        assert sv.last_result.status == CheckStatus.SUCCESS
        assert seen_batches  # callback fired


class TestMetricsRepository:
    def test_save_load_diff(self, tmp_path, spark, df_with_numeric_values):
        from hooqu_spark.analyzers import Mean, do_analysis_run

        repo = MetricsRepository(str(tmp_path / "repo"))
        ctx = do_analysis_run(df_with_numeric_values, [Mean("att1"), Size()])
        s0 = repo.save("daily", ctx.metric_map)
        s1 = repo.save("daily", ctx.metric_map)
        assert (s0, s1) == (0, 1)

        latest = repo.latest("daily")
        assert set(latest["name"]) == {"Mean", "Size"}
        assert latest[latest["name"] == "Mean"]["value"].iloc[0] == 3.5

        series = repo.diff("daily", "Mean", "att1")
        assert list(series["seq"]) == [0, 1]
        assert list(series["value"]) == [3.5, 3.5]

    def test_empty_load(self, tmp_path):
        repo = MetricsRepository(str(tmp_path / "repo2"))
        assert repo.load().empty
        assert repo.latest("x").empty
