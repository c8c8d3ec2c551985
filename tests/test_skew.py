"""Salted two-phase aggregation (skew handling)."""

import pytest
from pyspark.sql import functions as F

from hooqu_spark.ops import (
    salted_agg,
    salted_counts,
    salted_numeric_summary,
    top_hot_keys,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key holding 80% of rows + a long tail
    rows = [("hot.example", float(i % 7)) for i in range(800)]
    rows += [(f"host{i % 40}.example", float(i)) for i in range(200)]
    return spark.createDataFrame(rows, "host string, v double")


class TestSaltedAgg:
    def test_counts_match_plain_groupby(self, skewed):
        plain = {
            r["host"]: r["count"]
            for r in skewed.groupBy("host").count().collect()
        }
        salted = {
            r["host"]: r["count"]
            for r in salted_counts(skewed, ["host"]).collect()
        }
        assert salted == plain

    def test_numeric_summary_matches(self, skewed):
        want = {
            r["host"]: r
            for r in skewed.groupBy("host")
            .agg(
                F.count("v").alias("n"),
                F.sum("v").alias("sum"),
                F.min("v").alias("min"),
                F.max("v").alias("max"),
                F.avg("v").alias("mean"),
            )
            .collect()
        }
        got = {
            r["host"]: r
            for r in salted_numeric_summary(skewed, ["host"], "v").collect()
        }
        assert set(got) == set(want)
        for host, g in got.items():
            w = want[host]
            assert g["n"] == w["n"]
            assert g["sum"] == pytest.approx(w["sum"], rel=1e-12)
            assert g["min"] == w["min"] and g["max"] == w["max"]
            assert g["mean"] == pytest.approx(w["mean"], rel=1e-12)

    def test_phase1_splits_hot_key(self, skewed):
        # the hot key must occupy multiple salt groups in phase 1
        out = salted_agg(
            skewed,
            ["host"],
            {"c": (F.count(F.lit(1)), F.sum("c"))},
            n_salts=8,
        )
        # phase-2 result is correct...
        hot = out.where(F.col("host") == "hot.example").first()
        assert hot["c"] == 800
        # ...and phase 1 genuinely used several salts for the hot key
        from hooqu_spark.ops.skew import _SALT

        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(8)
        )
        n_groups = (
            skewed.where(F.col("host") == "hot.example")
            .select(salt.alias(_SALT))
            .distinct()
            .count()
        )
        assert n_groups >= 4

    def test_deterministic_salt(self, skewed):
        a = sorted(
            (r["host"], r["count"])
            for r in salted_counts(skewed, ["host"]).collect()
        )
        b = sorted(
            (r["host"], r["count"])
            for r in salted_counts(skewed, ["host"]).collect()
        )
        assert a == b

    def test_top_hot_keys(self, skewed):
        rows = top_hot_keys(skewed, ["host"], k=3).collect()
        assert rows[0]["host"] == "hot.example"
        assert rows[0]["count"] == 800
        assert len(rows) == 3
