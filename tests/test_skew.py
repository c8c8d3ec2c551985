"""Salted two-phase aggregation (skew handling)."""

import pytest
from pyspark.sql import functions as F

from hooqu_spark.ops import (
    salted_agg,
    salted_counts,
    salted_numeric_summary,
    top_hot_keys,
)


class TestDuplicateClusters:
    def test_chain_collapses_transitively(self, spark):
        from hooqu_spark.ops import duplicate_clusters

        # chain 1~2~3~4 plus isolated pair 10~11: pairwise dedup would
        # under-merge the chain; CC collapses it all to min id 1
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
        )
        got = {
            r["id"]: r["cluster"] for r in duplicate_clusters(pairs).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    def test_dedup_by_clusters_keeps_one_per_component(self, spark):
        from hooqu_spark.ops import dedup_by_clusters

        df = spark.createDataFrame(
            [(i, f"doc{i}") for i in (1, 2, 3, 4, 10, 11, 99)],
            "doc_id long, text string",
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
        )
        kept = {
            r["doc_id"]
            for r in dedup_by_clusters(df, pairs, "doc_id").collect()
        }
        assert kept == {1, 10, 99}  # one survivor per cluster + untouched

    def test_merging_components(self, spark):
        from hooqu_spark.ops import duplicate_clusters

        # two stars joined by a bridge edge -> single component
        pairs = spark.createDataFrame(
            [(5, 6), (5, 7), (20, 21), (20, 22), (7, 22)],
            "id_a long, id_b long",
        )
        got = {
            r["id"]: r["cluster"] for r in duplicate_clusters(pairs).collect()
        }
        assert set(got.values()) == {5}
        assert set(got) == {5, 6, 7, 20, 21, 22}


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
