"""Corpus-level curation operators: line-frequency dedup, stratified
sampling, benchmark decontamination."""

import pytest
from pyspark.sql import functions as F

from hooqu_spark.ops import (
    dedup_lines_by_frequency,
    flag_contamination,
    stratified_sample,
)


class TestLineDedup:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        boiler = "accept cookies to continue"
        rows = [
            (0, f"unique alpha line\n{boiler}\nmore unique text"),
            (1, f"{boiler}\nanother distinct body"),
            (2, f"third document body\n{boiler}"),
            (3, boiler),             # all-boilerplate doc
            (4, "standalone page"),
            (5, None),               # NULL text
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_frequent_lines_removed_order_preserved(self, docs):
        out = {
            r["doc_id"]: (r["text"], r["n_lines_removed"])
            for r in dedup_lines_by_frequency(
                docs, "doc_id", max_occurrences=2
            ).collect()
        }
        assert out[0] == ("unique alpha line\nmore unique text", 1)
        assert out[1] == ("another distinct body", 1)
        assert out[2] == ("third document body", 1)
        assert out[3] == ("", 1)   # fully boilerplate -> empty
        assert out[4] == ("standalone page", 0)
        assert out[5] == ("", 0)   # NULL -> one empty line, kept

    def test_cap_respected(self, docs):
        # with a cap of 4 the boilerplate (4 occurrences) survives
        out = dedup_lines_by_frequency(docs, "doc_id", max_occurrences=4)
        assert out.agg(F.sum("n_lines_removed")).first()[0] == 0

    def test_short_lines_exempt(self, spark):
        rows = [(i, "a\nbody %d" % i) for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = dedup_lines_by_frequency(
            df, "doc_id", max_occurrences=2, min_line_chars=3
        )
        # "a" occurs 10x but is under min_line_chars -> kept everywhere
        assert out.where(~F.col("text").startswith("a\n")).count() == 0


class TestStratifiedSample:
    @pytest.fixture(scope="class")
    def rows(self, spark):
        data = [(i, "en" if i % 3 else "de") for i in range(3000)]
        return spark.createDataFrame(data, "id long, lang string")

    def test_fractions_approximate_and_deterministic(self, rows):
        out = stratified_sample(rows, "lang", {"en": 0.5, "de": 0.1}, "id")
        counts = {
            r["lang"]: r["n"]
            for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        # 2000 en rows, 1000 de rows
        assert abs(counts["en"] / 2000 - 0.5) < 0.05
        assert abs(counts.get("de", 0) / 1000 - 0.1) < 0.05
        again = stratified_sample(rows, "lang", {"en": 0.5, "de": 0.1}, "id")
        assert sorted(r["id"] for r in out.collect()) == sorted(
            r["id"] for r in again.collect()
        )

    def test_missing_stratum_dropped(self, rows):
        out = stratified_sample(rows, "lang", {"de": 1.0}, "id")
        assert out.where("lang = 'en'").count() == 0
        assert out.where("lang = 'de'").count() == 1000  # fraction 1.0

    def test_subset_monotone(self, rows):
        # a smaller fraction selects a SUBSET of a larger one (same hash)
        small = {r["id"] for r in stratified_sample(rows, "lang", {"en": 0.2}, "id").collect()}
        large = {r["id"] for r in stratified_sample(rows, "lang", {"en": 0.6}, "id").collect()}
        assert small.issubset(large)


class TestContamination:
    def test_overlap_counts(self, spark):
        train = spark.createDataFrame(
            [
                (0, "the quick brown fox jumps over the lazy dog"),
                (1, "a completely unrelated training document here"),
                (2, "quick brown fox appears again in this page"),
                (3, ""),
            ],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            [(100, "the quick brown fox ran")], "qid long, text string"
        )
        out = {
            r["doc_id"]: (r["n_overlap"], r["contaminated"])
            for r in flag_contamination(
                train, bench, "doc_id", min_overlap=2
            ).collect()
        }
        # bench 3-grams: {the quick brown, quick brown fox, brown fox ran}
        assert out[0] == (2, True)   # shares first two
        assert out[1] == (0, False)
        assert out[2] == (1, False)  # only "quick brown fox"
        assert out[3] == (0, False)

    def test_broadcast_in_plan(self, spark):
        train = spark.createDataFrame(
            [(0, "x y z")], "doc_id long, text string"
        )
        bench = spark.createDataFrame([(1, "x y z")], "qid long, text string")
        plan = flag_contamination(train, bench, "doc_id")._jdf.queryExecution().executedPlan().toString()
        assert "Broadcast" in plan


class TestWebOps:
    @pytest.fixture(scope="class")
    def urls(self, spark):
        rows = [
            (0, "HTTPS://Example.COM:443/Path/One#frag"),
            (1, "https://example.com/Path/One"),       # same canonical as 0
            (2, "http://Sub.Example.com:80/"),
            (3, "http://sub.example.com"),             # same canonical as 2
            (4, "https://example.com/Path/One?q=1"),   # query kept
            (5, "https://user:pw@example.com:8443/x"), # userinfo + odd port
            (6, "not a url"),
            (7, None),
        ]
        return spark.createDataFrame(rows, "id long, url string")

    def test_canonical_form(self, urls):
        from hooqu_spark.ops import canonicalize_urls

        out = {
            r["id"]: (r["canonical_url"], r["host"])
            for r in canonicalize_urls(urls).collect()
        }
        assert out[0] == ("https://example.com/Path/One", "example.com")
        assert out[1] == ("https://example.com/Path/One", "example.com")
        assert out[2] == ("http://sub.example.com", "sub.example.com")
        assert out[3] == ("http://sub.example.com", "sub.example.com")
        assert out[4] == ("https://example.com/Path/One?q=1", "example.com")
        assert out[5] == ("https://user:pw@example.com:8443/x", "example.com")
        assert out[6] == ("not a url", "")
        assert out[7] == ("", "")

    def test_url_dedup_collapses_variants(self, urls):
        from hooqu_spark.ops import url_dedup

        ids = {r["id"] for r in url_dedup(urls, "id").collect()}
        assert 0 in ids and 1 not in ids
        assert 2 in ids and 3 not in ids
        assert {4, 5, 6, 7}.issubset(ids)

    def test_host_counts(self, urls):
        from hooqu_spark.ops import host_counts

        counts = {
            r["host"]: r["count"] for r in host_counts(urls).collect()
        }
        assert counts["example.com"] == 4
        assert counts["sub.example.com"] == 2
        assert counts[""] == 2
