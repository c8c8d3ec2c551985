"""Webtext pipeline tests: synthesis determinism, enrich parity vs the
independent reference implementation (F1 + byte-identical scrub),
gating suite, and checkpoint/resume."""

import pytest
from pyspark.sql import functions as F

from hooqu_spark.checks import CheckStatus
from hooqu_spark.pipeline import (
    DEFAULT_RULES,
    apply_rules,
    enrich,
    lineage_analyzers,
    make_doc,
    make_docs_pdf,
    run_pipeline,
    synthesize,
)
from hooqu_spark.pipeline.reference_impl import f1_score, reference_labels

N_DOCS = 1500


@pytest.fixture(scope="module")
def pages(spark):
    return synthesize(spark, N_DOCS, partitions=8).cache()


@pytest.fixture(scope="module")
def labeled(spark, pages):
    enriched = apply_rules(enrich(pages), DEFAULT_RULES)
    spark_pdf = enriched.select(
        "url", "keep", "scrubbed_text", "lang_pred", "lang"
    ).toPandas()
    ref_pdf = reference_labels(make_docs_pdf(range(N_DOCS)), DEFAULT_RULES)
    merged = spark_pdf.merge(ref_pdf, on="url", suffixes=("_spark", "_ref"))
    assert len(merged) == N_DOCS
    return merged


class TestSynth:
    def test_lexicons_have_no_duplicate_words(self):
        # the DuckDB langid oracle inlines LEXICONS as a VALUES relation
        # and JOINs tokens against it — a duplicated word would multiply
        # its count there while the bitmask kernel counts membership
        # once, silently diverging the cross-engine contract
        from hooqu_spark.pipeline.spec import LEXICONS

        for lang, words in LEXICONS.items():
            assert len(words) == len(set(words)), lang

    def test_deterministic_per_id(self):
        a, b = make_doc(42), make_doc(42)
        assert a == b
        assert make_doc(1) != make_doc(2)

    def test_distributed_matches_local(self, spark, pages):
        sample = (
            pages.where(F.col("url").endswith("/page/7")).toPandas().iloc[0]
        )
        local = make_doc(7)
        assert sample["text"] == local["text"]
        assert sample["url"] == local["url"]
        assert bytes(sample["html"]) == local["html"]

    def test_schema_matches_input_hint(self, pages):
        assert [
            (f.name, f.dataType.simpleString()) for f in pages.schema.fields
        ] == [
            ("url", "string"),
            ("warc_ts", "timestamp"),
            ("html", "binary"),
            ("text", "string"),
            ("lang", "string"),
        ]

    def test_host_skew_present(self, pages):
        hosts = (
            pages.withColumn("host", F.regexp_extract("url", r"https://([^/]+)/", 1))
            .groupBy("host")
            .count()
            .orderBy(F.desc("count"))
            .limit(1)
            .collect()
        )
        assert hosts[0]["count"] > N_DOCS / 100  # hot host


class TestParity:
    def test_keep_drop_f1(self, labeled):
        f1 = f1_score(labeled["keep_ref"], labeled["keep_spark"])
        assert f1 >= 0.99, f"keep/drop F1 {f1} below target"

    def test_scrubbed_text_byte_identical(self, labeled):
        mismatches = (
            labeled["scrubbed_text_spark"] != labeled["scrubbed_text_ref"]
        ).sum()
        assert mismatches == 0

    def test_langid_agreement(self, labeled):
        agree = (labeled["lang_pred_spark"] == labeled["lang_pred_ref"]).mean()
        assert agree == 1.0

    def test_langid_accuracy_on_clean_docs(self, labeled):
        # docs synthesized from a single-language lexicon should be IDed
        clean = labeled[labeled["lang"].isin(["en", "de", "fr", "es", "it"])]
        acc = (clean["lang_pred_spark"] == clean["lang"]).mean()
        assert acc > 0.9

    def test_scrub_actually_redacts(self, labeled):
        scrubbed = labeled["scrubbed_text_spark"]
        assert scrubbed.str.contains("<EMAIL>").any()
        assert scrubbed.str.contains("<CREDIT_CARD>").any()
        assert scrubbed.str.contains("<TOXIC>").any()


class TestKernelFloatExact:
    def test_kernel_float_exact_vs_reference_impl(self):
        """CLAUDE.md invariant: the Spark kernel must stay FLOAT-EXACT
        (==, not approx) vs reference_impl on the synthetic corpus.

        The F1 test cannot catch ulp drift; threshold-adjacent keep
        decisions can flip on it.  log_ppl is the regression target —
        a count-weighted surprisal sum over unique tokens once diverged
        from the reference's per-occurrence accumulation on 118/1500
        docs.
        """
        from hooqu_spark.pipeline.features import compute_doc_features
        from hooqu_spark.pipeline.reference_impl import _ref_doc

        n_checked = 0
        for i in range(N_DOCS):
            text = make_doc(i)["text"]
            got = compute_doc_features(text)
            want = _ref_doc(text, DEFAULT_RULES)
            assert got["log_ppl"] == want["log_ppl"], f"doc {i} log_ppl"
            assert got["lang_score"] == want["lang_score"], f"doc {i}"
            assert got["lang_pred"] == want["lang_pred"], f"doc {i}"
            assert got["scrubbed_text"] == want["scrubbed_text"], f"doc {i}"
            n_checked += 1
        assert n_checked == N_DOCS


class TestPipelineEndToEnd:
    def test_run_pipeline_and_resume(self, spark, pages, tmp_path):
        work = str(tmp_path / "work")
        result = run_pipeline(
            spark, pages, work, rules=DEFAULT_RULES, run_id="r1", n_buckets=8
        )
        assert result.verification.status in (
            CheckStatus.SUCCESS,
            CheckStatus.WARNING,
        )
        assert len(result.processed_buckets) == 8
        n_kept = result.kept.count()
        assert 0 < n_kept < N_DOCS

        # metrics reconstructed from merged per-bucket states must match
        # a direct global computation
        from hooqu_spark.analyzers import Mean, do_analysis_run

        direct = do_analysis_run(result.enriched, [Mean("n_words")]).all_metrics()[0]
        by_key = {a.name + a.instance: m for a, m in result.metrics.items()}
        assert by_key["Meann_words"].value.get() == pytest.approx(
            direct.value.get(), rel=1e-12
        )

        # resume: nothing left to do, same metrics, no reprocessing
        result2 = run_pipeline(
            spark, pages, work, rules=DEFAULT_RULES, run_id="r1", n_buckets=8
        )
        assert result2.processed_buckets == []
        assert len(result2.resumed_buckets) == 8
        assert result2.kept.count() == n_kept

    def test_partial_run_resumes_missing_buckets(self, spark, pages, tmp_path):
        work = str(tmp_path / "work2")
        # simulate a killed run: first run only sees half the buckets
        bucketed = pages.withColumn(
            "b", F.pmod(F.xxhash64(F.col("url")), F.lit(8))
        )
        half = bucketed.where(F.col("b") < 4).drop("b")
        r1 = run_pipeline(spark, half, work, run_id="r2", n_buckets=8)
        done_first = set(r1.processed_buckets)
        assert 0 < len(done_first) <= 8

        r2 = run_pipeline(spark, pages, work, run_id="r2", n_buckets=8)
        assert set(r2.resumed_buckets) == done_first
        assert set(r2.processed_buckets).isdisjoint(done_first)
        # full data now present
        assert r2.enriched.count() == N_DOCS


class TestLineageStates:
    def test_states_merge_equals_global(self, spark, pages, tmp_path):
        from hooqu_spark.analyzers import do_analysis_run
        from hooqu_spark.lineage import (
            compute_partition_states,
            merge_states,
            metrics_from_states,
        )

        enriched = apply_rules(enrich(pages), DEFAULT_RULES).drop("html")
        enriched = enriched.withColumn(
            "bucket", F.pmod(F.xxhash64("url"), F.lit(6)).cast("string")
        ).cache()
        analyzers = lineage_analyzers(DEFAULT_RULES)
        records = compute_partition_states(enriched, analyzers, "bucket")
        merged = metrics_from_states(analyzers, merge_states(records))
        direct = do_analysis_run(enriched, analyzers)
        for a in analyzers:
            got = merged[a].value
            want = direct.metric(a).value
            if want.isFailure:
                assert got.isFailure
            elif a.name == "QuantileSketch":
                assert got.get() == pytest.approx(want.get(), abs=0.2)
            else:
                assert got.get() == pytest.approx(want.get(), rel=1e-9), repr(a)
        enriched.unpersist()
