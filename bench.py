"""Benchmark harness: headline queries at SPARK_GRAFT_SF_DIR plus the
north-rule scaling evidence (identical pipeline job at local[8] vs
local[32] on identical parquet input -> docs/sec at both + scaling
efficiency; target >= 0.8 at 4x cores).

Prints ONE JSON line:
{"metric": "...", "value": total_sec, "unit": "sec",
 "queries": {...}, "sf": ...}

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_DOCS (default 120000),
SPARK_GRAFT_SCALING (default 1 -> run the local[8]-vs-local[32] pair).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "120000"))
RUN_SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") != "0"
PAGES_DIR = "/tmp/hooqu_bench_pages"


def make_session(cores: int):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"hooqu-bench-{cores}")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def timed(fn):
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def timed_min(fn, reps: int = 2):
    """Min over reps — the standard defense against noisy-neighbor
    windows on this shared VM (single-shot timings swing 2x)."""
    return min(timed(fn) for _ in range(reps))


def _burn(reps: int) -> None:
    """Calibration worker: the ACTUAL enrich kernel over a fixed doc
    set — measures what this host can do for this workload with plain
    multiprocessing (no Spark), the ceiling Spark is judged against."""
    from hooqu_spark.pipeline.features import compute_doc_features
    from hooqu_spark.pipeline.synth import make_doc

    texts = [make_doc(i)["text"] for i in range(200)]
    for _ in range(reps):
        for t in texts:
            compute_doc_features(t)


def _raw_cpu_rate(procs: int, reps: int = 4) -> float:
    """Aggregate kernel work rate (docs/sec) of `procs` plain
    multiprocessing workers — the hardware calibration baseline."""
    import multiprocessing as mp

    with mp.get_context("fork").Pool(procs) as pool:
        pool.map(_burn, [1] * procs)  # warm imports
        t0 = time.perf_counter()
        pool.map(_burn, [reps] * procs)
        wall = time.perf_counter() - t0
    return procs * 200 * reps / wall


def pipeline_job(spark, pages_path: str) -> None:
    """The scaling-measured job: parquet scan -> single-pass Arrow
    enrich (langid+ppl+heuristics+scrub) -> rule gating -> full metric
    aggregation.  Compute-bound (no sink) so the 8-vs-32-core ratio
    reflects the engine, not local-disk contention."""
    from pyspark.sql import functions as F

    from hooqu_spark.pipeline import DEFAULT_RULES, apply_rules, enrich

    # prune the fat binary column before the Arrow UDF stage (Catalyst
    # does not prune through the Python eval node)
    pages = spark.read.parquet(pages_path).select("url", "warc_ts", "text", "lang")
    enriched = apply_rules(enrich(pages), DEFAULT_RULES)
    enriched.agg(
        F.count(F.lit(1)),
        F.sum(F.col("keep").cast("long")),
        F.avg("log_ppl"),
        F.avg("n_words"),
        F.sum("n_emails"),
    ).collect()


def _kernel_ms_per_doc() -> float:
    """Single-core enrich-kernel latency (best-of-5 over 200 synthetic
    docs) — an ABSOLUTE hardware calibration.  The quiet-window gate
    only certifies the 8-vs-32 scaling RATIO, which stays high when a
    neighbor loads all cores uniformly; this number catches uniform
    slowdowns, so cross-ROUND comparisons of the committed artifacts
    can separate host decay from code regressions (round 1 measured
    0.24 ms/doc on this kernel; a committed round reading 0.36 means
    every absolute seconds figure carries a ~1.5x host handicap)."""
    from hooqu_spark.pipeline.features import compute_doc_features
    from hooqu_spark.pipeline.synth import make_doc

    texts = [make_doc(i)["text"] for i in range(200)]
    for t in texts:  # warm
        compute_doc_features(t)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        for t in texts:
            compute_doc_features(t)
        best = min(best, time.perf_counter() - t0)
    return best / 200 * 1000


def _wait_for_quiet_window(max_attempts: int = 4, sleep_s: int = 45) -> float:
    """Gate the benchmark on a quiet host: measure the hardware CPU
    scaling calibration (8 vs 32 plain-multiprocessing workers on the
    actual kernel) and, if the host is visibly loaded (ratio << 4x),
    sleep and retry a bounded number of times.  Round 2's committed
    artifact was captured in a window with calibration 0.622 and
    recorded two spurious ~20% regressions — the driver's artifact is
    the record, so the bench itself must defend its window.  Returns
    the calibration of the window the bench proceeds in (recorded as
    ``hw_gate_calibration``; excluded from the seconds total)."""
    eff = 0.0
    for attempt in range(max_attempts):
        rate8 = max(_raw_cpu_rate(8) for _ in range(2))
        rate32 = max(_raw_cpu_rate(32) for _ in range(2))
        eff = (rate32 / rate8) / 4.0
        # > 1.25 is as dirty as < 0.75: a physically impossible ratio
        # means a neighbor burst crushed the 8-proc measurement (one
        # run recorded 4.68), i.e. the window is unstable, not quiet
        if 0.75 <= eff <= 1.25 or attempt == max_attempts - 1:
            break
        time.sleep(sleep_s)
    return eff


def main() -> None:
    queries: dict[str, float] = {}

    spark = make_session(CPUS)

    # one-time deterministic input for the pipeline benchmarks
    from hooqu_spark.pipeline import synthesize

    if not os.path.isdir(PAGES_DIR):
        synthesize(spark, N_DOCS, partitions=max(CPUS, 8)).write.mode(
            "overwrite"
        ).parquet(PAGES_DIR)

    # -- headline 1: fused-scan metric suite on lineitem -------------------
    def q_suite():
        from hooqu_spark import Check, CheckLevel, VerificationSuite

        lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        (
            VerificationSuite()
            .on_data(lineitem)
            .add_check(
                Check(CheckLevel.ERROR, "bench")
                .has_size(lambda n: n > 0)
                .is_complete("l_orderkey")
                .has_min("l_quantity", lambda v: v >= 0)
                .has_max("l_extendedprice", lambda v: v > 0)
                .has_mean("l_discount", lambda v: 0 <= v <= 1)
                .has_standard_deviation("l_tax", lambda v: v >= 0)
                .has_sum("l_quantity", lambda v: v > 0)
                .is_non_negative("l_quantity")
                .is_contained_in("l_returnflag", ("A", "N", "R"))
                .has_quantile("l_quantity", 0.5, lambda v: v > 0)
            )
            .run()
        )

    # -- headline 2: grouping analyzer (shuffle path) -----------------------
    def q_uniqueness():
        from hooqu_spark.analyzers import Uniqueness

        lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        Uniqueness(["l_orderkey", "l_linenumber"]).calculate(lineitem)

    # -- headline 4: minhash dedup on documents -----------------------------
    def q_dedup():
        from hooqu_spark.ops import minhash_dedup

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        minhash_dedup(docs, "doc_id", threshold=0.7).count()

    # -- headline 5: brute-force cosine top-k -------------------------------
    def q_topk():
        from hooqu_spark.ops import brute_force_topk

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        q = emb.where("vec_id = 3").first()["embedding"]
        brute_force_topk(emb, list(q), k=10).collect()

    # -- headline 6: extension analyzers (correlation + MI + histograms) ----
    def q_extensions():
        from hooqu_spark.analyzers import (
            Correlation,
            DataTypeHistogram,
            Entropy,
            Histogram,
            MutualInformation,
            do_analysis_run,
        )

        lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        do_analysis_run(
            lineitem,
            [
                Correlation("l_quantity", "l_extendedprice"),
                MutualInformation(["l_returnflag", "l_linestatus"]),
                Histogram("l_returnflag"),
                Entropy(["l_returnflag"]),
                DataTypeHistogram("l_linestatus"),
            ],
        )

    # -- headline 7: column profiler (fused pass + histograms) --------------
    def q_profile():
        from hooqu_spark.profiler import profile_columns

        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        profile_columns(orders)

    # -- headline 8: skew-safe salted aggregation ---------------------------
    def q_salted():
        from hooqu_spark.ops import salted_counts

        lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        salted_counts(lineitem, ["l_returnflag"], n_salts=32).collect()

    # -- gated headline measurement -----------------------------------------
    # Round 3's committed artifact recorded its scaling runs in a dirty
    # window because the quiet-window gate only guarded the START of the
    # bench; round 4's interim run showed the inverse failure — the
    # per-attempt-gated scaling section cleared its target while the
    # headline queries (gated only at start, where the gate gave up at
    # 0.713) inflated ~40%.  So the headline block is now the same shape
    # as the scaling section: gate -> run every query -> post-hoc hw
    # re-measure that certifies the window HELD through the runs; a
    # dirty attempt retries (bounded) and the best-certified attempt is
    # the committed record.  min-of-3 reps on the queries that drifted
    # on window noise in past rounds (minhash, profiler, salted).
    pipeline_job(spark, PAGES_DIR)  # warm-up (python workers, JIT)
    q_extensions()  # warm (codegen, window/percentile classes)
    q_profile()  # warm

    headline = [
        ("verification_suite_lineitem", q_suite, 2),
        ("uniqueness_lineitem_pk", q_uniqueness, 2),
        ("minhash_dedup_documents", q_dedup, 3),
        ("topk_cosine_embeddings", q_topk, 2),
        ("extension_analyzers_lineitem", q_extensions, 2),
        ("profile_columns_orders", q_profile, 3),
        # min-of-3: the r3 committed salted value drifted 0.40 -> 0.53s
        # purely on window noise at ~0.1s absolute; one extra rep settles it
        ("salted_counts_lineitem", q_salted, 3),
    ]

    def _headline_attempt() -> dict:
        gate = _wait_for_quiet_window() if RUN_SCALING else -1.0
        res: dict[str, float] = {}
        t_pipeline = min(
            timed(lambda: pipeline_job(spark, PAGES_DIR)) for _ in range(3)
        )
        res["pipeline_enrich_rules_docs"] = t_pipeline
        res["pipeline_docs_per_sec"] = round(N_DOCS / t_pipeline, 1)
        for name, fn, reps in headline:
            res[name] = timed_min(fn, reps)
        post = (
            (_raw_cpu_rate(32) / _raw_cpu_rate(8)) / 4.0
            if RUN_SCALING
            else -1.0
        )
        return {
            "queries": res,
            "gate": gate,
            "post": post,
            "kernel_ms": _kernel_ms_per_doc() if RUN_SCALING else -1.0,
            "cert": min(gate, post),
        }

    # Selection contract (ADVICE r4): every attempt's gate/post/kernel
    # calibrations are recorded in the artifact (attempt_log below),
    # and the committed attempt is chosen by best CERTIFICATION — with
    # a fast-kernel window preferred first, because a slow-kernel
    # window (>~0.29 ms/doc vs round 1's 0.24) inflates every absolute
    # second ~1.2-1.5x while the scaling-ratio gate reads clean.  The
    # chosen attempt's numbers are reported unconditionally (no
    # per-query max-picking across attempts).
    def _headline_score(att: dict) -> tuple:
        return (att["kernel_ms"] <= 0.29, att["cert"])

    headline_log: list[dict] = []
    best_headline = None
    for headline_attempt in range(1, 4):
        att = _headline_attempt()
        headline_log.append(
            {
                "gate": round(att["gate"], 3),
                "post": round(att["post"], 3),
                "kernel_ms": round(att["kernel_ms"], 3),
                "total_sec": round(sum(
                    v for k, v in att["queries"].items()
                    if not k.startswith("pipeline_docs")
                ), 3),
            }
        )
        if best_headline is None or _headline_score(att) > _headline_score(
            best_headline
        ):
            best_headline = att
        if not RUN_SCALING or (
            att["cert"] >= 0.75 and att["kernel_ms"] <= 0.29
        ):
            break
    queries.update(best_headline["queries"])
    if RUN_SCALING:
        # the calibration the HEADLINE timings actually ran under (gate
        # = immediately before, post = immediately after) — recorded
        # separately from hw_cpu_scaling_efficiency, which the scaling
        # section re-measures for its own window
        queries["hw_gate_calibration"] = round(best_headline["gate"], 3)
        queries["hw_post_calibration"] = round(best_headline["post"], 3)
        queries["hw_headline_attempts"] = headline_attempt
        # absolute single-core kernel latency of the window the record
        # was captured in (round 1: 0.24 ms/doc) — normalizes committed
        # seconds across rounds on this decaying shared host
        queries["hw_kernel_ms_per_doc"] = round(
            best_headline["kernel_ms"], 3
        )

    # -- headline 9: skew evidence — zipf-host exact-distinct ---------------
    # A deterministic zipf-ish corpus (one host holding ~60% of 12M
    # rows, every row a distinct user).  NOTE: Spark already two-phases
    # `count_distinct` by (key, value), so THAT plain spelling does not
    # skew; the skew shows in aggregations WITHOUT the rewrite —
    # collect_set/collect_list, applyInPandas, custom UDAFs — where the
    # hot key's entire value set merges on ONE reducer.  We compare the
    # collect_set spelling of exact distinct counting against
    # salted_distinct_counts (same result, value-stable salt), and also
    # record the simulated reducer input spread (max/mean rows per
    # reducer under murmur3 partitioning — the same family Spark's
    # hashpartitioning uses) for the host-keyed vs salted shuffles:
    # the noise-free signal of what a 1000-executor cluster would see.
    if RUN_SCALING:
        from pyspark.sql import functions as F

        from hooqu_spark.ops import salted_distinct_counts

        n_rows, n_hosts = 12_000_000, 2000
        skew = spark.range(n_rows).select(
            F.when(F.col("id") % 5 < 3, F.lit("hot.example.com"))
            .otherwise(
                F.concat(
                    F.lit("h"),
                    F.pmod(F.xxhash64("id"), F.lit(n_hosts)).cast("string"),
                )
            )
            .alias("host"),
            F.col("id").alias("user_id"),
        ).persist()
        skew.count()  # materialize the input outside the timings

        def q_skew_plain():
            skew.groupBy("host").agg(
                F.size(F.collect_set("user_id")).alias("n")
            ).collect()

        def q_skew_salted():
            salted_distinct_counts(skew, ["host"], "user_id", 32).collect()

        queries["skew_distinct_plain_sec"] = timed_min(q_skew_plain)
        queries["skew_distinct_salted_sec"] = timed_min(q_skew_salted)

        def reducer_spread(*cols) -> float:
            loads = [
                r["n"]
                for r in skew.groupBy(
                    F.pmod(F.hash(*cols), F.lit(CPUS)).alias("b")
                )
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            ]
            return max(loads) / (sum(loads) / CPUS)

        salt = F.pmod(F.xxhash64("user_id"), F.lit(32))
        queries["skew_reducer_spread_plain"] = round(
            reducer_spread(F.col("host")), 2
        )
        queries["skew_reducer_spread_salted"] = round(
            reducer_spread(F.col("host"), salt), 2
        )
        skew.unpersist()

    spark.stop()

    # -- scaling evidence: identical job on an 8-CPU vs 32-CPU "machine" ----
    # Faithful N-vs-4N proxy: each measurement runs in a SUBPROCESS whose
    # CPU affinity is pinned to N cores BEFORE Spark starts, so the JVM,
    # its task threads AND the forked Python UDF workers are all confined
    # to N CPUs (plain local[N] does NOT cap python workers — it quietly
    # uses ~2N cores, compressing the measured ratio).  The host is a
    # noisy shared VM, so we also measure a plain-multiprocessing
    # calibration of the same kernel (the hardware ceiling) and report
    # the pipeline's efficiency normalized by it.  Min over interleaved
    # reps defends against neighbor noise.
    if RUN_SCALING:
        lo_cores, hi_cores = 8, min(32, CPUS if CPUS >= 8 else 32)

        # the scaling job needs enough work that fixed per-job costs
        # (scheduling, scan setup) don't mask the parallel fraction;
        # 128 partitions = 4 waves at c32 (bounds straggler loss) while
        # keeping serial driver-side task scheduling at ~0.5s
        scaling_docs = max(N_DOCS, 960000)
        scaling_dir = PAGES_DIR + "_scaling"
        if scaling_docs == N_DOCS:
            scaling_dir = PAGES_DIR
        elif not os.path.isdir(scaling_dir):
            s = make_session(CPUS)
            from hooqu_spark.pipeline import synthesize as _synth

            _synth(s, scaling_docs, partitions=128).write.mode(
                "overwrite"
            ).parquet(scaling_dir)
            s.stop()

        import subprocess

        def _scaling_attempt() -> dict:
            """One gated measurement: hw calibration for THIS window,
            then the two parallelism levels interleaved (2 rounds each,
            min per level) so neighbor noise hits both levels equally,
            then a post-hoc hw re-measure that certifies the window
            stayed quiet through the runs."""
            gate = _wait_for_quiet_window()
            hw_rate = {
                c: max(_raw_cpu_rate(c) for _ in range(3))
                for c in (lo_cores, hi_cores)
            }
            hw_ratio = hw_rate[hi_cores] / hw_rate[lo_cores]
            times = {lo_cores: float("inf"), hi_cores: float("inf")}
            for cores in (lo_cores, hi_cores, lo_cores, hi_cores):
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--scaling-worker", str(cores), scaling_dir],
                    capture_output=True, text=True, check=True,
                    cwd=os.path.dirname(os.path.abspath(__file__)),
                )
                best = float(out.stdout.strip().splitlines()[-1])
                times[cores] = min(times[cores], best)
            post = (_raw_cpu_rate(hi_cores) / _raw_cpu_rate(lo_cores)) / (
                hi_cores / lo_cores
            )
            ratio = (scaling_docs / times[hi_cores]) / (
                scaling_docs / times[lo_cores]
            )
            return {
                "times": times,
                "raw": ratio / (hi_cores / lo_cores),
                "norm": ratio / hw_ratio,
                "hw": hw_ratio / (hi_cores / lo_cores),
                "gate": gate,
                "post": round(post, 3),
            }

        # Round 3's committed artifact recorded raw 0.569 because the
        # quiet-window gate ran only at bench START and the host went
        # noisy by the time this section executed ~10 minutes later.
        # Every attempt re-gates immediately before its runs and a
        # sub-target result retries (bounded).  Selection (ADVICE r4):
        # by best CERTIFICATION (min of gate/post hw calibrations), not
        # by best raw ratio — the best-certified attempt's numbers are
        # reported unconditionally, and every attempt is recorded in
        # the artifact's attempt_log so cross-round readers see the
        # selection.
        scaling_log: list[dict] = []
        best_att = None
        for attempt in range(1, 4):
            att = _scaling_attempt()
            att["cert"] = min(att["gate"], att["post"])
            scaling_log.append(
                {
                    "gate": round(att["gate"], 3),
                    "post": att["post"],
                    "raw": round(att["raw"], 3),
                    "norm": round(att["norm"], 3),
                }
            )
            if best_att is None or att["cert"] > best_att["cert"]:
                best_att = att
            if att["raw"] >= 0.8 and att["cert"] >= 0.75:
                break
        times = best_att["times"]
        queries[f"pipeline_sec_c{lo_cores}"] = times[lo_cores]
        queries[f"pipeline_sec_c{hi_cores}"] = times[hi_cores]
        queries[f"pipeline_docs_per_sec_c{lo_cores}"] = round(
            scaling_docs / times[lo_cores], 1
        )
        queries[f"pipeline_docs_per_sec_c{hi_cores}"] = round(
            scaling_docs / times[hi_cores], 1
        )
        queries["scaling_efficiency_raw"] = round(best_att["raw"], 3)
        queries["hw_cpu_scaling_efficiency"] = round(best_att["hw"], 3)
        queries["scaling_efficiency_hw_normalized"] = round(
            best_att["norm"], 3
        )
        queries["hw_gate_scaling"] = round(best_att["gate"], 3)
        queries["hw_post_scaling"] = best_att["post"]
        queries["scaling_attempts"] = attempt
        # headline number: normalized by measured hardware capability
        # (single shared VM != two clusters; see BENCH/BASELINE.md)
        queries["scaling_efficiency"] = queries["scaling_efficiency_hw_normalized"]

    # -- 10x scale-up evidence (round-5 task #1) ---------------------------
    # The brief's bar is "plans you'd want at 100x scale"; the cheapest
    # hard evidence that the LSH/span dedup shapes hide no O(n^2)
    # candidate blow-up, driver bottleneck or memory cliff is a decade
    # of data: the SAME deterministic dup-bearing corpus generator at
    # 12k and 120k docs (10% exact dups, 10% near dups by
    # construction), measuring the banded-candidate count (must grow
    # ~linearly in docs — banding, never all-pairs) and docs/sec for
    # the minhash candidate path and the CDC span dedup (must hold
    # within ~20% across the decade = linear scan behavior).  The
    # pipeline's own 8x point is already covered by the scaling
    # section (120k headline vs 960k pinned-c32 docs/sec).
    if RUN_SCALING and os.environ.get("SPARK_GRAFT_SF1", "1") != "0":
        from pyspark.sql import functions as F

        s1 = make_session(CPUS)

        def _dedup_corpus(n_docs: int) -> str:
            """Deterministic documents table with built-in duplicate
            structure, identical at every scale: ids ending in 1 carry
            the text of the preceding id (exact dup), ids ending in 2
            carry it with a short appended tail (near dup)."""
            import pandas as pd

            from hooqu_spark.pipeline.synth import make_docs_pdf

            path = f"/tmp/hooqu_bench_dedup_{n_docs}"
            # trust a cached corpus only if the writing job committed
            # (_SUCCESS marker) — a run killed mid-write leaves a
            # partial directory that would silently corrupt the
            # scaling evidence (docs/sec computed against n_docs but
            # measured over fewer rows)
            if os.path.isdir(path) and os.path.exists(
                os.path.join(path, "_SUCCESS")
            ):
                return path

            def gen(batches):
                for pdf in batches:
                    ids = pdf["id"].to_numpy()
                    mod = ids % 10
                    src = ids.copy()
                    src[mod == 1] -= 1
                    src[mod == 2] -= 2
                    texts = make_docs_pdf(src)["text"].tolist()
                    texts = [
                        t + " trailing boilerplate notice appended"
                        if m == 2 else t
                        for t, m in zip(texts, mod)
                    ]
                    yield pd.DataFrame({"doc_id": ids, "text": texts})

            s1.range(0, n_docs, numPartitions=max(CPUS, 32)).mapInPandas(
                gen, "doc_id long, text string"
            ).write.mode("overwrite").parquet(path)
            return path

        from hooqu_spark.ops import repeated_span_dedup
        from hooqu_spark.ops.dedup import (
            lsh_candidate_pairs,
            minhash_signatures,
        )

        def _span_job(d) -> None:
            # checksum aggregate over the REBUILT text: a bare count()
            # lets Catalyst eliminate the rebuild join entirely (the
            # aggregate-keyed right side is provably key-unique), which
            # times the scan instead of the operator
            repeated_span_dedup(d, "doc_id").agg(
                F.sum(F.length("text"))
            ).collect()

        pairs_at: dict[int, int] = {}
        warm = s1.read.parquet(_dedup_corpus(12_000))
        # warm-up: JIT/codegen/Arrow before any timed run, so the 1x
        # numbers measure the operator, not session start-up
        lsh_candidate_pairs(minhash_signatures(warm, "doc_id")).count()
        _span_job(warm)
        for label, n in (("1x", 12_000), ("10x", 120_000)):
            path = _dedup_corpus(n)
            docs = s1.read.parquet(path)

            def q_minhash_pairs():
                pairs_at[n] = lsh_candidate_pairs(
                    minhash_signatures(docs, "doc_id")
                ).count()

            t = timed(q_minhash_pairs)
            queries[f"sf1_minhash_sec_{label}"] = t
            queries[f"sf1_minhash_docs_per_sec_{label}"] = round(n / t, 1)
            queries[f"sf1_minhash_pairs_{label}"] = pairs_at[n]

            t = timed(lambda: _span_job(docs))
            queries[f"sf1_span_sec_{label}"] = t
            queries[f"sf1_span_docs_per_sec_{label}"] = round(n / t, 1)

        # ~1.0 = candidate pairs grew linearly with docs (banding
        # holds); >> 1 would be the quadratic blow-up signal
        queries["sf1_minhash_pairs_growth_vs_linear"] = round(
            pairs_at[120_000] / (10.0 * pairs_at[12_000]), 3
        )
        # throughput retention across the decade (1.0 = perfectly
        # linear; larger runs usually IMPROVE by amortizing fixed cost)
        queries["sf1_minhash_throughput_ratio"] = round(
            queries["sf1_minhash_docs_per_sec_10x"]
            / queries["sf1_minhash_docs_per_sec_1x"],
            3,
        )
        queries["sf1_span_throughput_ratio"] = round(
            queries["sf1_span_docs_per_sec_10x"]
            / queries["sf1_span_docs_per_sec_1x"],
            3,
        )
        s1.stop()
        for n in (12_000, 120_000):
            shutil.rmtree(f"/tmp/hooqu_bench_dedup_{n}", ignore_errors=True)

    # headline total = the sf-scaled queries only; the scaling-evidence
    # runs (pipeline_sec_c8/c32 over the larger fixed-size corpus) are
    # reported as their own keys, not folded into the total
    # skew_* keys are fixed-size synthetic evidence, not sf-scaled
    # queries; hw_* are dimensionless calibration ratios that r2's
    # total accidentally summed as if they were seconds (a units bug:
    # BENCH_r02.json's 14.576 = 13.954s of queries + 0.622 of
    # efficiency) — both excluded, so r3 totals are pure seconds and
    # cross-round comparisons must use the query sum, not r2's raw
    # total
    total = round(
        sum(
            v
            for k, v in queries.items()
            if not k.startswith(
                ("pipeline_docs", "pipeline_sec_c", "scaling", "skew_",
                 "hw_", "sf1_")
            )
        ),
        3,
    )
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    out = {
        "metric": "bench_total_sec",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_docs": N_DOCS,
    }
    # full per-attempt record (ADVICE r4): the committed numbers above
    # are one attempt selected by certification; this is every attempt
    # that ran, so cross-round comparisons can see the selection
    out["attempt_log"] = {"headline": headline_log}
    if RUN_SCALING:
        out["attempt_log"]["scaling"] = scaling_log
    print(json.dumps(out))


def _scaling_worker(cores: int, pages_dir: str) -> None:
    """Run the pipeline job pinned to `cores` CPUs; print best seconds.

    Affinity is set before the JVM launches, so Spark task threads, GC
    and the forked Python UDF workers all inherit the N-CPU budget —
    a faithful stand-in for an N-core executor host.
    """
    os.sched_setaffinity(0, set(range(cores)))
    s = make_session(cores)
    pipeline_job(s, pages_dir)  # warm-up (JIT, arrow, py workers)
    best = min(timed(lambda: pipeline_job(s, pages_dir)) for _ in range(2))
    s.stop()
    print(best)


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--scaling-worker":
        _scaling_worker(int(sys.argv[2]), sys.argv[3])
    else:
        try:
            main()
        finally:
            shutil.rmtree(PAGES_DIR, ignore_errors=True)
            shutil.rmtree(PAGES_DIR + "_scaling", ignore_errors=True)
