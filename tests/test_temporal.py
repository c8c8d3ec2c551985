"""As-of join tests: parity with pandas ``merge_asof`` on seeded
random frames, tolerance semantics, and the no-join-node plan."""

import random
from datetime import datetime, timedelta

import pandas as pd
import pytest

from hooqu_spark.ops import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    rng = random.Random(7)
    base = datetime(2024, 5, 1)
    lrows, rrows = [], []
    used = set()
    for i in range(300):
        lrows.append(
            (i, rng.randrange(6), base + timedelta(seconds=rng.randrange(86400)))
        )
    for _ in range(80):
        # unique (key, ts) on the right: equal-ts right rows are
        # documented-ambiguous in any as-of engine
        while True:
            k = rng.randrange(8)  # keys 6,7 never appear on the left
            t = base + timedelta(seconds=rng.randrange(86400))
            if (k, t) not in used:
                used.add((k, t))
                break
        rrows.append((k, t, round(rng.uniform(0, 100), 3)))
    left = spark.createDataFrame(lrows, "event_id long, k long, ts timestamp")
    right = spark.createDataFrame(rrows, "k long, ts timestamp, snap double")
    return left, right, lrows, rrows


def _pandas_asof(lrows, rrows, tolerance=None):
    lpdf = pd.DataFrame(lrows, columns=["event_id", "k", "ts"]).sort_values("ts")
    rpdf = pd.DataFrame(rrows, columns=["k", "ts", "snap"]).sort_values("ts")
    m = pd.merge_asof(
        lpdf,
        rpdf.rename(columns={"ts": "matched_ts"}),
        left_on="ts",
        right_on="matched_ts",
        by="k",
        tolerance=tolerance,
    )
    return {
        r.event_id: (
            None if pd.isna(r.matched_ts) else r.matched_ts,
            None if pd.isna(r.snap) else r.snap,
        )
        for r in m.itertuples()
    }


class TestAsofJoin:
    def test_parity_with_pandas_merge_asof(self, frames):
        left, right, lrows, rrows = frames
        got = {
            r.event_id: (r.matched_ts_asof, r.snap_asof)
            for r in asof_join(left, right, ["k"]).collect()
        }
        assert got == _pandas_asof(lrows, rrows)
        assert len(got) == len(lrows)  # every left row kept

    def test_tolerance_bounds_staleness(self, frames):
        left, right, lrows, rrows = frames
        got = {
            r.event_id: (r.matched_ts_asof, r.snap_asof)
            for r in asof_join(
                left, right, ["k"], tolerance="2 hours"
            ).collect()
        }
        assert got == _pandas_asof(lrows, rrows, pd.Timedelta(hours=2))

    def test_exact_timestamp_matches_inclusively(self, spark):
        base = datetime(2024, 1, 1)
        left = spark.createDataFrame(
            [(1, 1, base)], "event_id long, k long, ts timestamp"
        )
        right = spark.createDataFrame(
            [(1, base, 42.0)], "k long, ts timestamp, snap double"
        )
        [row] = asof_join(left, right, ["k"]).collect()
        assert row.snap_asof == 42.0 and row.matched_ts_asof == base

    def test_null_keys_never_match(self, spark):
        base = datetime(2024, 1, 1)
        left = spark.createDataFrame(
            [(1, None, base + timedelta(hours=1)),
             (2, 5, base + timedelta(hours=1)),
             (3, 5, None)],
            "event_id long, k long, ts timestamp",
        )
        right = spark.createDataFrame(
            [(None, base, 99.0), (5, base, 7.0), (5, None, 13.0)],
            "k long, ts timestamp, snap double",
        )
        got = {
            r.event_id: r.snap_asof
            for r in asof_join(left, right, ["k"]).collect()
        }
        # NULL-key left row: kept, payload NULL (never enriched from
        # the NULL-key right row); NULL-ts left row: kept, NULL; the
        # NULL-ts right row never matches
        assert got == {1: None, 2: 7.0, 3: None}

    def test_malformed_tolerance_rejected_at_api_boundary(self, frames):
        import pytest

        left, right, _, _ = frames
        for bad in ("2 fortnights", "hours 2", "2h", "", "2 hours; DROP",
                    "2 hours OR 1=1", 7,
                    # Spark's INTERVAL parser rejects fractions on any
                    # unit but seconds (INVALID_FRACTION) — the
                    # validator must too, or the Catalyst error it
                    # exists to prevent resurfaces
                    "1.5 hours", "0.5 days", "2 hours 1.5 minutes"):
            with pytest.raises(ValueError):
                asof_join(left, right, ["k"], tolerance=bad)

    def test_compound_tolerance_accepted(self, frames):
        left, right, _, _ = frames
        # valid grammar incl. multi-term intervals parses and runs
        asof_join(left, right, ["k"], tolerance="1 day 30 minutes").collect()
        # fractional SECONDS are the one fraction Spark accepts
        asof_join(left, right, ["k"], tolerance="1.5 seconds").collect()
        asof_join(left, right, ["k"], tolerance="1 minute 1.5 seconds").collect()

    def test_plan_is_one_shuffle_no_join_node(self, frames):
        left, right, _, _ = frames
        p = asof_join(left, right, ["k"])._jdf.queryExecution().executedPlan().toString()
        assert p.count("Exchange hashpartitioning") == 1
        assert "Join" not in p  # union-window form: no join node at all
        assert "CartesianProduct" not in p
