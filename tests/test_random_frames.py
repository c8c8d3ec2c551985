"""Seeded random-frame property tests: every §2 analyzer vs pandas.

Restores the breadth of the reference's Hypothesis suite
(``hooqu/tests/test_analyzers.py:36-148``) with a deterministic seeded
generator: ~40 random frames mixing NaN / ±inf / NULL / empty /
all-null columns, each run through ONE fused ``do_analysis_run`` (the
production path) and compared against independent pandas kernels that
mirror the reference's eager implementations.
"""

import math
import re

import numpy as np
import pandas as pd
import pytest

from hooqu_spark.analyzers import (
    Completeness,
    Compliance,
    Maximum,
    Mean,
    Minimum,
    PatternMatch,
    Quantile,
    Size,
    StandardDeviation,
    Sum,
    Uniqueness,
    do_analysis_run,
)

N_FRAMES = 40
SCHEMA = "item string, att1 double, att2 long"
_WORDS = ["a", "bb", "ccc", "x1", "x2", "zz", "a"]
_SPECIALS = [float("nan"), float("inf"), float("-inf"), None]


def random_rows(seed: int):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(0, 40))
    if seed % 7 == 0:
        n = 0  # force empty frames regularly
    items = [
        None if rng.random() < 0.15 else _WORDS[int(rng.integers(len(_WORDS)))]
        for _ in range(n)
    ]
    att1 = [
        _SPECIALS[int(rng.integers(len(_SPECIALS)))]
        if rng.random() < 0.25
        else float(np.round(rng.normal(0, 100), 3))
        for _ in range(n)
    ]
    if seed % 5 == 0:
        att1 = [None] * n  # all-null numeric column
    att2 = [
        None if rng.random() < 0.2 else int(rng.integers(-5, 5))
        for _ in range(n)
    ]
    return list(zip(items, att1, att2))


def assert_metric(metric, expected, label):
    """expected: float (approx-compare, NaN==NaN) or the string 'fail'."""
    if expected == "fail":
        assert metric.value.isFailure, label
        return
    assert metric.value.isSuccess, (label, metric.value)
    got = metric.value.get()
    if isinstance(expected, float) and math.isnan(expected):
        assert math.isnan(got), (label, got)
    elif isinstance(expected, float) and math.isinf(expected):
        assert got == expected, (label, got)
    else:
        assert got == pytest.approx(expected, rel=1e-9, abs=1e-12), (label, got)


def expected_std(series: pd.Series):
    vals = series.to_numpy(dtype=float)
    vals = vals[~np.isnan(vals)]
    if len(vals) == 0:
        return "fail"
    m = vals.mean()
    if math.isinf(m):
        # reference quirk: infinite mean reports an infinite stddev
        return float("inf")
    var = np.mean((vals - m) ** 2)
    return float(math.sqrt(var)) if var >= 0 else float("nan")


def expected_quantile(series: pd.Series, q: float):
    vals = series.dropna()
    if len(vals) == 0:
        return float("nan")  # engine: Success(NaN), pandas 0/0 parity
    return float(vals.quantile(q, interpolation="nearest"))


def expected_uniqueness(series: pd.Series):
    non_null = series.dropna()
    if len(non_null) == 0:
        return "fail"
    counts = non_null.value_counts()
    return float((counts == 1).sum() / len(non_null))


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_analyzers_match_pandas_on_random_frame(spark, seed):
    rows = random_rows(seed)
    df = spark.createDataFrame(rows, SCHEMA)
    pdf = pd.DataFrame(rows, columns=["item", "att1", "att2"])
    n = len(pdf)

    att1 = pdf["att1"].astype(float) if n else pd.Series([], dtype=float)
    att2 = pdf["att2"].astype(float) if n else pd.Series([], dtype=float)

    analyzers = [
        Size(),
        Completeness("item"),
        Completeness("att1"),
        Minimum("att1"),
        Maximum("att1"),
        Sum("att1"),
        Mean("att1"),
        StandardDeviation("att2"),
        Quantile("att2", 0.5),
        Compliance("pos", "att2 > 0"),
        Compliance("big", "att1 > 10", where="att2 >= 0"),
        PatternMatch("item", r"x\d"),
        Uniqueness(["item"]),
        Uniqueness(["item", "att2"]),
        Minimum("att1", where="att2 > 0"),
    ]
    ctx = do_analysis_run(df, analyzers)
    m = {i: ctx.metric(a) for i, a in enumerate(analyzers)}

    assert_metric(m[0], float(n), "size")
    # empty frames: ratio metrics mirror pandas 0/0 -> NaN (Success)
    assert_metric(
        m[1],
        float(pdf["item"].notna().mean()) if n else float("nan"),
        "compl item",
    )
    assert_metric(
        m[2],
        float(att1.notna().mean()) if n else float("nan"),
        "compl att1",
    )
    # min/max/sum/mean: pandas skipna kernels (NaN missing, inf kept)
    assert_metric(m[3], float(att1.min()) if n else float("nan"), "min")
    assert_metric(m[4], float(att1.max()) if n else float("nan"), "max")
    assert_metric(m[5], float(att1.sum()), "sum")
    assert_metric(m[6], float(att1.mean()) if n else float("nan"), "mean")
    assert_metric(m[7], expected_std(att2), "std")
    assert_metric(m[8], expected_quantile(att2, 0.5), "quantile")
    # Compliance: Spark SQL boolean semantics — NULL comparisons are
    # NULL (not counted), and NaN sorts GREATER than any number (so
    # `NaN > 10` is TRUE).  This is the documented predicate dialect;
    # pandas-eval NaN semantics are not mechanically reproducible for
    # arbitrary predicates (`NaN != 5` is True there too).
    raw_att1 = [r[1] for r in rows]
    raw_att2 = [r[2] for r in rows]
    assert_metric(
        m[9],
        float(sum(1 for v in raw_att2 if v is not None and v > 0) / n)
        if n
        else float("nan"),
        "compliance",
    )
    n_sel = sum(1 for v in raw_att2 if v is not None and v >= 0)
    n_num = sum(
        1
        for a, b in zip(raw_att1, raw_att2)
        if b is not None
        and b >= 0
        and a is not None
        and (math.isnan(a) or a > 10)
    )
    assert_metric(
        m[10],
        float(n_num / n_sel) if n_sel else float("nan"),
        "compliance where",
    )
    pat = re.compile(r"x\d")
    assert_metric(
        m[11],
        float(
            sum(1 for v in pdf["item"] if v is not None and pat.search(v)) / n
        )
        if n
        else float("nan"),
        "pattern",
    )
    assert_metric(m[12], expected_uniqueness(pdf["item"]), "uniq item")
    # multi-column uniqueness: rows where ANY key col non-null, grouped
    both = pdf[["item", "att2"]]
    mask = both.notna().any(axis=1)
    if mask.sum():
        counts = (
            both[mask]
            .astype(object)
            .where(both[mask].notna(), None)
            .groupby(["item", "att2"], dropna=False, sort=False)
            .size()
        )
        exp_mc = float((counts == 1).sum() / mask.sum())
    else:
        exp_mc = "fail"
    assert_metric(m[13], exp_mc, "uniq multi")
    filt = att1[att2 > 0]
    assert_metric(
        m[14],
        float(filt.min()) if len(filt) else float("nan"),
        "min where",
    )


@pytest.mark.parametrize("seed", range(100, 100 + 15))
def test_extension_analyzers_match_pandas_on_random_frame(spark, seed):
    """Same strategy for the Deequ-style extension analyzers the
    reference never reached: independent pandas/numpy kernels as the
    oracle on NaN/inf/NULL/empty frames."""
    from hooqu_spark.analyzers import (
        Correlation,
        CountDistinct,
        Distinctness,
        Entropy,
        MaxLength,
        MinLength,
        UniqueValueRatio,
    )

    rows = random_rows(seed)
    df = spark.createDataFrame(rows, SCHEMA)
    pdf = pd.DataFrame(rows, columns=["item", "att1", "att2"])
    n = len(pdf)

    analyzers = [
        Distinctness(["item"]),
        UniqueValueRatio(["att2"]),
        CountDistinct(["item"]),
        Entropy(["item"]),
        MinLength("item"),
        MaxLength("item"),
        Correlation("att1", "att2"),
    ]
    ctx = do_analysis_run(df, analyzers)
    m = {i: ctx.metric(a) for i, a in enumerate(analyzers)}

    items = pdf["item"].dropna() if n else pd.Series([], dtype=object)
    counts = items.value_counts()
    assert_metric(
        m[0],
        float(len(counts) / counts.sum()) if counts.sum() else "fail",
        "distinctness",
    )
    att2 = pdf["att2"].dropna() if n else pd.Series([], dtype=float)
    c2 = att2.value_counts()
    assert_metric(
        m[1],
        float((c2 == 1).sum() / len(c2)) if len(c2) else "fail",
        "uvr",
    )
    # CountDistinct: distinct non-null keys; empty/all-null input is an
    # EmptyState failure (grouping semantics), mirroring the engine
    assert_metric(
        m[2], float(len(counts)) if len(counts) else "fail", "count distinct"
    )
    if counts.sum():
        p = counts / counts.sum()
        exp_entropy = float(-(p * np.log(p)).sum())
    else:
        exp_entropy = "fail"
    assert_metric(m[3], exp_entropy, "entropy")
    # Min/MaxLength mirror Minimum/Maximum's NaN parity on empty input
    lens = items.map(len) if len(items) else pd.Series([], dtype=float)
    assert_metric(
        m[4], float(lens.min()) if len(lens) else float("nan"), "min length"
    )
    assert_metric(
        m[5], float(lens.max()) if len(lens) else float("nan"), "max length"
    )
    # Correlation: pairwise-complete rows (NaN mirrors NULL via
    # nanvl; ±inf rows PARTICIPATE and poison the co-moments to
    # NaN/inf on both sides, so assert only on all-finite frames —
    # degenerate cases must still not crash)
    a = pdf["att1"].astype(float) if n else pd.Series([], dtype=float)
    b = pdf["att2"].astype(float) if n else pd.Series([], dtype=float)
    mask = a.notna() & b.notna()
    av, bv = a[mask].to_numpy(), b[mask].to_numpy()
    finite = np.isfinite(av).all() and np.isfinite(bv).all()
    if finite and len(av) >= 1 and np.std(av) > 0 and np.std(bv) > 0:
        exp_corr = float(
            ((av - av.mean()) * (bv - bv.mean())).mean()
            / (np.std(av) * np.std(bv))
        )
        assert_metric(m[6], exp_corr, "correlation")
