"""Similarity search over an embedding column (``array<float>``).

Baseline: brute-force cosine top-k — the query vector broadcasts as a
plain Python closure constant into an Arrow-batched numpy matmul
(one GEMV per batch), and ``orderBy().limit(k)`` compiles to Spark's
TakeOrderedAndProject (per-partition heap + driver merge, no global
sort).

Scale path: LSH-bucketed search (signed random projections).  Vectors
land in 2^n_planes buckets; queries probe only their own bucket (plus
optional multi-probe neighbors), so the scan narrows by ~2^n_planes
while recall stays high for near neighbors.
"""

from __future__ import annotations

from typing import Iterator, List, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _vec_matrix(col: pd.Series, dim: int) -> np.ndarray:
    """Arrow batch -> (n, dim) float64 matrix.  NULL (or wrong-length)
    vectors become all-NaN rows instead of crashing the whole batch
    (``np.asarray`` over a ragged list raises) — NaN propagates to a
    NaN score / NaN assignment similarity that callers filter.  The
    homogeneous fast path stays a single zero-copy asarray."""
    vals = col.tolist()
    try:
        mat = np.asarray(vals, dtype=np.float64)
        if mat.ndim == 2 and mat.shape[1] == dim:
            return mat
    except (ValueError, TypeError):
        pass
    mat = np.full((len(vals), dim), np.nan)
    for i, v in enumerate(vals):
        if v is not None and len(v) == dim:
            mat[i] = v
    return mat


def _cosine_udf(query_vec: Sequence[float]):
    from pyspark.sql.functions import pandas_udf

    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)

    @pandas_udf("double")
    def cos(col: pd.Series) -> pd.Series:
        mat = _vec_matrix(col, len(q))  # (batch, dim)
        norms = np.linalg.norm(mat, axis=1)
        dots = mat @ q
        denom = norms * qn
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(denom > 0, dots / denom, 0.0)
        return pd.Series(out)

    return cos


def cosine_scores(
    df: DataFrame, query_vec: Sequence[float], vec_col: str = "embedding"
) -> DataFrame:
    """Per-row cosine vs the query (NULL/ragged vectors score NaN)."""
    return df.withColumn("cosine", _cosine_udf(query_vec)(F.col(vec_col)))


def brute_force_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine; deterministic tie-break on id.

    NaN scores (NULL/degenerate vectors) are excluded BEFORE the sort:
    Spark orders NaN as the LARGEST double, so an unfiltered NULL
    embedding would otherwise win every descending top-k."""
    scored = cosine_scores(df, query_vec, vec_col)
    return (
        scored.select(id_col, "cosine")
        .where(F.col("cosine").isNotNull() & ~F.isnan("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def _projection_planes(dim: int, n_planes: int, seed: int = 13) -> np.ndarray:
    """Deterministic Rademacher (±1) hyperplanes derived from md5 over
    ``(seed, plane, component)`` — engine-portable: integer-exact
    coefficients let any SQL engine replay the sign projection
    bit-for-bit (the numpy-Gaussian construction this replaces could
    not be replayed — BLAS sums in unspecified order over irrational
    literals).  Sign-random projections with ±1 entries carry the same
    cosine-LSH guarantee as Gaussian ones (Charikar '02 simhash
    argument); same derivation pattern as
    :func:`hooqu_spark.ops.dedup._minhash_params`."""
    import hashlib

    out = np.empty((dim, n_planes), dtype=np.float64)
    for j in range(n_planes):
        for i in range(dim):
            h = hashlib.md5(f"{seed}:{j}:{i}".encode()).digest()
            out[i, j] = 1.0 if (h[0] & 1) else -1.0
    return out


def lsh_bucket_expr(
    vec_col: str, dim: int, n_planes: int, seed: int = 13
) -> F.Column:
    """Pure-Catalyst sign-LSH bucket id: for each ±1 hyperplane the
    projection is an EXPLICIT left-associated sum
    ``((e[1]*p1 + e[2]*p2) + e[3]*p3) + …`` — a fixed IEEE-double
    addition order any engine reproduces exactly (``x * ±1.0`` is
    exact), so the bucket assignment is bit-for-bit replayable in the
    DuckDB oracle.  Stays inside whole-stage codegen: no Python, no
    Arrow transfer, unlike :func:`lsh_bucket_udf`."""
    planes = _projection_planes(dim, n_planes, seed)
    total = None
    for j in range(n_planes):
        dot = None
        for i in range(dim):
            term = F.element_at(F.col(vec_col), i + 1) * F.lit(
                float(planes[i, j])
            )
            dot = term if dot is None else dot + term
        bit = F.when(dot > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        total = bit if total is None else total + bit
    return total


def lsh_bucket_udf(dim: int, n_planes: int, seed: int = 13):
    from pyspark.sql.functions import pandas_udf

    planes = _projection_planes(dim, n_planes, seed)
    weights = 1 << np.arange(n_planes, dtype=np.int64)

    @pandas_udf("long")
    def bucket(col: pd.Series) -> pd.Series:
        mat = _vec_matrix(col, dim)
        signs = (mat @ planes) > 0  # NaN rows -> all-False -> bucket 0
        return pd.Series((signs * weights).sum(axis=1).astype(np.int64))

    return bucket


def _multiprobe_buckets(
    q: np.ndarray, planes: np.ndarray, n_probes: int
) -> List[int]:
    """Query bucket + the neighboring codes most likely to hold near
    neighbors (classic multi-probe LSH): flip subsets of the bits whose
    projection margin |q·plane| is smallest, in increasing order of
    total flipped margin."""
    import heapq
    import itertools

    proj = q @ planes
    n_planes = planes.shape[1]
    weights = 1 << np.arange(n_planes, dtype=np.int64)
    base = int(((proj > 0) * weights).sum())
    if n_probes <= 1:
        return [base]
    margins = np.abs(proj)
    order = np.argsort(margins)  # cheapest bits to flip first
    # enumerate flip-sets by total margin with a small heap
    heap = [(margins[order[0]], (0,))]
    seen = {(0,)}
    out = [base]
    while heap and len(out) < n_probes:
        cost, flips = heapq.heappop(heap)
        code = base
        for f in flips:
            code ^= int(weights[order[f]])
        out.append(code)
        last = flips[-1]
        if last + 1 < n_planes:
            grow = flips + (last + 1,)
            if grow not in seen:
                seen.add(grow)
                heapq.heappush(heap, (cost + margins[order[last + 1]], grow))
            swap = flips[:-1] + (last + 1,)
            if swap not in seen:
                seen.add(swap)
                heapq.heappush(
                    heap,
                    (cost - margins[order[last]] + margins[order[last + 1]], swap),
                )
    return out


def lsh_bucketed_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    seed: int = 13,
    n_probes: int = 1,
) -> DataFrame:
    """Approximate top-k: scan only the query's LSH bucket(s).

    ``n_probes > 1`` enables multi-probe LSH — also scan the buckets
    reachable by flipping the lowest-margin hyperplane bits, raising
    recall without adding hash tables (Lv et al., VLDB'07 scheme).

    At 10^12 vectors, pre-materialize the bucket column and
    partition/Z-order the table by it so each probe is a
    partition-pruned scan instead of a full pass.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    planes = _projection_planes(len(q), n_planes, seed)
    probes = _multiprobe_buckets(q, planes, n_probes)

    bucketed = df.withColumn(
        "_bucket", lsh_bucket_udf(len(q), n_planes, seed)(F.col(vec_col))
    )
    probe = bucketed.where(F.col("_bucket").isin(probes))
    return brute_force_topk(probe, query_vec, k, vec_col, id_col)


def _train_centroids(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_centroids: int,
    sample_size: int = 4096,
    n_iters: int = 8,
    seed: int = 29,
) -> np.ndarray:
    """Deterministic spherical k-means on a driver-side sample.

    The sample is the first ``sample_size`` rows by id (deterministic,
    one narrow job); Lloyd iterations run in numpy on L2-normalized
    vectors.  At 10^12 scale replace the driver loop with a few
    ``groupBy(assignment).avg`` jobs over a 0.1% sample — the
    assignment/probe machinery below is unchanged."""
    sample = (
        df.where(F.col(vec_col).isNotNull())
        .select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample_size)
        .collect()
    )
    if not sample:
        # same contract as _train_centroids_distributed — without the
        # guard the empty ndarray (ndim 1) crashes norm(axis=1) with an
        # opaque AxisError
        raise ValueError(
            "cannot train centroids: the input has no non-NULL vectors"
        )
    mat = np.asarray([r[1] for r in sample], dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    # small-table fallback: clamp k to the sample size (same contract
    # as _train_centroids_distributed)
    n_centroids = min(n_centroids, len(mat))
    centroids = mat[rng.choice(len(mat), size=n_centroids, replace=False)]
    for _ in range(n_iters):
        sims = mat @ centroids.T  # cosine on normalized vectors
        assign = sims.argmax(axis=1)
        for c in range(n_centroids):
            members = mat[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids /= np.maximum(
            np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
        )
    return centroids


def _train_centroids_distributed(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_centroids: int,
    sample_size: int = 65536,
    n_iters: int = 8,
) -> np.ndarray:
    """Spherical k-means where each Lloyd iteration is a Spark job —
    the 10^12-scale path: no vector ever collects to the driver except
    the (n_centroids x dim) mean table.

    * sample: deterministic hash sample (``xxhash64(id) % m``) sized to
      ~``sample_size`` rows — stable across partitionings and retries.
    * init: the ``n_centroids`` smallest-id sample vectors
      (deterministic — no RNG, hence no seed parameter; if the sample
      holds fewer rows than ``n_centroids``, k is clamped to the
      sample size, the usual small-table fallback).
    * iterate: assign via the Arrow GEMV udf, then
      ``posexplode -> groupBy(list, dim).avg`` computes per-centroid
      means map-side-combined; only n_centroids*dim tiny rows collect.
    """
    df = df.where(F.col(vec_col).isNotNull())
    total = df.count()
    if total > sample_size:
        mod = max(1, total // sample_size)
        sample = df.where(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(mod)) == 0
        )
    else:
        sample = df
    sample = sample.select(id_col, vec_col).persist()
    try:
        init = [
            np.asarray(r[1], dtype=np.float64)
            for r in sample.orderBy(id_col).limit(n_centroids).collect()
        ]
        if not init:
            raise ValueError(
                "cannot train IVF centroids: the input table is empty"
            )
        n_centroids = min(n_centroids, len(init))
        centroids = np.stack(init[:n_centroids])
        centroids /= np.maximum(
            np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
        )
        for _ in range(n_iters):
            assigned = sample.withColumn(
                "_c", ivf_assign_udf(centroids)(F.col(vec_col))
            )
            rows = (
                assigned.select("_c", F.posexplode(vec_col))
                .groupBy("_c", "pos")
                .agg(F.avg("col").alias("m"))
                .collect()
            )
            new = centroids.copy()
            for r in rows:
                new[r["_c"], r["pos"]] = r["m"]
            new /= np.maximum(
                np.linalg.norm(new, axis=1, keepdims=True), 1e-12
            )
            if np.allclose(new, centroids, atol=1e-9):
                centroids = new
                break
            centroids = new
        return centroids
    finally:
        sample.unpersist()


def ivf_assign_udf(centroids: np.ndarray):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def assign(col: pd.Series) -> pd.Series:
        mat = _vec_matrix(col, centroids.shape[1])
        with np.errstate(invalid="ignore"):
            mat /= np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
            )
            # NaN rows argmax to 0 deterministically; exclude NULL
            # vectors upstream where the assignment matters
            return pd.Series(
                (mat @ centroids.T).argmax(axis=1).astype(np.int32)
            )

    return assign


def ivf_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 29,
    distributed_training: bool = False,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: assign every vector to
    its nearest of ``n_centroids`` spherical-k-means centroids, then
    scan only the ``n_probe`` lists nearest the query.

    ``distributed_training=True`` trains centroids with Spark-job Lloyd
    iterations over a hash sample (the 10^12-scale path); the default
    driver-side numpy k-means suits small/medium tables.

    Scale path: materialize the assignment once and partition the
    table by it — the probe becomes a partition-pruned scan of
    ``n_probe/n_centroids`` of the data.  Recall rises with
    ``n_probe`` (== n_centroids is exhaustive/exact)."""
    if distributed_training:
        centroids = _train_centroids_distributed(
            df, vec_col, id_col, n_centroids
        )
    else:
        centroids = _train_centroids(
            df, vec_col, id_col, n_centroids, seed=seed
        )
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe_lists = np.argsort(-(centroids @ qn))[:n_probe].tolist()

    assigned = df.withColumn(
        "_ivf_list", ivf_assign_udf(centroids)(F.col(vec_col))
    )
    probed = assigned.where(F.col("_ivf_list").isin(probe_lists))
    return brute_force_topk(probed, query_vec, k, vec_col, id_col)


def ivf_build_index(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    seed: int = 29,
    distributed_training: bool = False,
) -> np.ndarray:
    """Materialize the IVF index the docstrings promise: assign every
    vector to its list ONCE and write the table PARTITIONED BY the list
    id (plus a ``<path>_centroids`` parquet of the trained centroids).

    A probe then reads only ``n_probe`` of ``n_centroids`` partition
    directories — real partition pruning at the file-listing level
    (``PartitionFilters`` in the scan), which is the difference between
    "skip rows after reading" and "never open the files" at 10^12
    vectors."""
    spark = df.sparkSession
    if distributed_training:
        centroids = _train_centroids_distributed(
            df, vec_col, id_col, n_centroids
        )
    else:
        centroids = _train_centroids(
            df, vec_col, id_col, n_centroids, seed=seed
        )
    # NULL-embedding rows are excluded from the index: they can never
    # be a nearest neighbor, and assigning them to a real list would
    # pollute that partition's scan
    assigned = df.where(F.col(vec_col).isNotNull()).withColumn(
        "ivf_list", ivf_assign_udf(centroids)(F.col(vec_col))
    )
    assigned.write.partitionBy("ivf_list").mode("overwrite").parquet(path)
    spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "list_id int, centroid array<double>",
    ).write.mode("overwrite").parquet(path + "_centroids")
    return centroids


def ivf_probe_index(
    spark,
    path: str,
    query_vec: Sequence[float],
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k over a materialized IVF index: load centroids, pick the
    ``n_probe`` nearest lists, scan ONLY those partition directories
    (``ivf_list`` is the physical partition column, so the ``isin``
    prunes at file listing)."""
    rows = spark.read.parquet(path + "_centroids").orderBy("list_id").collect()
    centroids = np.asarray([r["centroid"] for r in rows], dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probes = [int(i) for i in np.argsort(-(centroids @ qn))[:n_probe]]
    indexed = spark.read.parquet(path).where(F.col("ivf_list").isin(probes))
    return brute_force_topk(indexed, query_vec, k, vec_col, id_col)


def cosine_similar_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    round_to: int | None = None,
) -> DataFrame:
    """EXACT all-pairs cosine similarity join: every ``(id_a, id_b)``
    with ``id_a < id_b`` and cosine >= threshold — recall 1.0, the
    oracle-able complement to :func:`embedding_near_duplicates` (which
    shares the identical JVM cosine expression but only verifies
    within LSH buckets).

    O(n^2) by construction (broadcast nested-loop join on the id
    inequality), so this is the small-table exact baseline and the
    contract check for the cosine arithmetic; at 10^12 vectors use the
    LSH-bucketed variant.  ``round_to`` rounds the cosine BEFORE the
    threshold comparison — set it when cross-engine reproducibility of
    the borderline decisions matters (the driver contract uses 6)."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    dot = F.aggregate(
        F.zip_with("_va", "_vb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )

    def norm(c: str) -> F.Column:
        return F.sqrt(
            F.aggregate(
                F.transform(c, lambda x: x * x),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )

    # try_divide: a zero-norm (degenerate) embedding yields NULL cosine
    # instead of throwing DIVIDE_BY_ZERO under ANSI mode; NULL fails the
    # >= threshold predicate so degenerate vectors are silently excluded.
    # The DuckDB oracle needs no explicit guard: list_cosine_similarity
    # yields NaN for a zero-norm vector, and NaN likewise fails the
    # >= threshold — the exclusion agrees cross-engine by construction.
    cosine = F.try_divide(dot, norm("_va") * norm("_vb"))
    if round_to is not None:
        cosine = F.round(cosine, round_to)
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.98,
    n_planes: int = 10,
    seed: int = 13,
    round_to: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold, LSH-bucketed: exact
    cosine is verified only within buckets (JVM-side arithmetic on the
    normalized vectors via zip_with/aggregate).

    Bucketing uses the md5-derived ±1 planes via
    :func:`lsh_bucket_expr` — pure Catalyst with a fixed addition
    order, so the whole operator (buckets AND verify) is replayable by
    the DuckDB oracle.  Very wide codegen (dim*n_planes > 8192 terms)
    falls back to the Arrow UDF bucketer, which computes the same
    planes with numpy's summation order (sign differences possible
    only at |projection| ~ 1e-15).  ``round_to`` rounds the cosine
    BEFORE thresholding (cross-engine borderline stability — the
    driver contract uses 6), same contract as
    :func:`cosine_similar_pairs`."""
    probe = df.select(vec_col).where(F.col(vec_col).isNotNull()).first()
    if probe is None:  # no non-NULL vectors -> no pairs
        id_t = df.schema[id_col].dataType.simpleString()
        return df.sparkSession.createDataFrame(
            [], f"id_a {id_t}, id_b {id_t}, cosine double"
        )
    dim = len(probe[0])
    if dim * n_planes <= 8192:
        bucket = lsh_bucket_expr(vec_col, dim, n_planes, seed)
    else:
        bucket = lsh_bucket_udf(dim, n_planes, seed)(F.col(vec_col))
    bucketed = df.withColumn("_bucket", bucket).select(
        id_col, vec_col, "_bucket"
    )
    l, r = bucketed.alias("l"), bucketed.alias("r")
    dot = F.aggregate(
        F.zip_with(
            F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}"), lambda x, y: x * y
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda side: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(F.col(f"{side}.{vec_col}"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    # Same zero-norm guard as cosine_similar_pairs (shared arithmetic
    # contract): degenerate vectors yield NULL, never DIVIDE_BY_ZERO.
    cosine = F.try_divide(dot, norm("l") * norm("r"))
    if round_to is not None:
        cosine = F.round(cosine, round_to)
    return (
        l.join(
            r,
            (F.col("l._bucket") == F.col("r._bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            cosine.alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# Semantic (embedding-cluster) dedup — SemDeDup
# ---------------------------------------------------------------------------

def pairwise_cosine(vec_a: F.Column, vec_b: F.Column) -> F.Column:
    """JVM-side cosine between two array<double> columns — the shared
    arithmetic contract of :func:`cosine_similar_pairs` /
    :func:`embedding_near_duplicates` (zip_with/aggregate sequential
    sums, ``try_divide`` so a zero-norm vector yields NULL, never
    DIVIDE_BY_ZERO under ANSI mode; NULL fails any >= threshold)."""
    dot = F.aggregate(
        F.zip_with(vec_a, vec_b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )

    def norm(c: F.Column) -> F.Column:
        return F.sqrt(
            F.aggregate(
                F.transform(c, lambda x: x * x),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )

    return F.try_divide(dot, norm(vec_a) * norm(vec_b))


def ivf_assign_sim_udf(centroids: np.ndarray):
    """Arrow GEMV assignment like :func:`ivf_assign_udf`, but also
    returns the winning cosine — needed by SemDeDup's keep-farthest-
    from-centroid survivor policy."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<list: int, sim: double>")
    def assign(col: pd.Series) -> pd.DataFrame:
        mat = _vec_matrix(col, centroids.shape[1])
        with np.errstate(invalid="ignore"):
            mat /= np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
            )
            sims = mat @ centroids.T
        best = sims.argmax(axis=1)  # NaN rows -> 0, sim NaN
        return pd.DataFrame(
            {
                "list": best.astype(np.int32),
                "sim": sims[np.arange(len(best)), best],
            }
        )

    return assign


def _train_sem_centroids(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_clusters: int,
    sample_size: int,
    n_iters: int,
    seed: int,
    distributed_training: bool,
) -> np.ndarray:
    train = (
        _train_centroids_distributed
        if distributed_training
        else _train_centroids
    )
    kwargs = {} if distributed_training else {"seed": seed}
    return train(
        df, vec_col, id_col, n_clusters,
        sample_size=sample_size, n_iters=n_iters, **kwargs,
    )


def semantic_duplicate_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 256,
    threshold: float = 0.95,
    round_to: int | None = None,
    sample_size: int = 4096,
    n_iters: int = 8,
    seed: int = 29,
    distributed_training: bool = False,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Within-cluster near-duplicate pairs ``(id_a, id_b, cosine)`` —
    the pair stage of SemDeDup (Abbas et al., arXiv:2303.09540):
    spherical-k-means cluster ids are the BLOCKING key, so the cosine
    join is a cluster-keyed equi-join (all-pairs only within a
    cluster, never globally).  At 100 TB pick ``n_clusters ~ n_docs /
    desired_cluster_size`` so per-cluster pair work stays bounded;
    a pathologically hot cluster is capped upstream the same way hot
    keys are elsewhere (:func:`hooqu_spark.ops.cap_per_key` on the
    cluster id).

    ``n_clusters <= 1`` skips training and blocks everything together
    — exhaustive exact mode (recall 1.0), the correctness/oracle
    configuration the driver contract grades (the partial-cluster
    recall trade-off is covered by pytest, same pattern as
    ``ivf_topk``'s full-probe grading).  ``round_to`` rounds the
    cosine BEFORE thresholding (cross-engine borderline stability).

    NULL-embedding rows never pair (a NULL cosine fails any
    threshold), so they are excluded here up front — which also means
    they always SURVIVE :func:`semantic_dedup`.

    ``centroids`` lets a caller that already trained the k-means model
    (``semantic_dedup``'s centroid_far policy needs it again for the
    survivor scoring) pass it in instead of retraining."""
    df = df.where(F.col(vec_col).isNotNull())
    # no non-NULL vectors: nothing to cluster or pair — fall through
    # the single-block branch (valid empty result with the pair
    # schema) instead of crashing centroid training on an empty sample
    if n_clusters > 1 and centroids is None and df.select(vec_col).first() is None:
        n_clusters = 1
    if n_clusters <= 1:
        assigned = df.select(
            F.col(id_col), F.col(vec_col), F.lit(0).alias("_sem_list")
        )
    else:
        if centroids is None:
            centroids = _train_sem_centroids(
                df, vec_col, id_col, n_clusters, sample_size, n_iters,
                seed, distributed_training,
            )
        assigned = df.select(
            F.col(id_col),
            F.col(vec_col),
            ivf_assign_udf(centroids)(F.col(vec_col)).alias("_sem_list"),
        )
    l = assigned.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("_va"),
        F.col("_sem_list").alias("_la"),
    )
    r = assigned.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("_vb"),
        F.col("_sem_list").alias("_lb"),
    )
    cosine = pairwise_cosine(F.col("_va"), F.col("_vb"))
    if round_to is not None:
        cosine = F.round(cosine, round_to)
    cond = F.col("id_a") < F.col("id_b")
    if n_clusters > 1:
        cond = (F.col("_la") == F.col("_lb")) & cond
        joined = l.join(r, cond)
    else:
        # single block: broadcast nested-loop on the id inequality,
        # the small-table exact baseline (cosine_similar_pairs shape)
        joined = l.join(F.broadcast(r), cond)
    return joined.select(
        "id_a", "id_b", cosine.alias("cosine")
    ).where(F.col("cosine") >= threshold)


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 256,
    threshold: float = 0.95,
    round_to: int | None = None,
    keep: str = "min_id",
    sample_size: int = 4096,
    n_iters: int = 8,
    seed: int = 29,
    distributed_training: bool = False,
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al., arXiv:2303.09540):
    cluster embeddings, prune near-duplicates (cosine >= threshold)
    within each cluster, keep one survivor per transitive duplicate
    group.  The standard semantic-dedup shape for a web-scale corpus —
    cluster id as the blocking key bounds the pair join; components
    close via the O(log n) large-star/small-star scheme shared with
    :func:`hooqu_spark.ops.dedup.dedup_by_clusters`.

    Survivor policies:

    * ``keep="min_id"`` (default): smallest id per duplicate group —
      deterministic and engine-replayable (the contract oracle replays
      it with a recursive closure).
    * ``keep="centroid_far"``: the paper's policy — keep the group
      member with the LOWEST cosine to its cluster centroid
      (preserves the cluster's outer shell, pruning redundant
      near-centroid mass); ties break to the smaller id.  Requires
      ``n_clusters > 1`` (with a single block there is no centroid).

    Returns the surviving rows of ``df`` (all original columns)."""
    if keep not in ("min_id", "centroid_far"):
        raise ValueError(f"unknown survivor policy: {keep!r}")
    if keep == "centroid_far" and n_clusters <= 1:
        raise ValueError(
            "keep='centroid_far' needs n_clusters > 1 (a single block"
            " has no centroid to measure against)"
        )
    # centroid_far needs the trained model twice (blocking + survivor
    # scoring) — train ONCE here and thread it through
    if keep == "centroid_far":
        non_null = df.where(F.col(vec_col).isNotNull())
        if non_null.select(vec_col).first() is None:
            # no non-NULL embeddings -> no pairs -> every row survives
            return df
        centroids = _train_sem_centroids(
            non_null, vec_col, id_col,
            n_clusters, sample_size, n_iters, seed, distributed_training,
        )
    else:
        centroids = None
    pairs = semantic_duplicate_pairs(
        df, id_col, vec_col, n_clusters, threshold, round_to,
        sample_size, n_iters, seed, distributed_training, centroids,
    )
    if keep == "min_id":
        from .dedup import dedup_by_clusters

        return dedup_by_clusters(df, pairs, id_col)
    from .dedup import duplicate_clusters_star
    comps = duplicate_clusters_star(pairs)  # (id, cluster-min id)
    sims = df.select(
        F.col(id_col).alias("id"),
        ivf_assign_sim_udf(centroids)(F.col(vec_col))["sim"].alias("_sim"),
    )
    # survivor per duplicate group: argmin centroid-cosine, tie -> min
    # id; one tiny groupBy over (component, member) rows
    winners = (
        comps.join(sims, "id")
        .groupBy("cluster")
        .agg(F.min(F.struct("_sim", "id")).alias("_w"))
        .select(F.col("_w.id").alias("id"))
    )
    losers = comps.join(winners, "id", "left_anti").select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
