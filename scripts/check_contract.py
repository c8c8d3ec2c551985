"""Driver-style contract checker: runs selected `queries()` entries on
Spark and their `oracle_sql()` in DuckDB at sf0.01, then compares row
count, schema (columns sorted by name) and values (rows sorted, EXACT
equality — matching the driver's value hash) — a local stand-in for
CORRECTNESS_r{N}.json.

NOTE on floats: this comparison (like the driver's) is exact, NOT
rounded.  Cross-engine float reproducibility is the QUERIES'
responsibility: every float-producing query pre-rounds to 6 decimals on
BOTH the Spark and the oracle side (repo invariant, CLAUDE.md).  An
unrounded float query would flake here on last-ulp engine differences —
that's a contract bug in the query, not in this checker.

Usage: python scripts/check_contract.py [query ...]   (default: all)
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns), ignore_index=True)


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # timestamp-exporting queries render via date_format, which
        # reads the session timezone; the oracle prints parquet UTC
        # wall time — pin UTC so local verification matches the driver
        # on any host timezone
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    qs, oracles = e.queries(), e.oracle_sql()
    wanted = sys.argv[1:] or list(qs)
    failures = 0
    for name in wanted:
        sdf = qs[name](spark, SF_DIR).toPandas()
        if name not in oracles:
            print(f"{name}: no_oracle spark_rows={len(sdf)}")
            continue
        ddf = con.execute(oracles[name]).df()
        status = []
        if len(sdf) != len(ddf):
            status.append(f"ROWS {len(sdf)} vs {len(ddf)}")
        if sorted(sdf.columns) != sorted(ddf.columns):
            status.append(f"COLS {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
        else:
            a, b = norm(sdf), norm(ddf)
            da = {c: str(a[c].dtype) for c in a.columns}
            db = {c: str(b[c].dtype) for c in b.columns}
            if da != db:
                status.append(f"DTYPES {da} vs {db}")
            elif len(a) == len(b) and not a.equals(b):
                diff = (a != b) & ~(a.isna() & b.isna())
                status.append(f"VALUES ({int(diff.any(axis=1).sum())} rows differ)")
        if status:
            failures += 1
            print(f"{name}: FAIL {'; '.join(status)}")
        else:
            print(f"{name}: ok rows={len(sdf)}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
