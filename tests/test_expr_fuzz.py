"""Translator fuzz: random pandas-dialect predicates vs DuckDB.

SURVEY §7 step 3 called for property-testing the expression translator
against DuckDB oracles.  A seeded generator builds random predicate
ASTs over real lineitem columns and renders each AST twice — once in
the pandas-eval dialect (fed through ``translate`` into a Spark
filter), once as ANSI SQL for DuckDB — and asserts identical matching
row counts on the same parquet.
"""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from hooqu_spark.expr import translate

PARQUET = "/root/testdata/sf0.001/lineitem.parquet"
N_PREDICATES = 60

_NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_linenumber"]
_STR_COLS = {"l_returnflag": ["A", "N", "R"], "l_linestatus": ["O", "F"]}
_CMP = ["==", "!=", "<", "<=", ">", ">="]


def _atom(rng: random.Random):
    kind = rng.randrange(5)
    if kind == 0:
        c = rng.choice(_NUM_COLS)
        op = rng.choice(_CMP)
        v = round(rng.uniform(0, 30), 2)
        sql_op = "=" if op == "==" else ("<>" if op == "!=" else op)
        recv = f"`{c}`" if rng.random() < 0.3 else c  # backtick idents
        return f"{recv} {op} {v}", f"{c} {sql_op} {v}"
    if kind == 1:
        c = rng.choice(list(_STR_COLS))
        v = rng.choice(_STR_COLS[c])
        op = rng.choice(["==", "!="])
        sql_op = "=" if op == "==" else "<>"
        return f"{c} {op} '{v}'", f"{c} {sql_op} '{v}'"
    if kind == 2:
        c = rng.choice(list(_STR_COLS))
        vals = rng.sample(_STR_COLS[c], rng.randint(1, 2))
        lit = ", ".join(f"'{v}'" for v in vals)
        return f"{c}.isin([{lit}])", f"{c} IN ({lit})"
    if kind == 3:
        c = rng.choice(_NUM_COLS)
        fn = rng.choice(["isna", "notna"])
        sql = f"{c} IS NULL" if fn == "isna" else f"{c} IS NOT NULL"
        return f"{c}.{fn}()", sql
    c = rng.choice(_NUM_COLS)
    v = round(rng.uniform(0, 20), 2)
    return (
        f"{c}.fillna(0) >= {v}",
        f"coalesce({c}, 0) >= {v}",
    )


def _expr(rng: random.Random, depth: int):
    if depth <= 0 or rng.random() < 0.4:
        return _atom(rng)
    a_p, a_s = _expr(rng, depth - 1)
    if rng.random() < 0.25:
        return f"not ({a_p})", f"NOT ({a_s})"
    b_p, b_s = _expr(rng, depth - 1)
    if rng.random() < 0.3:  # bitwise spellings translate to AND/OR
        op_p, op_s = rng.choice([("&", "AND"), ("|", "OR")])
    else:
        op_p, op_s = rng.choice([("and", "AND"), ("or", "OR")])
    return f"({a_p}) {op_p} ({b_p})", f"({a_s}) {op_s} ({b_s})"


@pytest.fixture(scope="module")
def lineitem(spark):
    df = spark.read.parquet(PARQUET).cache()
    yield df
    # unpersist at module teardown: a lingering cached relation would
    # replace the parquet scan in OTHER modules' plan assertions
    df.unpersist()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{PARQUET}'")
    return con


def test_random_predicates_match_duckdb(lineitem, duck):
    rng = random.Random(20260817)
    checked = 0
    for _ in range(N_PREDICATES):
        pandas_expr, sql_expr = _expr(rng, depth=3)
        spark_n = lineitem.where(F.expr(translate(pandas_expr))).count()
        duck_n = duck.execute(
            f"SELECT count(*) FROM lineitem WHERE {sql_expr}"
        ).fetchone()[0]
        assert spark_n == duck_n, (pandas_expr, sql_expr, spark_n, duck_n)
        checked += 1
    assert checked == N_PREDICATES
