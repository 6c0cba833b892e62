"""Local mirror of the driver's DuckDB differential gate.

Runs a Spark plan and its oracle SQL side-by-side and compares
row count, column names, and an order-insensitive canonicalized value
multiset (floats rounded to 9 significant digits to absorb engine ULP
differences — the queries themselves pre-round anything user-visible).
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

from mcas_question2_etl_spark.catalog import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0"
        return f"{v:.9g}"
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, (int, str)):
        return str(v)
    try:  # Decimal and friends
        f = float(v)
        return _canon(f)
    except (TypeError, ValueError):
        return repr(v)


def canonical_rows(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def compare(spark_df, con, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    spark_rows = spark_df.collect()
    spark_cols = spark_df.columns
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}")
    s = canonical_rows([tuple(r) for r in spark_rows], spark_cols)
    d = canonical_rows(duck_rows, duck_cols)
    if s != d:
        diff_s = [r for r in s if r not in set(map(tuple, d))][:3]
        diff_d = [r for r in d if r not in set(map(tuple, s))][:3]
        problems.append(f"values differ; spark-only={diff_s} duck-only={diff_d}")
    return problems
