"""Local mirror of the driver's DuckDB differential gate.

Runs a Spark plan and its oracle SQL side-by-side and compares
row count, column names, per-column TYPES (via Arrow, so e.g. a DuckDB
HUGEINT from an uncast integer SUM fails against Spark's BIGINT — the
exact artifact the driver's typed hash catches), and an
order-insensitive canonicalized value multiset (floats rounded to 9
significant digits to absorb engine ULP differences — the queries
themselves pre-round anything user-visible).
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
import pyarrow as pa

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


def _spark_type_name(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, T.LongType):
        return "int64"
    if isinstance(dt, T.IntegerType):
        return "int32"
    if isinstance(dt, T.ShortType):
        return "int16"
    if isinstance(dt, T.ByteType):
        return "int8"
    if isinstance(dt, T.DoubleType):
        return "float64"
    if isinstance(dt, T.FloatType):
        return "float32"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.ArrayType):
        return f"list<{_spark_type_name(dt.elementType)}>"
    return dt.simpleString()


def _arrow_type_name(t: pa.DataType) -> str:
    if pa.types.is_int64(t):
        return "int64"
    if pa.types.is_int32(t):
        return "int32"
    if pa.types.is_int16(t):
        return "int16"
    if pa.types.is_int8(t):
        return "int8"
    if pa.types.is_float64(t):
        return "float64"
    if pa.types.is_float32(t):
        return "float32"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_arrow_type_name(t.value_type)}>"
    return str(t)


def compare(spark_df, con, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    spark_rows = spark_df.collect()
    spark_cols = spark_df.columns
    duck_schema = con.execute(sql).fetch_arrow_table().schema
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    spark_types = {f.name: _spark_type_name(f.dataType) for f in spark_df.schema.fields}
    duck_types = {f.name: _arrow_type_name(f.type) for f in duck_schema}
    for c in spark_cols:
        if spark_types[c] != duck_types[c]:
            problems.append(
                f"type differs for {c!r}: spark={spark_types[c]} duck={duck_types[c]}"
            )
    if problems:
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
